"""Reference-artifact drop-in e2e: synthesize the reference's EXACT
on-disk formats and run tools/train.py train -> eval -> deploy on them
with zero conversion (the MIGRATION.md promise).

Formats reproduced (``/root/reference`` layouts):
* per-slide ``*_featvec.pt`` torch dicts with ``features``/``coords``
  tensors (``data_utils/datasets.py:218,234``);
* split JSONs as ``{"data": [rows]}`` with the full clinical field set
  (``dataset/json_splits/.../train_*_cls_feat.json``), including a
  multi-slide case (two rows sharing a case_id -> +1500 y-offset
  concat);
* text/clinical embedding dicts as torch ``.pt`` ``case_id -> tensor``
  (``datasets.py:180,203``);
* gene CSV with ``case_id`` (case_submitter_id) first column
  (``datasets.py:183-188``) and the pathway-membership CSV.
"""

import json
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(ROOT))

from tools.train import build_parser, run_one_seed  # noqa: E402

IN_CHANS = 64      # tiny_test_config().backbone.in_chans
CLIN_DIM = 5       # tiny_test_config(clinical=True).adapter.clinfeat_dim
GENES = [f"GENE{i}" for i in range(40)]


def _write_reference_artifacts(root: Path, rng):
    import torch
    feat_dir = root / "TCGA-extractedfeatures"
    feat_dir.mkdir(parents=True)

    def make_slide(slide_id, length):
        f = feat_dir / f"{slide_id}_featvec.pt"
        torch.save({"features": torch.tensor(
            rng.randn(length, IN_CHANS), dtype=torch.float32),
            "coords": torch.tensor(
                rng.randint(0, 50, (length, 2)) * 256,
                dtype=torch.float32)}, f)
        return str(f)

    text, clinical, gene_rows = {}, {}, []
    splits = {}
    counter = [0]

    def make_split(name, n_cases, multi_slide_first=False):
        rows = []
        for i in range(n_cases):
            counter[0] += 1
            cid = f"{counter[0]:08d}-aaaa-bbbb-cccc-ddddeeeeffff"
            sub = f"TCGA-ZZ-{counter[0]:04d}"
            n_slides = 2 if (multi_slide_first and i == 0) else 1
            y = int(rng.rand() < 0.5)
            for s in range(n_slides):
                slide = f"{sub}-01Z-00-DX{s + 1}"
                rows.append({
                    "case_id": cid,
                    "age_at_index": str(rng.randint(40, 85)),
                    "project_id": "TCGA-BRCA",
                    "vital_status": int(rng.rand() < 0.7),
                    "ajcc_pathologic_m": "M0",
                    "ajcc_pathologic_n": "N1",
                    "ajcc_pathologic_stage": "Stage IIA",
                    "ajcc_pathologic_t": "T2",
                    "primary_diagnosis": "infiltrating duct carcinoma",
                    "year_of_diagnosis": "2010",
                    "slide_submitter_id": slide,
                    "case_submitter_id": sub,
                    "durations": float(rng.randint(2, 100)),
                    "primary_class": y,
                    "gene_availability": 1,
                    "features_path": make_slide(
                        slide, int(rng.randint(30, 45))),
                })
            text[cid] = torch.tensor(rng.randn(4, 512),
                                     dtype=torch.float32)
            clinical[cid] = torch.tensor(rng.randn(CLIN_DIM),
                                         dtype=torch.float32)
            gene_rows.append((sub, rng.randn(len(GENES))))
        path = root / f"{name}_brca_cls_feat.json"
        with open(path, "w") as f:
            json.dump({"data": rows}, f)
        splits[name] = str(path)

    make_split("train", 8, multi_slide_first=True)
    make_split("val", 6)
    make_split("test", 6)
    torch.save(text, root / "BRCA_textembeddings_conch.pt")
    torch.save(clinical, root / "simple_clinical_dict_brca.pt")

    with open(root / "tcga_brca_xena_clean_pathway.csv", "w") as f:
        f.write("case_id," + ",".join(GENES) + "\n")
        for sub, vec in gene_rows:
            f.write(sub + "," + ",".join(f"{v:.5f}" for v in vec) + "\n")
    # pathway membership: gene column + 0/1 pathway columns
    pw = rng.rand(len(GENES), 6) < 0.3
    pw[:, 0] |= ~pw.any(axis=1)  # every gene in >=1 pathway
    with open(root / "gene_pathway_processed.csv", "w") as f:
        f.write("gene," + ",".join(f"P{j}" for j in range(6)) + "\n")
        for g, row in zip(GENES, pw):
            f.write(g + "," + ",".join(str(int(v)) for v in row) + "\n")
    return splits


@pytest.mark.slow
def test_reference_artifacts_drop_in_train_eval_deploy(tmp_path):
    rng = np.random.RandomState(0)
    splits = _write_reference_artifacts(tmp_path / "db", rng)
    out = tmp_path / "results"
    args = build_parser().parse_args([
        "--tiny", "1", "--bf16", "0", "--dp", "0",
        "--num_epochs", "1",
        "--mil_name", "longnetvit_gene_clinical_adapter",
        "--train_json", splits["train"],
        "--val_json", splits["val"],
        "--test_json", splits["test"],
        "--genomics_csv_path",
        str(tmp_path / "db" / "tcga_brca_xena_clean_pathway.csv"),
        "--pathway_csv",
        str(tmp_path / "db" / "gene_pathway_processed.csv"),
        "--text_location",
        str(tmp_path / "db" / "BRCA_textembeddings_conch.pt"),
        "--clinical_location",
        str(tmp_path / "db" / "simple_clinical_dict_brca.pt"),
        "--output_path", str(out),
        "--save_embeddings",
    ])
    run_one_seed(args)

    run_dir = out / "seed_0"
    rows = [json.loads(l) for l in open(run_dir / "run_metrics.jsonl")]
    assert any(np.isfinite(r.get("train_loss", np.nan)) for r in rows)
    assert any("val_cls_bal_acc" in r for r in rows)

    # deploy artifacts: embeddings per split + per-task readout results
    deploy = json.load(open(run_dir / "deploy_results.json"))
    assert deploy, "empty deploy results"
    x_test = np.load(run_dir / "data" / "x_feats_test.npy")
    assert x_test.shape[0] == 6 and np.isfinite(x_test).all()
    meta_test = json.load(open(run_dir / "data" / "meta_test.json"))
    assert len(meta_test) == 6
    # the multi-slide case must appear exactly once (case-wise concat)
    meta_train = json.load(open(run_dir / "data" / "meta_train.json"))
    assert len(meta_train) == 8
