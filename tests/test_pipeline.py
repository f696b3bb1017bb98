"""Offline-pipeline tests: subtype class maps, durations/censoring,
splits with gene gating, clinical feature encoding, prompt generation."""

import json

import numpy as np
import pandas as pd
import pytest

from modaltune_tpu.data.pipeline import (apply_subtype_classes,
                                         generate_prompts, make_splits,
                                         prepare_clinical_features,
                                         process_gene_matrix,
                                         survival_bins,
                                         survival_sentences)


def test_subtype_classes_brca_and_nsclc():
    df = pd.DataFrame({
        "primary_diagnosis": ["Infiltrating duct carcinoma, NOS",
                              "Lobular carcinoma", "Medullary carcinoma"],
        "project_id": ["TCGA-BRCA"] * 3})
    out = apply_subtype_classes(df, "brca")
    assert out["primary_class"].tolist() == [0, 1, -1]
    assert out["primary_diagnosis"].iloc[0] == "infiltrating duct carcinoma"

    df = pd.DataFrame({
        "primary_diagnosis": ["Adenocarcinoma with mixed subtypes",
                              "Squamous cell carcinoma, keratinizing"],
        "project_id": ["TCGA-LUAD", "TCGA-LUSC"]})
    out = apply_subtype_classes(df, "nsclc")
    assert out["primary_class"].tolist() == [0, 1]
    assert out["primary_diagnosis"].iloc[0] == "lung adenocarcinoma"


def test_make_splits_gene_gating(tmp_path):
    rng = np.random.RandomState(0)
    n = 60
    df = pd.DataFrame({
        "case_id": [f"case{i}" for i in range(n)],
        "case_submitter_id": [f"TCGA-{i:04d}" for i in range(n)],
        "slide_submitter_id": [f"S{i}" for i in range(n)],
        "primary_class": rng.randint(0, 2, n),
        "durations": rng.rand(n) * 100,
        "vital_status": rng.randint(0, 2, n),
        "project_id": "TCGA-BRCA",
    })
    # half the cases have genomic data
    gene_ids = df["case_submitter_id"].tolist()[: n // 2]
    splits = make_splits(df, str(tmp_path), gene_ids, str(tmp_path),
                         "brca")
    val_test = {r["case_id"] for r in splits["val"] + splits["test"]}
    with_gene = set(df["case_id"][: n // 2])
    # val/test only contain gene-available cases
    assert val_test <= with_gene
    # all cases land somewhere
    all_ids = {r["case_id"] for rows in splits.values() for r in rows}
    assert all_ids == set(df["case_id"])
    assert (tmp_path / "train_brca_cls_feat.json").exists()
    row = splits["train"][0]
    assert row["features_path"].endswith("_featvec.npz")


def test_clinical_features_shape():
    df = pd.DataFrame({
        "case_id": ["a", "b", "c"],
        "ajcc_pathologic_stage": ["Stage IA", "Stage III", np.nan],
        "ajcc_pathologic_t": ["T1a", "T3", "TX"],
        "ajcc_pathologic_n": ["N0", "N1", np.nan],
        "ajcc_pathologic_m": ["M0", "M1", "MX"],
        "age_at_index": [40.0, 70.0, 55.0],
    })
    feats = prepare_clinical_features(df)
    assert set(feats) == {"a", "b", "c"}
    assert feats["a"].shape == (5,)
    # age normalized to [0, 1]
    assert feats["a"][4] == 0.0 and feats["b"][4] == 1.0
    # stage scrub merges IA into I -> a and b differ
    assert feats["a"][0] != feats["b"][0]


def test_prompts_structure():
    rows = [dict(case_id="x", primary_diagnosis="lobular carcinoma",
                 ajcc_pathologic_stage="Stage IIB",
                 ajcc_pathologic_t="T2", ajcc_pathologic_n="N1",
                 ajcc_pathologic_m="M0", durations=24.0, vital_status=1),
            dict(case_id="y", primary_diagnosis=None,
                 durations=80.0, vital_status=0)]
    edges = np.array([0.0, 20.0, 50.0, 70.0, 100.0])
    p = generate_prompts(rows, "brca", edges=edges)
    assert set(p) == {"general", "diagnosis", "stage", "survival"}
    g0 = p["general"][0]
    assert "Cancer location: breast;" in g0
    assert "stage two" in g0
    assert "tumor stage two" in g0
    assert "node stage one" in g0
    assert "no metastasis detected" in g0
    assert "The patient died between 20 and 50 months" in g0
    # censored case in the last bin (the reference's "after" sentence key
    # is one past the reachable qcut labels, so the last reachable bin
    # reads "between ...")
    assert "was censored between 70 and 100 months" in p["survival"][1]
    # diagnosis prompt has no survival info
    assert "Survival" not in p["diagnosis"][0]


def test_survival_bins_cover_range():
    d = np.array([1.0, 5.0, 10.0, 20.0, 40.0, 80.0])
    edges = survival_bins(d, n_bins=4)
    assert len(edges) == 5
    assert edges[0] < d.min() and edges[-1] > d.max()
    s = survival_sentences(edges)
    assert 0 in s and 4 in s


def test_process_gene_matrix():
    expr = pd.DataFrame({
        "gene": ["A", "B", "C", "D"],
        "TCGA-AA-0001-01": [1.0, 2.0, 5.0, 3.0],
        "TCGA-AA-0002-01": [1.0, 4.0, 5.0, 1.0],
    })
    out = process_gene_matrix(expr, pathway_genes=["B", "D", "Z"])
    # constant genes (A, C) dropped; Z missing; B, D kept
    assert list(out.columns) == ["case_id", "B", "D"]
    assert out["case_id"].tolist() == ["TCGA-AA-0001", "TCGA-AA-0002"]
