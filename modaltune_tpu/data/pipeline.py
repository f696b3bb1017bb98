"""Offline data pipeline: TCGA splits, clinical features, text prompts.

Torch-free port of the reference's one-time preprocessing scripts
(SURVEY.md §2.4 / §3.4):

* :func:`make_splits` — ``data_utils/make_dataset.py``: clinical.tsv +
  slide.tsv -> per-site subtype class maps, durations in months with
  censoring fixes, patient-level stratified 80/20 then 85/15 splits,
  gene-availability gating of val/test, JSON split files.
* :func:`prepare_clinical_features` — ``data_utils/make_clinical.py``:
  AJCC stage/T/N/M string scrub -> label-encoded ints + normalized age,
  saved as ``{case_id: [5 floats]}`` (npz).
* :func:`generate_prompts` / :func:`make_text_embeddings` —
  ``data_utils/make_textemb_conch.py``: 4 prompt strings per case
  (general / diagnosis / stage / survival) with human-readable stage
  phrases and quantile-binned survival sentences; the text encoder is
  pluggable (a callable ``texts -> (N, 512)``) since CONCH weights are
  external.
* The Xena RNA-seq -> pathway CSV step
  (``data_utils/make_gene_dataset.py``) is :func:`process_gene_matrix`;
  symbol translation hooks are pluggable for the same reason.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

# ---------------------------------------------------------------------------
# subtype class maps (make_dataset.py:15-178)
# ---------------------------------------------------------------------------

# per-site: (diagnosis renames, diagnosis -> class id)
SUBTYPE_MAPS = {
    "brca": ({}, {"Infiltrating duct carcinoma": 0, "Lobular carcinoma": 1}),
    "gbmlgg": ({}, {
        "Glioblastoma": 0, "Mixed glioma": 1, "Oligodendroglioma": 1,
        "Astrocytoma": 1, "Oligodendroglioma, anaplastic": 1,
        "Astrocytoma, anaplastic": 1}),
    "nsclc": ({
        "Adenocarcinoma with mixed subtypes": "Adenocarcinoma",
        "Squamous cell carcinoma, keratinizing": "Squamous cell carcinoma",
        "Squamous cell carcinoma, large cell, nonkeratinizing":
            "Squamous cell carcinoma",
        "Bronchiolo-alveolar carcinoma, non-mucinous":
            "Bronchiolo-alveolar carcinoma",
        "Bronchio-alveolar carcinoma, mucinous":
            "Bronchiolo-alveolar carcinoma",
        "Bronchio-alveolar carcinoma": "Bronchiolo-alveolar carcinoma"},
        {"Adenocarcinoma": 0, "Squamous cell carcinoma": 1}),
    "coadread": ({
        "Colon Adenocarcinoma with mixed subtypes": "Colon Adenocarcinoma",
        "Rectal Adenocarcinoma with mixed subtypes":
            "Rectal Adenocarcinoma"},
        {"Colon Adenocarcinoma": 0, "Rectal Adenocarcinoma": 1}),
    "rcc": ({
        "Papillary adenocarcinoma": "Papillary renal cell carcinoma",
        "Clear cell adenocarcinoma": "Renal clear cell carcinoma",
        "Renal cell carcinoma": "Renal clear cell carcinoma",
        "Renal cell carcinoma, chromophobe type":
            "Chromophobe renal cell carcinoma"},
        {"Papillary renal cell carcinoma": 0,
         "Renal clear cell carcinoma": 1,
         "Chromophobe renal cell carcinoma": 2}),
    "ucec": ({
        "Endometrioid adenocarcinoma, secretory variant":
            "Endometrioid adenocarcinoma",
        "Papillary serous cystadenocarcinoma": "Serous cystadenocarcinoma",
        "Adenocarcinoma": "Endometrioid adenocarcinoma",
        "Serous surface papillary carcinoma": "Serous cystadenocarcinoma"},
        {"Endometrioid adenocarcinoma": 0, "Serous cystadenocarcinoma": 1}),
    "blca": ({
        "Papillary adenocarcinoma": "Papillary transitional cell carcinoma"},
        {"Transitional cell carcinoma": 0,
         "Papillary transitional cell carcinoma": 1}),
}


def apply_subtype_classes(df, onco_code: str):
    """Strip ', NOS', apply per-site diagnosis renames and class ids;
    unmapped diagnoses keep class -1. For nsclc/coadread the diagnosis
    text gets the organ prefix like the reference."""
    df = df.copy()
    df["primary_diagnosis"] = df["primary_diagnosis"].astype(str).apply(
        lambda x: x.replace(", NOS", ""))
    if onco_code == "coadread":
        for proj, prefix in (("TCGA-COAD", "Colon "),
                             ("TCGA-READ", "Rectal ")):
            sel = df["project_id"] == proj
            df.loc[sel, "primary_diagnosis"] = \
                prefix + df.loc[sel, "primary_diagnosis"]
    renames, classes = SUBTYPE_MAPS.get(onco_code, ({}, {}))
    df["primary_diagnosis"] = df["primary_diagnosis"].replace(renames)
    df["primary_class"] = df["primary_diagnosis"].map(classes).fillna(-1) \
        .astype(int)
    if onco_code == "nsclc":
        df["primary_diagnosis"] = "Lung " + df["primary_diagnosis"]
    df["primary_diagnosis"] = df["primary_diagnosis"].str.lower()
    return df


# ---------------------------------------------------------------------------
# clinical table -> case table with durations (make_dataset.py:180-278)
# ---------------------------------------------------------------------------

CLINICAL_COLUMNS = [
    "case_id", "age_at_index", "project_id", "days_to_death",
    "vital_status", "days_to_last_follow_up", "ajcc_pathologic_m",
    "ajcc_pathologic_n", "ajcc_pathologic_stage", "ajcc_pathologic_t",
    "primary_diagnosis", "year_of_diagnosis", "slide_submitter_id",
    "case_submitter_id",
]


def load_labelset(onco_code: str, clinical_tsv: str, slide_tsv: str,
                  available_slide_ids: Optional[Sequence[str]] = None,
                  labelset: Sequence[str] = ("primary_diagnosis",)):
    """clinical.tsv + slide.tsv -> slide-level dataframe with durations
    in months (days/30.44), death-date censoring fixes, event flag, and
    subtype classes."""
    import pandas as pd
    df = pd.read_csv(clinical_tsv, sep="\t", low_memory=False)
    slides = pd.read_csv(slide_tsv, sep="\t", low_memory=False)
    df = df.merge(slides[["case_id", "slide_submitter_id"]], on="case_id",
                  how="left")
    df = df.replace("'--", np.nan)
    if available_slide_ids is not None:
        df = df[df["slide_submitter_id"].isin(set(available_slide_ids))]
    cols = [c for c in CLINICAL_COLUMNS if c in df.columns]
    df = df[cols].drop_duplicates().reset_index(drop=True)

    # durations: follow-up for alive, death date for dead; fall back to
    # follow-up when the death date is missing; negative -> abs; months
    dur = df["days_to_last_follow_up"].copy()
    dead = df["vital_status"] == "Dead"
    dur[dead] = df.loc[dead, "days_to_death"]
    dur[dur.isna()] = df.loc[dur.isna(), "days_to_last_follow_up"]
    dur = pd.to_numeric(dur, errors="coerce").abs() / 30.44
    df["durations"] = dur
    df["vital_status"] = (df["vital_status"] == "Dead").astype(int)
    df = df.drop(columns=["days_to_death", "days_to_last_follow_up"])
    df = df.dropna(subset=[c for c in labelset if c in df.columns])
    df = apply_subtype_classes(df, onco_code)
    return df.reset_index(drop=True)


def make_splits(df, features_dir: str, gene_case_ids: Sequence[str],
                output_dir: str, onco_code: str, seed: int = 0,
                features_suffix: str = "_featvec.npz") -> Dict[str, list]:
    """Patient-level stratified split (80/20 then 85/15); cases without
    genomic data or with class -1 go to train only
    (make_dataset.py:313-351). Writes the three split JSONs."""
    from sklearn.model_selection import train_test_split
    df = df.copy()
    df["gene_availability"] = df["case_submitter_id"].isin(
        set(gene_case_ids)).astype(int)
    df["features_path"] = [
        str(Path(features_dir) / f"{sid}{features_suffix}")
        for sid in df["slide_submitter_id"]]

    cases = df[["case_id", "primary_class", "gene_availability"]] \
        .drop_duplicates()
    relevant = cases[(cases.gene_availability == 1) &
                     (cases.primary_class >= 0)]
    irrelevant = cases[(cases.gene_availability == 0) |
                       (cases.primary_class < 0)]
    train_ids, test_ids = train_test_split(
        relevant["case_id"].tolist(), test_size=0.2, random_state=seed,
        stratify=relevant["primary_class"].values)
    tr = relevant[relevant.case_id.isin(train_ids)]
    train_ids, val_ids = train_test_split(
        tr["case_id"].tolist(), test_size=0.15, random_state=seed,
        stratify=tr["primary_class"].values)
    train_ids = train_ids + irrelevant["case_id"].tolist()

    out = {}
    outdir = Path(output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    for name, ids in (("train", train_ids), ("val", val_ids),
                      ("test", test_ids)):
        rows = df[df.case_id.isin(ids)].to_dict("records")
        out[name] = rows
        with open(outdir / f"{name}_{onco_code}_cls_feat.json", "w") as f:
            json.dump({"data": rows}, f, default=str)
    return out


# ---------------------------------------------------------------------------
# clinical feature vectors (make_clinical.py:14-116)
# ---------------------------------------------------------------------------

_STAGE_SCRUB = re.compile(r"A|B|b|C|c|D|d|m|i|\s\(i\+\)|\s\(i-\)")


def _scrub(value: str, is_t: bool = False) -> str:
    v = str(value).replace(" (i+)", "").replace(" (i-)", "")
    if is_t:
        v = v.replace("is", "0")
    for ch in ("A", "a", "B", "b", "C", "c", "D", "d", "m", "i"):
        if ch == "a" and not is_t:
            continue
        v = v.replace(ch, "")
    return v


def prepare_clinical_features(df, output_npz: Optional[str] = None
                              ) -> Dict[str, np.ndarray]:
    """AJCC stage/T/N/M scrubbed to coarse grades then label-encoded,
    plus min-max-normalized age -> {case_id: float32[5]}. NaNs encode as
    their own category, like sklearn LabelEncoder on stringified NaN."""
    from sklearn.preprocessing import LabelEncoder
    df = df.drop_duplicates("case_id").reset_index(drop=True)
    feats = []
    for col, is_t in (("ajcc_pathologic_stage", False),
                      ("ajcc_pathologic_t", True),
                      ("ajcc_pathologic_n", False),
                      ("ajcc_pathologic_m", False)):
        vals = df[col].apply(lambda x: _scrub(x, is_t)
                             if x == x else "nan").astype(str)
        feats.append(LabelEncoder().fit_transform(vals).astype(np.float32))
    age = df["age_at_index"].astype(float)
    age = (age - age.min()) / max(age.max() - age.min(), 1e-9)
    feats.append(np.nan_to_num(age.to_numpy(np.float32), nan=0.5))
    mat = np.stack(feats, axis=1)
    out = {cid: mat[i] for i, cid in enumerate(df["case_id"])}
    if output_npz:
        np.savez(output_npz, **out)
    return out


# ---------------------------------------------------------------------------
# text prompts + embeddings (make_textemb_conch.py:25-303)
# ---------------------------------------------------------------------------

CANCER_CODE = {
    "BRCA": "breast", "BLCA": "bladder urothelial",
    "COADREAD": "colorectal", "GBMLGG": "brain", "NSCLC": "lung",
    "RCC": "kidney", "STAD": "stomach", "UCEC": "uterus",
}
STAGE_WORDS = {"Stage I": "stage one", "Stage II": "stage two",
               "Stage III": "stage three", "Stage IV": "stage four",
               "Stage X": "stage cannot be determined"}
T_WORDS = {"T0": "no tumor detected", "T1": "tumor stage one",
           "T2": "tumor stage two", "T3": "tumor stage three",
           "T4": "tumor stage four",
           "TX": "tumor stage cannot be assessed"}
N_WORDS = {"N0": "cancer has not spread to lymph nodes",
           "N1": "node stage one", "N2": "node stage two",
           "N3": "node stage three",
           "NX": "node spread cannot be assessed"}
M_WORDS = {"M0": "no metastasis detected",
           "M1": "cancer has spread to distant organs",
           "MX": "metastasis status cannot be assessed"}


def survival_bins(durations: np.ndarray, n_bins: int = 4) -> np.ndarray:
    """Quantile bin edges over case durations (get_intervals)."""
    d = np.asarray(durations, float)
    d = d[np.isfinite(d)]
    edges = np.quantile(d, np.linspace(0, 1, n_bins + 1))
    edges[0] = d.min() - 1e-6
    edges[-1] = d.max() + 1e-6
    return edges


def survival_sentences(edges: np.ndarray) -> Dict[int, str]:
    q = np.round(edges).astype(int)
    out = {0: f"before {q[1]} months",
           len(q) - 1: f"after {q[len(q) - 1]} months"}
    for i in range(1, len(q) - 1):
        out[i] = f"between {q[i]} and {q[i + 1]} months"
    return out


def generate_prompts(rows: Sequence[dict], onco_code: str,
                     edges: Optional[np.ndarray] = None
                     ) -> Dict[str, List[str]]:
    """Four prompt strings per case: general / diagnosis / stage /
    survival (generate_prompts, make_textemb_conch.py:191-244)."""
    onco = CANCER_CODE[onco_code.upper()]
    if edges is None:
        edges = survival_bins([r.get("durations", np.nan) for r in rows])
    sent_label = survival_sentences(edges)
    event_words = {0: "was censored", 1: "died"}

    def word(mapper, value, scrub_t=False):
        if value != value or value is None:
            return None
        v = _scrub(value, scrub_t)
        return mapper.get(v, str(v))

    general, diagnosis, stage, survival = [], [], [], []
    for r in rows:
        onco_s = f"Cancer location: {onco};"
        diag = r.get("primary_diagnosis")
        diag_s = f"Cancer diagnosis: {diag};" if diag == diag and diag \
            else ""
        st = word(STAGE_WORDS, r.get("ajcc_pathologic_stage"))
        st_s = f"Overall stage: {st};" if st else ""
        m = word(M_WORDS, r.get("ajcc_pathologic_m"))
        m_s = f"Distant metastasis status: {m};" if m else ""
        nn = word(N_WORDS, r.get("ajcc_pathologic_n"))
        n_s = f"Lymph node status: {nn};" if nn else ""
        tt = word(T_WORDS, r.get("ajcc_pathologic_t"), scrub_t=True)
        t_s = f"Tumor stage status: {tt};" if tt else ""
        dur = r.get("durations", np.nan)
        if dur == dur and dur is not None:
            b = int(np.clip(np.searchsorted(edges[1:-1], dur), 0,
                            len(sent_label) - 1))
            ev = event_words[int(r.get("vital_status", 0))]
            surv_s = (f"Survival status: The patient {ev} "
                      f"{sent_label[b]}")
        else:
            surv_s = ""
        general.append(f"{onco_s} {diag_s} {st_s} {t_s} {n_s} {m_s} "
                       f"{surv_s}")
        diagnosis.append(f"{onco_s} {diag_s}")
        stage.append(f"{onco_s} {st_s} {t_s} {n_s} {m_s}")
        survival.append(f"{onco_s} {st_s} {t_s} {n_s} {m_s} {surv_s}")
    return {"general": general, "diagnosis": diagnosis, "stage": stage,
            "survival": survival}


def make_text_embeddings(rows: Sequence[dict], onco_code: str,
                         encode_text: Callable[[List[str]], np.ndarray],
                         output_npz: Optional[str] = None
                         ) -> Dict[str, np.ndarray]:
    """-> {case_id: (4, text_dim)} using a pluggable text encoder (the
    reference uses CONCH ``encode_text``; any callable texts->array
    works — e.g. a transformers CLIP text tower)."""
    prompts = generate_prompts(rows, onco_code)
    embs = [np.asarray(encode_text(prompts[k]), np.float32)
            for k in ("general", "diagnosis", "stage", "survival")]
    stacked = np.stack(embs, axis=1)  # (N, 4, dim)
    out = {r["case_id"]: stacked[i] for i, r in enumerate(rows)}
    if output_npz:
        np.savez(output_npz, **out)
    return out


# ---------------------------------------------------------------------------
# gene matrix (make_gene_dataset.py)
# ---------------------------------------------------------------------------

def process_gene_matrix(expr_df, pathway_genes: Sequence[str],
                        translate: Optional[Callable[[Sequence[str]],
                                                     Dict[str, str]]] = None,
                        output_csv: Optional[str] = None):
    """Xena-style RNA-seq matrix (genes x samples, first col gene id) ->
    case x pathway-gene CSV: drop constant genes, optional symbol
    translation hook (the reference uses gene_thesaurus), transpose to
    cases, keep pathway genes, TCGA barcodes truncated to case level."""
    import pandas as pd
    df = expr_df.set_index(expr_df.columns[0])
    df = df.loc[df.std(axis=1) > 0]
    if translate is not None:
        mapping = translate(df.index.tolist())
        df.index = [mapping.get(g, g) for g in df.index]
    df = df[~df.index.duplicated(keep="first")]
    keep = [g for g in pathway_genes if g in df.index]
    out = df.loc[keep].T
    out.index = [i[:12] for i in out.index]  # TCGA-XX-XXXX case ids
    out = out[~out.index.duplicated(keep="first")]
    out.insert(0, "case_id", out.index)
    out = out.reset_index(drop=True)
    if output_csv:
        out.to_csv(output_csv, index=False)
    return out
