"""Pan-cancer trainer: joint multi-task training over 4 cancer sites.

Rebuild of ``train_modaltune_pancancer.py`` (``..._multitask_PC``): same
KD objective over the merged PANCANCER split, but evaluation fits
**per-site** LogReg + CoxPH heads indexed by ``SITE_LABEL[project_id]``
plus a 4-way cancer-site classifier (``train_one_epoch`` :50-134,
``LogisticRegression_train`` :136-232, ``evaluate`` :234-365). Unlike
the single-site trainer, the reference PC epoch has **no** 6-iteration
cap — full epochs always.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np

from ..eval.pancancer import perform_testing_pancancer
from ..eval.readout import (CoxPH, classification_metrics, filter_labelset,
                            fit_logreg)
from ..utils.constants import NUM_SITES, SITE_LABEL
from .trainer import ModalTuneTrainer


def site_of(meta: dict) -> int:
    return SITE_LABEL.get(str(meta.get("project_id", "")), -1)


class PanCancerTrainer(ModalTuneTrainer):
    """Per-site readout heads + site classifier on top of the shared
    multi-task KD training loop."""

    def __init__(self, *args, num_sites: int = NUM_SITES, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_sites = num_sites
        self._site_lr: List = [None] * num_sites
        self._site_cph: List = [None] * num_sites
        self._site_classifier = None

    def _epoch_cap(self) -> float:
        # pan-cancer has no iteration cap (train_modaltune_pancancer.py:50)
        return self.cfg.steps_per_epoch_cap or np.inf

    def fit_readout_heads(self):
        """Per-site LogReg/CoxPH on train task-0 embeddings + 4-way site
        classifier (``LogisticRegression_train``,
        train_modaltune_pancancer.py:136-232)."""
        x, meta = self.extract_embeddings(self.eval_loaders["train"])
        x0 = x[:, 0]
        sites = np.array([site_of(m) for m in meta])
        y = np.array([m.get("primary_class", -1) for m in meta], int)
        t = np.array([m.get("durations", np.nan) for m in meta], float)
        e = np.array([m.get("vital_status", 0) for m in meta], int)
        for s in range(self.num_sites):
            sel = sites == s
            if sel.sum() == 0:
                continue
            if len(np.unique(y[sel][y[sel] >= 0])) > 1:
                self._site_lr[s] = fit_logreg(x0[sel], y[sel])
            if np.isfinite(t[sel]).sum() > 5 and e[sel].sum() > 1:
                self._site_cph[s] = CoxPH(penalizer=0.1).fit(
                    x0[sel], t[sel], e[sel])
        valid = sites >= 0
        if len(np.unique(sites[valid])) > 1:
            self._site_classifier = fit_logreg(x0[valid], sites[valid])

    def evaluate(self, stage: str) -> Dict[str, float]:
        loader = self.eval_loaders[stage]
        by_case = {m["case_id"]: m for m in loader.dataset.metadata()}
        loss_num, loss_den, x0, meta = 0.0, 0, [], []
        from .trainer import _device_batch, _row_valid
        # same mesh/multi-host contract as the base trainer: local state
        # view for per-process jits, padded wrap rows excluded from both
        # the loss and the per-site metric pools
        state = self._local_state()
        for batch in loader:
            logits, loss = self._eval_step(state,
                                           _device_batch(batch),
                                           self._text_targets(batch),
                                           _row_valid(batch))
            real = len(batch.case_ids) - batch.pad_rows
            loss_num += float(loss) * real
            loss_den += real
            x0.append(np.asarray(logits[:real, 0], np.float32))
            meta.extend(by_case[c] for c in batch.case_ids[:real])
        x0 = np.concatenate(x0)
        sites = np.array([site_of(m) for m in meta])
        y = np.array([m.get("primary_class", -1) for m in meta], int)
        t = np.array([m.get("durations", np.nan) for m in meta], float)
        e = np.array([m.get("vital_status", 0) for m in meta], int)

        out = {f"{stage}_cls_loss": loss_num / max(loss_den, 1)}
        bal_accs, cidx = [], []
        for s in range(self.num_sites):
            sel = sites == s
            if sel.sum() == 0:
                continue
            if self._site_lr[s] is not None:
                xf, yf = filter_labelset(x0[sel], y[sel])
                if len(yf):
                    m = classification_metrics(yf,
                                               self._site_lr[s].predict(xf))
                    out[f"{stage}_site{s}_bal_acc"] = m["bal_acc"]
                    bal_accs.append(m["bal_acc"])
            if self._site_cph[s] is not None:
                c = self._site_cph[s].score(x0[sel], t[sel], e[sel])
                out[f"{stage}_site{s}_c_index"] = c
                cidx.append(c)
        if bal_accs:
            # site-averaged key metric (compute_metrics averages over
            # sites, train_modaltune_pancancer.py:428-445)
            out[f"{stage}_cls_bal_acc"] = float(np.mean(bal_accs))
        if cidx:
            out[f"{stage}_c_index"] = float(np.mean(cidx))
        if self._site_classifier is not None:
            valid = sites >= 0
            m = classification_metrics(
                sites[valid], self._site_classifier.predict(x0[valid]))
            out[f"{stage}_cancer_site_acc"] = m["acc"]
        return out

    def deploy(self, weights_path: Optional[str] = None,
               penalizer: float = 0.1) -> Dict:
        """Pan-cancer deployment readout
        (``deploy_mil`` -> ``perform_testing_pancancer``)."""
        if weights_path:
            self.load_weights(weights_path)
        splits = {}
        for name in ("train", "test"):
            x, meta = self.extract_embeddings(self.eval_loaders[name])
            splits[name] = (x, meta)
        results = perform_testing_pancancer(
            splits["train"][0], splits["train"][1],
            splits["test"][0], splits["test"][1], penalizer=penalizer)
        with open(self.out_dir / "deploy_results_pancancer.json", "w") as f:
            json.dump(results, f, indent=2)
        return results
