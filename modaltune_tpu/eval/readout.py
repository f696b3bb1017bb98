"""Host-side readout heads: logistic regression + Cox proportional
hazards over exported task-conditioned embeddings.

Port of ``utils/test_utils_modaltune.py:37-171``: per task embedding,
a liblinear LogisticRegression scores subtype accuracy / balanced
accuracy and a ridge-penalized CoxPH (penalizer 0.1) scores the survival
concordance index. lifelines is not available in this environment, so
CoxPH is implemented natively: Efron-tie partial likelihood with L2
penalty and Newton iterations with analytic gradient/Hessian in numpy
(the design matrix is only (N, 256), so the Hessian is tiny).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

TASK_NAMES = ("General", "Diagnosis", "Survival")  # utils/constants.py:45-49


def filter_labelset(x: np.ndarray, y: np.ndarray):
    """Keep rows with label >= 0 (rare labels are mapped to -1 by the
    split maker — ``test_utils_modaltune.py:37-45``)."""
    idx = np.where(y >= 0)[0]
    return x[idx], y[idx]


def concordance_index(durations: np.ndarray, risks: np.ndarray,
                      events: np.ndarray) -> float:
    """C-index with the convention higher risk => earlier event.

    Comparable pairs: (i, j) with T_i < T_j and E_i = 1, plus tied-time
    pairs with exactly one event. Ties in risk count 0.5.
    """
    t = np.asarray(durations, float)
    r = np.asarray(risks, float)
    e = np.asarray(events, bool)
    n = len(t)
    num = den = 0.0
    for i in range(n):
        if not e[i]:
            continue
        # j strictly later than i, or tied time with j censored
        later = (t > t[i]) | ((t == t[i]) & ~e)
        later[i] = False
        den += later.sum()
        num += (r[i] > r[later]).sum() + 0.5 * (r[i] == r[later]).sum()
    return float(num / den) if den > 0 else 0.5


@dataclasses.dataclass
class CoxPH:
    """Ridge-penalized Cox proportional hazards (Efron ties)."""

    penalizer: float = 0.1
    max_iter: int = 50
    tol: float = 1e-7
    beta: Optional[np.ndarray] = None
    _mean: Optional[np.ndarray] = None
    _std: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray, durations: np.ndarray,
            events: np.ndarray, strata=None) -> "CoxPH":
        """Newton with analytic Efron gradient/Hessian, pure numpy fp64
        (the design matrix is (N, 256); each Newton step is a handful of
        small matmuls — no accelerator needed).

        ``strata``: optional per-row labels; the partial likelihood is
        computed within each stratum and summed (lifelines'
        ``strata=`` used by the pan-cancer pooled survival model,
        ``utils/test_utils_pancancer.py:70-88``)."""
        x = np.asarray(x, np.float64)
        t = np.asarray(durations, np.float64)
        e = np.asarray(events, np.float64)
        keep = np.isfinite(t) & np.isfinite(x).all(axis=1)
        x, t, e = x[keep], t[keep], e[keep]
        strata_arr = None
        if strata is not None:
            strata_arr = np.asarray(strata)[keep]
        self._mean = x.mean(axis=0)
        self._std = x.std(axis=0)
        self._std[self._std == 0] = 1.0
        xs = (x - self._mean) / self._std

        # sort by (stratum, time); risk sets never cross strata
        if strata_arr is not None:
            s_codes = np.unique(strata_arr, return_inverse=True)[1]
        else:
            s_codes = np.zeros(len(t), np.int64)
        order = np.lexsort((t, s_codes))
        xs, t, e, s_codes = xs[order], t[order], e[order], s_codes[order]
        n, p = xs.shape
        # unique (stratum, time) pairs in sorted order
        keys = np.stack([s_codes, t], axis=1)
        _, inv = np.unique(keys, axis=0, return_inverse=True)
        nuniq = inv.max() + 1 if n else 0
        groups = [np.where(inv == k)[0] for k in range(nuniq)]
        ev_groups = [g[e[g] > 0] for g in groups]
        # stratum of each unique group (groups are time-sorted within
        # stratum; risk-set accumulator resets at stratum boundaries)
        group_strata = np.array([s_codes[g[0]] for g in groups]) \
            if nuniq else np.zeros(0, np.int64)

        def nll_grad_hess(beta):
            r = xs @ beta
            r = np.clip(r, -500, 500)
            w = np.exp(r)
            wx = w[:, None] * xs
            ll = 0.0
            grad = np.zeros(p)
            hess = np.zeros((p, p))
            # running risk-set sums, accumulated from latest time down,
            # reset at stratum boundaries
            s0 = 0.0
            s1 = np.zeros(p)
            s2 = np.zeros((p, p))
            prev_stratum = None
            for k in range(nuniq - 1, -1, -1):
                if prev_stratum is not None and \
                        group_strata[k] != prev_stratum:
                    s0 = 0.0
                    s1 = np.zeros(p)
                    s2 = np.zeros((p, p))
                prev_stratum = group_strata[k]
                g = groups[k]
                xg = xs[g]
                s0 += w[g].sum()
                s1 += wx[g].sum(axis=0)
                s2 += wx[g].T @ xg
                d = ev_groups[k]
                if len(d) == 0:
                    continue
                dn = len(d)
                xd = xs[d]
                wd0 = w[d].sum()
                wd1 = wx[d].sum(axis=0)
                wd2 = wx[d].T @ xd
                ll += r[d].sum()
                grad += xd.sum(axis=0)
                for l in range(dn):
                    f = l / dn
                    phi = s0 - f * wd0
                    a = s1 - f * wd1
                    b = s2 - f * wd2
                    ll -= np.log(max(phi, 1e-300))
                    grad -= a / phi
                    hess -= b / phi - np.outer(a, a) / phi ** 2
            # L2 penalizer (ridge), lifelines-style scaled by n
            pen = 0.5 * self.penalizer * n
            nll = -ll + pen * beta @ beta
            ngrad = -grad + 2 * pen * beta
            nhess = -hess + 2 * pen * np.eye(p)
            return nll, ngrad, nhess

        beta = np.zeros(p)
        prev, g, h = nll_grad_hess(beta)
        for _ in range(self.max_iter):
            step = np.linalg.solve(h + 1e-9 * np.eye(p), g)
            lr, val = 1.0, np.inf
            for _ls in range(25):
                cand = beta - lr * step
                val, gc, hc = nll_grad_hess(cand)
                if np.isfinite(val) and val <= prev:
                    break
                lr *= 0.5
            beta, g, h = cand, gc, hc
            if abs(prev - val) < self.tol * (abs(prev) + 1.0):
                break
            prev = val
        self.beta = beta
        return self

    def risk(self, x: np.ndarray) -> np.ndarray:
        xs = (np.asarray(x, np.float64) - self._mean) / self._std
        return xs @ self.beta

    def score(self, x, durations, events) -> float:
        t = np.asarray(durations, float)
        keep = np.isfinite(t) & np.isfinite(np.asarray(x, float)).all(axis=1)
        return concordance_index(t[keep], self.risk(np.asarray(x)[keep]),
                                 np.asarray(events)[keep])


def fit_logreg(x_train, y_train, seed: int = 0):
    """liblinear LogisticRegression, as test_utils_modaltune.py:56-58.

    Modern sklearn removed liblinear's built-in one-vs-rest multiclass
    handling; an explicit OvR wrapper reproduces the reference-era
    behavior for >2 classes (RCC subtype, cancer-site classifier)."""
    from sklearn.linear_model import LogisticRegression
    x, y = filter_labelset(np.asarray(x_train),
                           np.asarray(y_train, int).ravel())
    clf = LogisticRegression(random_state=seed, max_iter=200,
                             solver="liblinear")
    if len(np.unique(y)) > 2:
        from sklearn.multiclass import OneVsRestClassifier
        clf = OneVsRestClassifier(clf)
    return clf.fit(x, y)


def classification_metrics(y_true, y_pred,
                           y_probs=None) -> Dict[str, float]:
    """acc / balanced acc / recall / precision / F1 (+ ROC AUC and the
    confusion matrix when probabilities are given) — the metric set the
    reference logs to wandb (train_modaltune.py:479-497)."""
    from sklearn.metrics import (accuracy_score, balanced_accuracy_score,
                                 confusion_matrix, f1_score,
                                 precision_score, recall_score)
    # "binary" requires labels in {0,1} across BOTH arrays; a predicted
    # unseen class must flip to macro averaging
    all_labels = np.unique(np.concatenate([np.asarray(y_true),
                                           np.asarray(y_pred)]))
    avg = "macro" if len(all_labels) > 2 or all_labels.max(initial=0) > 1 \
        else "binary"
    out = dict(
        acc=float(accuracy_score(y_true, y_pred)),
        bal_acc=float(balanced_accuracy_score(y_true, y_pred)),
        recall=float(recall_score(y_true, y_pred, average=avg,
                                  zero_division=0)),
        precision=float(precision_score(y_true, y_pred, average=avg,
                                        zero_division=0)),
        f1=float(f1_score(y_true, y_pred, average=avg, zero_division=0)))
    if y_probs is not None and len(np.unique(y_true)) > 1:
        from sklearn.metrics import roc_auc_score
        try:
            probs = np.asarray(y_probs)
            if probs.ndim == 2 and probs.shape[1] == 2:
                out["auc"] = float(roc_auc_score(y_true, probs[:, 1]))
            else:
                out["auc"] = float(roc_auc_score(
                    y_true, probs, multi_class="ovr"))
        except ValueError:
            pass
        out["confusion_matrix"] = confusion_matrix(
            y_true, y_pred).tolist()
        out["roc_curve"] = roc_curve_points(y_true, y_probs)
    return out


def roc_curve_points(y_true, y_probs) -> Dict[str, object]:
    """fpr/tpr point lists for export — the data behind the reference's
    wandb ROC plot (``wandb.plot.roc_curve``, train_modaltune.py:496).
    Binary: one curve on the positive-class score; multiclass: one
    one-vs-rest curve per class, keyed ``"class_<k>"``."""
    from sklearn.metrics import roc_curve
    probs = np.asarray(y_probs)
    classes = np.unique(y_true)
    out: Dict[str, object] = {}
    if probs.ndim == 2 and probs.shape[1] == 2 and len(classes) == 2:
        fpr, tpr, _ = roc_curve(y_true, probs[:, 1])
        out["fpr"], out["tpr"] = fpr.tolist(), tpr.tolist()
    elif probs.ndim == 2:
        for k in classes:
            if int(k) >= probs.shape[1]:
                continue
            fpr, tpr, _ = roc_curve((np.asarray(y_true) == k).astype(int),
                                    probs[:, int(k)])
            out[f"class_{int(k)}"] = {"fpr": fpr.tolist(),
                                      "tpr": tpr.tolist()}
    return out


def perform_testing(x_train: np.ndarray, meta_train: Sequence[dict],
                    x_test: np.ndarray, meta_test: Sequence[dict],
                    penalizer: float = 0.1,
                    label_key: str = "primary_class") -> Dict[str, dict]:
    """Per-task LogReg + CoxPH readout (``perform_testing``,
    test_utils_modaltune.py:133-171).

    x_*: (N, n_tasks, dim) embeddings; meta_*: per-case dicts with
    ``primary_class``, ``durations``, ``vital_status``.
    Returns {task_name: {"c_index": ..., "acc": ..., "bal_acc": ...}}.
    """
    y_train = np.array([m.get(label_key, -1) for m in meta_train], float)
    y_test = np.array([m.get(label_key, -1) for m in meta_test], float)
    y_train = np.nan_to_num(y_train, nan=-1).astype(int)
    y_test = np.nan_to_num(y_test, nan=-1).astype(int)
    t_train = np.array([m.get("durations", np.nan) for m in meta_train],
                       float)
    e_train = np.array([m.get("vital_status", 0) for m in meta_train], int)
    t_test = np.array([m.get("durations", np.nan) for m in meta_test],
                      float)
    e_test = np.array([m.get("vital_status", 0) for m in meta_test], int)

    results = {}
    n_tasks = x_train.shape[1]
    for i in range(n_tasks):
        name = TASK_NAMES[i] if i < len(TASK_NAMES) else f"task{i}"
        res = {}
        cph = CoxPH(penalizer=penalizer).fit(x_train[:, i], t_train,
                                             e_train)
        res["c_index"] = cph.score(x_test[:, i], t_test, e_test)
        clf = fit_logreg(x_train[:, i], y_train)
        xt, yt = filter_labelset(x_test[:, i], y_test)
        if len(yt):
            res.update(classification_metrics(yt, clf.predict(xt)))
        results[name] = res
    return results
