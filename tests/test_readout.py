"""Readout-head tests: native CoxPH recovers known hazard structure and
the c-index behaves; perform_testing produces sane per-task metrics."""

import numpy as np
import pytest

from modaltune_tpu.eval.readout import (CoxPH, concordance_index,
                                        fit_logreg, perform_testing)


def simulate_cox(n=300, p=4, beta=None, seed=0):
    rng = np.random.RandomState(seed)
    if beta is None:
        beta = np.array([1.0, -0.5, 0.0, 0.25])
    x = rng.randn(n, p)
    # exponential survival with rate exp(x @ beta)
    u = rng.rand(n)
    t = -np.log(u) / np.exp(x @ beta)
    c = rng.exponential(np.median(t) * 2, size=n)
    obs = np.minimum(t, c)
    event = (t <= c).astype(int)
    return x, obs, event, beta


def test_concordance_perfect_and_random():
    t = np.array([1.0, 2.0, 3.0, 4.0])
    e = np.ones(4, int)
    # risk perfectly anti-ordered with time -> c = 1
    assert concordance_index(t, np.array([4.0, 3.0, 2.0, 1.0]), e) == 1.0
    assert concordance_index(t, np.array([1.0, 2.0, 3.0, 4.0]), e) == 0.0
    assert concordance_index(t, np.zeros(4), e) == 0.5


def test_coxph_recovers_signal():
    x, t, e, beta = simulate_cox()
    cph = CoxPH(penalizer=0.01).fit(x, t, e)
    # signs of the strong coefficients recovered (standardized scale)
    assert cph.beta[0] > 0.3
    assert cph.beta[1] < -0.1
    c = cph.score(x, t, e)
    assert c > 0.7, c


def test_coxph_handles_ties_and_nan():
    x, t, e, _ = simulate_cox(n=120, seed=1)
    t = np.round(t, 1)  # induce ties
    t[::17] = np.nan    # induce missing durations (dropna path)
    cph = CoxPH().fit(x, t, e)
    assert np.all(np.isfinite(cph.beta))
    assert 0.0 <= cph.score(x, t, e) <= 1.0


def test_perform_testing_end_to_end():
    rng = np.random.RandomState(0)
    n_tr, n_te, tasks, dim = 80, 40, 3, 16
    # class-separable embeddings
    y_tr = rng.randint(0, 2, n_tr)
    y_te = rng.randint(0, 2, n_te)
    x_tr = rng.randn(n_tr, tasks, dim) + y_tr[:, None, None] * 2.0
    x_te = rng.randn(n_te, tasks, dim) + y_te[:, None, None] * 2.0
    risk_tr = x_tr[:, 0, 0]
    meta_tr = [dict(primary_class=int(y_tr[i]),
                    durations=float(np.exp(-risk_tr[i]) * 10 + 1),
                    vital_status=1) for i in range(n_tr)]
    meta_te = [dict(primary_class=int(y_te[i]),
                    durations=float(np.exp(-x_te[i, 0, 0]) * 10 + 1),
                    vital_status=1) for i in range(n_te)]
    res = perform_testing(x_tr, meta_tr, x_te, meta_te)
    assert set(res) == {"General", "Diagnosis", "Survival"}
    assert res["General"]["bal_acc"] > 0.85
    assert res["General"]["c_index"] > 0.6
    for task in res.values():
        assert 0 <= task["c_index"] <= 1


def test_roc_curve_points_binary_and_multiclass():
    from modaltune_tpu.eval.readout import (classification_metrics,
                                            roc_curve_points)
    rng = np.random.RandomState(0)
    y = rng.randint(0, 2, 50)
    p1 = np.clip(y + rng.randn(50) * 0.3, 0, 1)
    probs = np.stack([1 - p1, p1], axis=1)
    pts = roc_curve_points(y, probs)
    assert len(pts["fpr"]) == len(pts["tpr"]) >= 2
    assert pts["fpr"][0] == 0.0 and pts["fpr"][-1] == 1.0
    m = classification_metrics(y, (p1 > 0.5).astype(int), y_probs=probs)
    assert "roc_curve" in m and "confusion_matrix" in m

    y3 = rng.randint(0, 3, 60)
    probs3 = rng.rand(60, 3)
    probs3 /= probs3.sum(1, keepdims=True)
    pts3 = roc_curve_points(y3, probs3)
    assert set(pts3) == {"class_0", "class_1", "class_2"}
