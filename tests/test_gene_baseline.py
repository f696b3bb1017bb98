"""Genomics-only baseline: GeneOnlyModel output modes
(``return_logits`` parity — aggregators.py:43-58, gene_encoder.py:217-223)
and the supervised GeneBaselineTrainer lifecycle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import GeneEncoderConfig, TrainConfig
from modaltune_tpu.data import SyntheticSlideDataset
from modaltune_tpu.models import (GeneOnlyModel, create_aggregator,
                                  survival_from_logits)
from modaltune_tpu.train.gene_trainer import (GeneBaselineTrainer,
                                              duration_bins, to_bins)
from modaltune_tpu.train.losses import (cross_entropy_loss,
                                        survival_nll_loss)

CFG = GeneEncoderConfig(latent_dim=32, depth=2, final_groups=4,
                        output_dim=48)


def _model(mode, n_classes=4):
    return GeneOnlyModel(CFG, n_gene_groups=8, max_group_len=16,
                         n_classes=n_classes, mode=mode)


def _genes(b=2, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(b, 8, 16).astype(np.float32))


def test_registry_has_gene_mixer_group():
    m = create_aggregator("gene_mixer_group", cfg=CFG, n_gene_groups=8,
                          max_group_len=16, n_classes=3,
                          mode="classifier")
    assert isinstance(m, GeneOnlyModel)


def test_mode_shapes_and_sharing():
    """feature -> tokens; classifier -> logits; survival -> the cumprod
    transform of the SAME logits (shared trunk + head)."""
    genes = _genes()
    mc = _model("classifier")
    params = mc.init(jax.random.PRNGKey(0), genes)["params"]
    logits = mc.apply({"params": params}, genes)
    assert logits.shape == (2, 4)

    feats = _model("feature").apply({"params": {
        "gene_encoder": params["gene_encoder"]}}, genes)
    assert feats.shape == (2, CFG.final_groups, CFG.output_dim)

    hazards, s, y_hat = _model("survival").apply({"params": params},
                                                 genes)
    np.testing.assert_allclose(np.asarray(hazards),
                               jax.nn.sigmoid(logits), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s), np.cumprod(1 - np.asarray(hazards), -1),
        rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(y_hat),
                                  np.asarray(logits).argmax(-1))


def test_survival_curve_monotone():
    _, s, _ = survival_from_logits(jnp.asarray(
        np.random.RandomState(1).randn(3, 6), jnp.float32))
    s = np.asarray(s)
    assert (np.diff(s, axis=-1) <= 1e-7).all()
    assert ((0 <= s) & (s <= 1)).all()


def test_cross_entropy_matches_oracle():
    logits = np.random.RandomState(2).randn(5, 4).astype(np.float32)
    y = np.array([0, 3, 1, 2, 2], np.int32)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(y)))
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = -np.mean(np.log(p[np.arange(5), y]))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_survival_nll_oracle():
    """Against a direct numpy transcription of the discrete NLL."""
    rng = np.random.RandomState(3)
    logits = rng.randn(6, 4).astype(np.float32)
    h = 1 / (1 + np.exp(-logits))
    s = np.cumprod(1 - h, -1)
    y = rng.randint(0, 4, 6)
    e = rng.randint(0, 2, 6)
    got = float(survival_nll_loss(jnp.asarray(h), jnp.asarray(s),
                                  jnp.asarray(y), jnp.asarray(e)))
    s_pad = np.concatenate([np.ones((6, 1)), s], 1)
    c = 1 - e
    unc = -(1 - c) * (np.log(s_pad[np.arange(6), y]) +
                      np.log(h[np.arange(6), y]))
    cen = -c * np.log(s_pad[np.arange(6), y + 1])
    want = np.mean(0.6 * (cen + unc) + 0.4 * unc)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_duration_binning():
    t = np.array([1, 2, 3, 4, 5, 6, 7, 8], float)
    e = np.ones(8, int)
    edges = duration_bins(t, e, 4)
    bins = to_bins(t, edges)
    assert edges.shape == (3,)
    assert bins.min() == 0 and bins.max() == 3
    # censored-only durations don't crash
    assert duration_bins(t, np.zeros(8, int), 4).shape == (3,)


@pytest.mark.parametrize("mode", ["classifier", "survival"])
def test_gene_trainer_lifecycle(tmp_path, mode):
    datasets = {k: SyntheticSlideDataset(n_cases=12, in_chans=8,
                                         bag_range=(4, 8), seed=i)
                for i, k in enumerate(("train", "val", "test"))}
    packer = datasets["train"].packer
    model = GeneOnlyModel(CFG, n_gene_groups=packer.n_groups,
                          max_group_len=packer.max_group_len,
                          n_classes=4, mode=mode)
    cfg = TrainConfig(lr=1e-3, num_epochs=2, warmup_epochs=1,
                      eval_interval=1)
    tr = GeneBaselineTrainer(model, cfg, datasets, str(tmp_path),
                             batch_size=4)
    rng = np.random.RandomState(0)
    ex = datasets["train"].get(0, rng)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(ex.genes[None]))["params"]
    best = tr.run(params)
    assert np.isfinite(best) and best > -1
    assert (tmp_path / "best_model_weights.npz").exists()
    assert (tmp_path / "run_metrics.jsonl").exists()
