"""ABMIL / TransMIL baseline aggregators: masking semantics, Nystrom
pseudo-inverse accuracy, output modes, registry, and trainer
learnability (BASELINE.json target configs #1-#2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import GeneEncoderConfig, TrainConfig
from modaltune_tpu.data import SyntheticSlideDataset
from modaltune_tpu.models import (AGGREGATORS, AbmilModel, TransMilModel,
                                  create_aggregator)
from modaltune_tpu.models.mil import _newton_schulz_pinv


def _bag(b=2, n=50, c=32, seed=0):
    rng = np.random.RandomState(seed)
    bag = jnp.asarray(rng.randn(b, n, c), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None, :] < np.array([[40], [50]]))
    return bag, mask


def test_registry_has_mil_names():
    assert "abmil" in AGGREGATORS and "transmil" in AGGREGATORS
    m = create_aggregator("abmil", n_classes=3)
    assert isinstance(m, AbmilModel) and m.n_classes == 3


@pytest.mark.parametrize("cls", [AbmilModel, TransMilModel])
def test_modes_and_shapes(cls):
    bag, mask = _bag()
    for mode, check in (
            ("feature", lambda o: o.shape == (2, 512)),
            ("classifier", lambda o: o.shape == (2, 4)),
            ("survival", lambda o: o[0].shape == (2, 4)
             and o[1].shape == (2, 4))):
        model = cls(n_classes=4, mode=mode)
        params = model.init(jax.random.PRNGKey(0), bag, mask)["params"]
        out = model.apply({"params": params}, bag, mask)
        assert check(out), (mode, jax.tree.map(jnp.shape, out))
    if cls is TransMilModel:
        # survival S must be a monotone non-increasing curve
        model = cls(n_classes=4, mode="survival")
        params = model.init(jax.random.PRNGKey(0), bag, mask)["params"]
        _, s, _ = model.apply({"params": params}, bag, mask)
        assert np.all(np.diff(np.asarray(s), axis=-1) <= 1e-6)


@pytest.mark.parametrize("cls", [AbmilModel, TransMilModel])
def test_padding_values_never_leak(cls):
    """Changing the CONTENT of masked rows must not change the output
    at all — the masking contract of the bucketed batch format."""
    bag, mask = _bag()
    model = cls(n_classes=2, mode="classifier")
    params = model.init(jax.random.PRNGKey(0), bag, mask)["params"]
    out1 = model.apply({"params": params}, bag, mask)
    garbage = jnp.where(jnp.asarray(mask)[:, :, None], bag, 1e3)
    out2 = model.apply({"params": params}, garbage, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_abmil_matches_dense_oracle():
    """Gated-attention pooling == explicit numpy softmax over the real
    instances only."""
    from modaltune_tpu.models.mil import GatedAttentionPool
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(1, 20, 16), jnp.float32)
    mask = jnp.asarray(np.arange(20)[None, :] < 13)
    pool = GatedAttentionPool(attn_dim=8)
    params = pool.init(jax.random.PRNGKey(0), h, mask)["params"]
    pooled, attn = pool.apply({"params": params}, h, mask)
    a = np.asarray(attn)[0]
    assert a[13:].max() < 1e-12 and abs(a.sum() - 1) < 1e-5
    np.testing.assert_allclose(
        np.asarray(pooled)[0], (a[:, None] * np.asarray(h)[0]).sum(0),
        atol=1e-5, rtol=1e-5)


def test_newton_schulz_pinv_accuracy():
    rng = np.random.RandomState(0)
    # softmax-style row-stochastic matrices (the actual input class)
    logits = rng.randn(3, 16, 16).astype(np.float32)
    a = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    z = np.asarray(_newton_schulz_pinv(jnp.asarray(a), iters=6))
    # A @ Z @ A ~ A is the property the attention factorization needs.
    # (Elementwise agreement with np.linalg.pinv is NOT expected:
    # row-stochastic matrices are near-singular and their exact pinv has
    # huge entries that the truncated cubic iteration deliberately
    # regularizes away — same behavior as the Nystromformer reference.)
    for ai, zi in zip(a, z):
        np.testing.assert_allclose(ai @ zi @ ai, ai, atol=1e-2)


def test_cat_fusion_uses_genes():
    ds = SyntheticSlideDataset(n_cases=1, in_chans=32, bag_range=(30, 40))
    packer = ds.packer
    bag, mask = _bag(c=32)
    genes = jnp.asarray(np.random.RandomState(0).randn(
        2, packer.n_groups, packer.max_group_len), jnp.float32)
    model = AbmilModel(n_classes=2, mode="feature",
                       gene_cfg=GeneEncoderConfig(latent_dim=16, depth=1,
                                                  output_dim=24,
                                                  final_groups=4),
                       n_gene_groups=packer.n_groups,
                       max_group_len=packer.max_group_len)
    assert model.use_genes
    params = model.init(jax.random.PRNGKey(0), bag, mask, genes)["params"]
    out = model.apply({"params": params}, bag, mask, genes)
    assert out.shape == (2, 512 + 24)
    out2 = model.apply({"params": params}, bag, mask, genes * 2.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def _planted_datasets(n_train=24, n_eval=16, in_chans=32, shift=1.0):
    """Synthetic bags whose label is encoded as a mean shift of the
    instance features — learnable by attention pooling."""
    sets = {}
    for name, (n, seed) in (("train", (n_train, 0)), ("val", (n_eval, 1)),
                            ("test", (n_eval, 2))):
        ds = SyntheticSlideDataset(n_cases=n, in_chans=in_chans,
                                   bag_range=(30, 60), seed=seed)
        for e in ds._examples:
            e.bag = e.bag + shift * e.label
        sets[name] = ds
    return sets


@pytest.mark.slow
def test_abmil_trainer_learns(tmp_path):
    from modaltune_tpu.train.mil_trainer import MilBaselineTrainer
    sets = _planted_datasets()
    model = AbmilModel(n_classes=2, mode="classifier", dropout=0.0)
    cfg = TrainConfig(lr=3e-4, num_epochs=6, warmup_epochs=1, seed=0)
    tr = MilBaselineTrainer(model, cfg, sets, str(tmp_path),
                            batch_size=4, buckets=(64,))
    bag = jnp.zeros((1, 64, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), bag,
                        jnp.ones((1, 64), bool))["params"]
    best = tr.run(params)
    assert best > 0.85, f"ABMIL failed to learn planted signal: {best}"


@pytest.mark.slow
def test_transmil_cat_survival_trainer_runs(tmp_path):
    from modaltune_tpu.train.mil_trainer import MilBaselineTrainer
    sets = _planted_datasets(n_train=8, n_eval=8)
    packer = sets["train"].packer
    model = TransMilModel(
        n_classes=4, mode="survival", landmarks=16,
        gene_cfg=GeneEncoderConfig(latent_dim=16, depth=1, output_dim=24,
                                   final_groups=4),
        n_gene_groups=packer.n_groups, max_group_len=packer.max_group_len)
    cfg = TrainConfig(lr=1e-4, num_epochs=2, warmup_epochs=1, seed=0)
    tr = MilBaselineTrainer(model, cfg, sets, str(tmp_path),
                            batch_size=4, buckets=(64,))
    ex = sets["train"].get(0, np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(ex.bag[None, :32]),
                        jnp.ones((1, 32), bool),
                        jnp.asarray(ex.genes[None]))["params"]
    best = tr.run(params)
    assert np.isfinite(best)
    assert (tmp_path / "best_model_weights.npz").exists()
