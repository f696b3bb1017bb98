"""TITAN backbone + adapter tests: grid scatter semantics, ALiBi bias
structure, forward shapes, and background-mask invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import (AdapterConfig, GeneEncoderConfig,
                                   TitanConfig, TitanModalTuneConfig)
from modaltune_tpu.models import (TitanModalTuneModel, TitanViT, alibi_bias,
                                  grid_scatter_bag)


def test_grid_scatter_semantics():
    feats = np.array([[1., 2.], [3., 4.], [10., 20.]], np.float32)
    coords = np.array([[0, 0], [0, 1024], [0, 0]], np.float64)
    tokens, gcoords, valid = grid_scatter_bag(feats, coords,
                                              patch_size_lv0=1024,
                                              bucket=4)
    # two cells: (0,0) sums rows 0+2, (0,1) takes row 1
    assert tokens.shape == (4, 2)
    assert valid.sum() == 2
    fg = tokens[valid]
    assert {tuple(r) for r in fg.tolist()} == {(11., 22.), (3., 4.)}
    # padding rows are zero and invalid
    assert np.all(tokens[~valid] == 0)


def test_grid_scatter_bucket_truncates_background_last():
    rng = np.random.RandomState(0)
    feats = rng.randn(5, 3).astype(np.float32)
    coords = np.array([[0, 0], [0, 1024], [0, 2048], [1024, 0],
                       [5120, 5120]], np.float64)
    tokens, gcoords, valid = grid_scatter_bag(feats, coords, 1024,
                                              bucket=8)
    assert valid.sum() == 5  # all foreground kept, background dropped


def test_alibi_bias_structure():
    g = jnp.asarray(np.array([[[0, 0], [0, 1], [3, 4]]], np.float32))
    valid = jnp.asarray([[True, True, False]])
    bias = alibi_bias(g, num_heads=2, valid=valid)
    assert bias.shape == (1, 2, 4, 4)
    b = np.asarray(bias)
    # cls row/col zero bias (valid keys)
    assert b[0, 0, 0, 0] == 0
    # distance (0,0)->(0,1) = 1 scaled by slope of head 0 = 2^-4
    np.testing.assert_allclose(b[0, 0, 1, 2], -(2 ** -4.0), rtol=1e-6)
    # head 1 steeper/shallower slope: 2^-8
    np.testing.assert_allclose(b[0, 1, 1, 2], -(2 ** -8.0), rtol=1e-6)
    # invalid key masked everywhere
    assert np.all(b[:, :, :, 3] < -1e8)


def _tiny_titan(clinical=False):
    backbone = TitanConfig(in_dim=32, embed_dim=64, depth=2, num_heads=4,
                           mlp_patch_embed_dim=32, attn_pooler_queries=8,
                           attn_pooler_heads=4, drop_path_rate=0.0)
    adapter = AdapterConfig(num_heads=4, output_dim=32,
                            interaction_indexes=((0, 0), (1, 1)),
                            token_agg="cat", drop_path_rate=0.0,
                            clinfeat_dim=5 if clinical else 0)
    gene = GeneEncoderConfig(latent_dim=16, depth=1, final_groups=4,
                             output_dim=64, dropout=0.0)
    return TitanModalTuneConfig(backbone=backbone, adapter=adapter,
                                gene=gene)


@pytest.fixture(scope="module")
def titan_model():
    cfg = _tiny_titan()
    model = TitanModalTuneModel(cfg, n_gene_groups=6, max_group_len=5)
    rng = np.random.RandomState(0)
    n = 32
    bag = jnp.asarray(rng.randn(1, n, 32), jnp.float32)
    coords = jnp.asarray(rng.randint(0, 10, (1, n, 2)), jnp.float32)
    mask = jnp.asarray(np.arange(n)[None] < 20)
    genes = jnp.asarray(rng.randn(1, 6, 5), jnp.float32)
    task = jnp.eye(3)[:1]
    params = model.init(jax.random.PRNGKey(0), bag, coords, genes,
                        task_token=task, bag_mask=mask)
    return cfg, model, params, (bag, coords, mask, genes, task)


def test_titan_forward_shape(titan_model):
    cfg, model, params, (bag, coords, mask, genes, task) = titan_model
    out = model.apply(params, bag, coords, genes, task_token=task,
                      bag_mask=mask)
    assert out.shape == (1, cfg.adapter.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_titan_bg_invariance(titan_model):
    """Background (invalid) grid cells must not influence the output —
    the static-shape equivalent of the reference's bg-token crop
    (titan_adapter.py:282-291)."""
    cfg, model, params, (bag, coords, mask, genes, task) = titan_model
    out1 = model.apply(params, bag, coords, genes, task_token=task,
                       bag_mask=mask)
    noise = jnp.asarray(
        np.random.RandomState(1).randn(*bag.shape) * 30, jnp.float32)
    bag2 = jnp.where(mask[..., None], bag, noise)
    out2 = model.apply(params, bag2, coords, genes, task_token=task,
                       bag_mask=mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-4, rtol=1e-4)


def test_titan_backbone_standalone(titan_model):
    cfg, _, _, (bag, coords, mask, genes, task) = titan_model
    vit = TitanViT(cfg.backbone)
    params = vit.init(jax.random.PRNGKey(1), bag, coords, mask)
    out = vit.apply(params, bag, coords, mask)
    assert out.shape == (1, cfg.backbone.embed_dim)
