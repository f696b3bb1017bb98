"""Model-layer tests: pos-embed parity with the MAE sincos buffer,
ModalTune forward shapes, padding invariance, and frozen/trainable
partition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import tiny_test_config
from modaltune_tpu.models import LongNetViT, ModalTuneModel, coords_pos_embed


def mae_sincos_buffer(embed_dim, grid_size):
    """Independent numpy implementation of the MAE 2-D sincos grid
    (w-first meshgrid, sin|cos halves), as in GigaPath's buffer."""
    def sincos_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gw, gh = np.meshgrid(np.arange(grid_size, dtype=np.float64),
                         np.arange(grid_size, dtype=np.float64))
    emb = np.concatenate([sincos_1d(embed_dim // 2, gw),
                          sincos_1d(embed_dim // 2, gh)], axis=1)
    return emb  # row p = i*grid + j  ->  [sincos(j), sincos(i)]


def test_pos_embed_matches_buffer():
    grid, dim, tile = 16, 64, 256
    buf = mae_sincos_buffer(dim, grid)
    rng = np.random.RandomState(0)
    ij = rng.randint(0, grid, size=(50, 2))
    # coords axis 0 -> row i (buffer index i*grid+j), axis 1 -> col j,
    # with sub-tile jitter (floor(coords/tile) must discretize)
    coords = ij * tile + rng.randint(0, tile, size=(50, 2))
    pe = coords_pos_embed(jnp.asarray(coords, jnp.float32)[None], dim, tile)
    rows = buf[ij[:, 0] * grid + ij[:, 1]]
    np.testing.assert_allclose(np.asarray(pe[0]), rows, atol=1e-5)


def _dummy_inputs(cfg, B=1, L=96, valid=70, seed=0):
    rng = np.random.RandomState(seed)
    bag = jnp.asarray(rng.randn(B, L, cfg.backbone.in_chans), jnp.float32)
    coords = jnp.asarray(
        rng.randint(0, 40, size=(B, L, 2)) * cfg.backbone.tile_size,
        jnp.float32)
    mask = jnp.arange(L)[None, :] < valid
    genes = jnp.asarray(rng.randn(B, 12, 7), jnp.float32)
    task = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 3)
    return bag, coords, mask, genes, task


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config()
    model = ModalTuneModel(cfg, n_gene_groups=12, max_group_len=7)
    bag, coords, mask, genes, task = _dummy_inputs(cfg)
    params = model.init(jax.random.PRNGKey(0), bag, coords, genes,
                        task_token=task, bag_mask=mask)
    return cfg, model, params


def test_forward_shapes(tiny_model):
    cfg, model, params = tiny_model
    bag, coords, mask, genes, task = _dummy_inputs(cfg)
    out = model.apply(params, bag, coords, genes, task_token=task,
                      bag_mask=mask)
    assert out.shape == (1, cfg.adapter.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_forward_batched_tasks(tiny_model):
    """Batched multi-task forward == per-task forwards."""
    cfg, model, params = tiny_model
    bag, coords, mask, genes, _ = _dummy_inputs(cfg)
    tasks = jnp.eye(3)
    bag3 = jnp.tile(bag, (3, 1, 1))
    coords3 = jnp.tile(coords, (3, 1, 1))
    mask3 = jnp.tile(mask, (3, 1))
    genes3 = jnp.tile(genes, (3, 1, 1))
    out_b = model.apply(params, bag3, coords3, genes3, task_token=tasks,
                        bag_mask=mask3)
    for t in range(3):
        out_t = model.apply(params, bag, coords, genes,
                            task_token=tasks[t:t + 1], bag_mask=mask)
        np.testing.assert_allclose(np.asarray(out_b[t]),
                                   np.asarray(out_t[0]), atol=1e-5,
                                   rtol=1e-4)


def test_padding_invariance(tiny_model):
    """Outputs must not depend on values in padded bag positions."""
    cfg, model, params = tiny_model
    bag, coords, mask, genes, task = _dummy_inputs(cfg)
    out1 = model.apply(params, bag, coords, genes, task_token=task,
                       bag_mask=mask)
    noise = jnp.asarray(
        np.random.RandomState(1).randn(*bag.shape) * 50, jnp.float32)
    bag2 = jnp.where(mask[..., None], bag, noise)
    out2 = model.apply(params, bag2, coords, genes, task_token=task,
                       bag_mask=mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-4, rtol=1e-4)


def test_bucket_invariance(tiny_model):
    """Same bag padded into a larger bucket gives (nearly) the same
    output. Not bit-exact: segment boundaries for clamped branches depend
    on padded length (documented semantic delta), but tiny-config segments
    divide both bucket sizes so here it must match closely."""
    cfg, model, params = tiny_model
    bag, coords, mask, genes, task = _dummy_inputs(cfg, L=96, valid=70)
    out1 = model.apply(params, bag, coords, genes, task_token=task,
                       bag_mask=mask)
    pad = 32
    bag2 = jnp.pad(bag, ((0, 0), (0, pad), (0, 0)))
    coords2 = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
    mask2 = jnp.pad(mask, ((0, 0), (0, pad)))
    out2 = model.apply(params, bag2, coords2, genes, task_token=task,
                       bag_mask=mask2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=2e-3, rtol=2e-3)


def test_frozen_partition(tiny_model):
    cfg, model, params = tiny_model
    keys = set(params["params"].keys())
    assert "backbone" in keys
    trainable = keys - {"backbone"}
    assert {"gene_encoder", "interactions_0", "final_project",
            "gene_pe"} <= trainable


@pytest.mark.slow
def test_gradients_flow_to_adapter_only_when_masked(tiny_model):
    cfg, model, params = tiny_model
    bag, coords, mask, genes, task = _dummy_inputs(cfg)

    def loss(p):
        out = model.apply({"params": p}, bag, coords, genes,
                          task_token=task, bag_mask=mask)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params["params"])
    # gradients exist for adapter & gene encoder params
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g["gene_encoder"], 0.0)
    assert gnorm > 0
    inorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        g["interactions_0"], 0.0)
    assert inorm > 0


def test_backbone_only_forward(tiny_model):
    """The standalone backbone (slide_encoder.py:213-290 path) applies the
    encoder LayerNorm + ViT norm that the adapter path skips; a full
    backbone param set is a superset of what ModalTuneModel uses."""
    cfg, model, params = tiny_model
    backbone = LongNetViT(cfg.backbone)
    bag, coords, mask, genes, task = _dummy_inputs(cfg)
    full = backbone.init(jax.random.PRNGKey(1), bag, coords, mask)
    out = backbone.apply(full, bag, coords, mask)
    assert out.shape == (1, cfg.backbone.embed_dim)
    assert np.all(np.isfinite(np.asarray(out)))
    # ModalTune accepts a superset backbone param dict (extra layer_norm /
    # norm entries from a converted checkpoint are ignored)
    merged = dict(params["params"])
    merged["backbone"] = full["params"]
    out2 = model.apply({"params": merged}, bag, coords, genes,
                       task_token=task, bag_mask=mask)
    assert out2.shape == (1, cfg.adapter.output_dim)
