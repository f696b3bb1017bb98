"""Weight-converter tests: a synthetic torch-style GigaPath state dict
converts into exactly the flax param tree LongNetViT/ModalTuneModel
expect (shapes + names), and linear layers behave as the transposed
torch op."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_gigapath import (convert_backbone_spanned,
                              convert_backbone_state_dict)
from modaltune_tpu.configs import tiny_test_config
from modaltune_tpu.models import LongNetViT, ModalTuneModel
from modaltune_tpu.models.longnet import default_spans
from modaltune_tpu.utils.params_io import flatten_params


def synthetic_torch_state(depth, dim, ffn, in_chans, seed=0):
    """Key/shape layout of GigaPath's slide_encoder.pth['model']."""
    rng = np.random.RandomState(seed)
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, d):
        sd[f"{name}.weight"] = rng.rand(d).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(d).astype(np.float32) * 0.1

    lin("patch_embed.proj", in_chans, dim)
    sd["cls_token"] = rng.randn(1, 1, dim).astype(np.float32)
    sd["pos_embed"] = rng.randn(1, 10, dim).astype(np.float32)  # dropped
    for i in range(depth):
        base = f"encoder.layers.{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{base}.self_attn.{p}", dim, dim)
        ln(f"{base}.self_attn.inner_attn_ln", dim)
        ln(f"{base}.self_attn_layer_norm", dim)
        ln(f"{base}.final_layer_norm", dim)
        lin(f"{base}.ffn.fc1", dim, ffn)
        lin(f"{base}.ffn.fc2", ffn, dim)
        ln(f"{base}.ffn.ffn_layernorm", ffn)
    ln("encoder.layer_norm", dim)
    ln("norm", dim)
    return sd


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_test_config()
    b = cfg.backbone
    ln_cfg = b.longnet()
    sd = synthetic_torch_state(b.depth, b.embed_dim, ln_cfg.ffn_dim,
                               b.in_chans)
    return cfg, sd


def test_converted_tree_loads_into_backbone(tiny_setup):
    cfg, sd = tiny_setup
    spans = default_spans(cfg.backbone.longnet(),
                          cfg.adapter.interaction_indexes)
    tree = convert_backbone_spanned(sd, spans=spans)

    backbone = LongNetViT(cfg.backbone, spans=spans)
    rng = np.random.RandomState(0)
    bag = jnp.asarray(rng.randn(1, 32, cfg.backbone.in_chans), jnp.float32)
    coords = jnp.asarray(rng.randint(0, 30, (1, 32, 2)) * 256.0,
                         jnp.float32)
    ref = backbone.init(jax.random.PRNGKey(0), bag, coords)["params"]

    flat_ref = flatten_params(ref)
    flat_conv = flatten_params(tree)
    assert set(flat_ref) == set(flat_conv), (
        sorted(set(flat_ref) ^ set(flat_conv))[:10])
    for k in flat_ref:
        assert flat_ref[k].shape == flat_conv[k].shape, k

    # forward runs with converted weights
    out = backbone.apply({"params": jax.tree.map(jnp.asarray, tree)},
                         bag, coords)
    assert np.all(np.isfinite(np.asarray(out)))


def test_linear_transpose_semantics(tiny_setup):
    """flax Dense with converted kernel == torch Linear (x @ W.T + b)."""
    cfg, sd = tiny_setup
    tree = convert_backbone_state_dict(sd)
    w = sd["patch_embed.proj.weight"]   # (out, in)
    b = sd["patch_embed.proj.bias"]
    x = np.random.RandomState(1).randn(4, w.shape[1]).astype(np.float32)
    torch_out = x @ w.T + b
    kernel = tree["patch_embed"]["proj"]["kernel"]
    flax_out = x @ kernel + tree["patch_embed"]["proj"]["bias"]
    np.testing.assert_allclose(flax_out, torch_out, atol=1e-5)


def test_converted_backbone_plugs_into_modaltune(tiny_setup):
    cfg, sd = tiny_setup
    spans = default_spans(cfg.backbone.longnet(),
                          cfg.adapter.interaction_indexes)
    tree = convert_backbone_spanned(sd, spans=spans)
    model = ModalTuneModel(cfg, n_gene_groups=6, max_group_len=5)
    rng = np.random.RandomState(0)
    bag = jnp.asarray(rng.randn(1, 32, cfg.backbone.in_chans), jnp.float32)
    coords = jnp.asarray(rng.randint(0, 30, (1, 32, 2)) * 256.0,
                         jnp.float32)
    genes = jnp.asarray(rng.randn(1, 6, 5), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), bag, coords, genes,
                        task_token=jnp.eye(3)[:1])["params"]
    params = dict(params)
    params["backbone"] = jax.tree.map(jnp.asarray, tree)
    out = model.apply({"params": params}, bag, coords, genes,
                      task_token=jnp.eye(3)[:1])
    assert out.shape == (1, cfg.adapter.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_apply_bert_init():
    """init_bert_params hook (torchscale/architecture/utils.py:10-33):
    kernels N(0, .02), Linear biases zero, LayerNorm untouched."""
    import jax
    import jax.numpy as jnp
    from modaltune_tpu.utils.params_io import apply_bert_init
    params = {
        "dense": {"kernel": jnp.ones((64, 64)), "bias": jnp.ones(64)},
        "ln": {"scale": jnp.full((8,), 2.0), "bias": jnp.ones(8)},
    }
    out = apply_bert_init(params, jax.random.PRNGKey(0))
    k = np.asarray(out["dense"]["kernel"])
    assert abs(k.std() - 0.02) < 0.005 and abs(k.mean()) < 0.005
    assert np.all(np.asarray(out["dense"]["bias"]) == 0)
    assert np.all(np.asarray(out["ln"]["scale"]) == 2.0)
    assert np.all(np.asarray(out["ln"]["bias"]) == 1.0)
