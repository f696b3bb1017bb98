"""Full ModalTune checkpoint converter: a synthetic torch-style adapter
state dict converts into exactly the flax tree the model expects."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_modaltune import convert_modaltune_state_dict
from modaltune_tpu.configs import tiny_test_config
from modaltune_tpu.models import ModalTuneModel
from modaltune_tpu.models.longnet import default_spans
from modaltune_tpu.utils.params_io import flatten_params
from test_converter import synthetic_torch_state


def synthetic_adapter_state(cfg, n_groups, group_sizes, seed=0):
    """torch key layout of a LongNetGeneAdapter state dict."""
    rng = np.random.RandomState(seed)
    d = cfg.backbone.embed_dim
    ln_cfg = cfg.backbone.longnet()
    sd = synthetic_torch_state(cfg.backbone.depth, d, ln_cfg.ffn_dim,
                               cfg.backbone.in_chans, seed=seed)
    a = cfg.adapter
    inner = int(d * a.cffn_ratio)
    g = cfg.gene

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, dd):
        sd[f"{name}.weight"] = rng.rand(dd).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = (rng.randn(dd) * 0.1).astype(np.float32)

    def mha(name, e, kdim):
        sd[f"{name}.q_proj_weight"] = rng.randn(e, e).astype(np.float32)
        sd[f"{name}.k_proj_weight"] = rng.randn(e, kdim).astype(np.float32)
        sd[f"{name}.v_proj_weight"] = rng.randn(e, kdim).astype(np.float32)
        sd[f"{name}.in_proj_bias"] = rng.randn(3 * e).astype(np.float32)
        lin(f"{name}.out_proj", e, e)

    def cross(name):
        ln(f"{name}.norm", d)
        ln(f"{name}.norm_kq", d)
        lin(f"{name}.q_proj", d, inner)
        lin(f"{name}.output_proj", inner, d)
        mha(f"{name}.multihead_attn", inner, d)

    def extractor(name):
        cross(f"{name}.attn")
        ln(f"{name}.ffn.norm", d)
        lin(f"{name}.ffn.linear1", d, inner)
        lin(f"{name}.ffn.linear2", inner, d)

    n_int = len(a.interaction_indexes)
    for i in range(n_int):
        sd[f"interactions.{i}.injector.gamma"] = \
            np.zeros(d, np.float32)
        cross(f"interactions.{i}.injector.attn")
        extractor(f"interactions.{i}.extractor")
        if i == n_int - 1 and a.use_extra_extractor:
            for j in (0, 1):
                extractor(f"interactions.{i}.extra_extractors.{j}")
    for k in range(1, n_int):
        base = f"prompt_selfattention.{k}"
        ln(f"{base}.norm", d)
        lin(f"{base}.q_proj", d, inner)
        lin(f"{base}.output_proj", inner, d)
        mha(f"{base}.self_attn", inner, d)

    # gene encoder
    for i, size in enumerate(group_sizes):
        lin(f"gene_encoder.gene_networks.{i}.0.0", size, g.latent_dim)
        lin(f"gene_encoder.gene_networks.{i}.1.0", g.latent_dim,
            g.latent_dim)
    inner_g = int(n_groups * g.expansion_groups)
    inner_c = int(g.latent_dim * g.expansion_dim)
    for i in range(g.depth):
        base = f"gene_encoder.mlp_mixer.{i}"
        ln(f"{base}.0.norm", g.latent_dim)
        sd[f"{base}.0.fn.0.weight"] = rng.randn(
            inner_g, n_groups, 1).astype(np.float32)
        sd[f"{base}.0.fn.0.bias"] = rng.randn(inner_g).astype(np.float32)
        sd[f"{base}.0.fn.3.weight"] = rng.randn(
            n_groups, inner_g, 1).astype(np.float32)
        sd[f"{base}.0.fn.3.bias"] = rng.randn(n_groups).astype(np.float32)
        ln(f"{base}.1.norm", g.latent_dim)
        lin(f"{base}.1.fn.0", g.latent_dim, inner_c)
        lin(f"{base}.1.fn.3", inner_c, g.latent_dim)
    ln(f"gene_encoder.mlp_mixer.{g.depth}", g.latent_dim)
    lin(f"gene_encoder.mlp_mixer.{g.depth + 1}", g.latent_dim,
        cfg.backbone.embed_dim)
    lin("gene_encoder.pathway_compression", n_groups, g.final_groups)

    sd["gene_pe"] = rng.randn(g.final_groups + 1,
                              d).astype(np.float32)
    lin("task_weight.0", a.multi_task, d)
    ln("task_weight.1", d)
    ln("final_norm", d)
    lin("final_project", d, a.output_dim)
    return sd


def test_full_checkpoint_roundtrip():
    cfg = tiny_test_config()
    group_sizes = [5, 3, 7, 2, 5, 4]
    sd = synthetic_adapter_state(cfg, n_groups=6, group_sizes=group_sizes)
    spans = default_spans(cfg.backbone.longnet(),
                          cfg.adapter.interaction_indexes)
    tree = convert_modaltune_state_dict(sd, spans=spans)

    model = ModalTuneModel(cfg, n_gene_groups=6, max_group_len=7)
    rng = np.random.RandomState(0)
    bag = jnp.asarray(rng.randn(1, 32, cfg.backbone.in_chans), jnp.float32)
    coords = jnp.asarray(rng.randint(0, 30, (1, 32, 2)) * 256.0,
                         jnp.float32)
    genes = jnp.asarray(rng.randn(1, 6, 7), jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), bag, coords, genes,
                     task_token=jnp.eye(3)[:1])["params"]

    flat_ref = flatten_params(ref)
    flat_conv = flatten_params(tree)
    missing = set(flat_ref) - set(flat_conv)
    extra = set(flat_conv) - set(flat_ref)
    assert not missing, sorted(missing)[:10]
    # extras allowed: backbone layer_norm / norm (unused by adapter path)
    assert all(k.startswith("backbone/") for k in extra), sorted(extra)[:10]
    for k in flat_ref:
        assert flat_ref[k].shape == flat_conv[k].shape, \
            (k, flat_ref[k].shape, flat_conv[k].shape)

    out = model.apply({"params": jax.tree.map(jnp.asarray, tree)},
                      bag, coords, genes, task_token=jnp.eye(3)[:1])
    assert out.shape == (1, cfg.adapter.output_dim)
    assert np.all(np.isfinite(np.asarray(out)))
