"""Full-geometry converter dry-runs (VERDICT r3 #6).

The fast converter tests exercise depth-3 / tiny models; a
span-stacking or key-naming slip that only appears at the production
geometry (12-layer/768-d GigaPath spans (0,4),(4,8),(8,12); 6-layer
TITAN with the 128-query pooler) would otherwise surface only with the
real, unavailable checkpoints. Here a state dict with the EXACT
reference key layout (``slide_encoder.pth['model']`` naming,
``gigapath/slide_encoder.py:292-322``; TITAN ``vision_encoder.*``
aliases, ``titan_adapter.py:234-247``) is synthesized at full size,
converted, and checked for zero missing/unexpected keys against the
real models' param trees — plus full forward value parity against the
actual reference LongNetViT for GigaPath."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_gigapath import GIGAPATH_SPANS, convert_backbone_spanned
from convert_titan import convert_titan_state_dict
from modaltune_tpu.configs import (TitanConfig, gigapath_modaltune_config)
from modaltune_tpu.models.slide_encoder import LongNetViT
from modaltune_tpu.models.titan import TitanViT
from modaltune_tpu.utils.params_io import flatten_params

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_gigapath_depth12_convert_keys_and_forward_parity():
    """Real 12-layer/768-d geometry: the reference model's own
    ``state_dict()`` (== the on-disk ``slide_encoder.pth['model']`` key
    layout) converts into exactly the flax tree, spans stack correctly
    at depth 12, and the full forward agrees."""
    from torch_ref import load_reference
    env = load_reference()

    IN_CHANS, EMBED, DEPTH, GRID, BAG = 64, 768, 12, 64, 2047
    torch.manual_seed(0)
    ref = env.slide.LongNetViT(in_chans=IN_CHANS, embed_dim=EMBED,
                               depth=DEPTH, slide_ngrids=GRID,
                               global_pool=False).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    # sanity: the synthetic dict uses the reference's real key naming
    assert "encoder.layers.11.self_attn.q_proj.weight" in sd
    assert "encoder.layers.11.ffn.ffn_layernorm.weight" in sd

    tree = convert_backbone_spanned(sd, spans=GIGAPATH_SPANS)

    cfg = gigapath_modaltune_config().backbone
    import dataclasses
    cfg = dataclasses.replace(cfg, in_chans=IN_CHANS, dropout=0.0,
                              drop_path_rate=0.0)
    model = LongNetViT(cfg, spans=GIGAPATH_SPANS)
    rng = np.random.RandomState(0)
    x = rng.randn(1, BAG, IN_CHANS).astype(np.float32)
    coords = (rng.randint(0, GRID, (1, BAG, 2)) * 256).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), x[:, :64],
                      coords[:, :64])["params"]

    fi, fc = flatten_params(init), flatten_params(tree)
    missing = sorted(set(fi) - set(fc))
    unexpected = sorted(set(fc) - set(fi))
    assert not missing and not unexpected, (missing[:8], unexpected[:8])
    for k in fi:
        assert fi[k].shape == fc[k].shape, (k, fi[k].shape, fc[k].shape)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(coords))[0]
    got = model.apply({"params": jax.tree.map(jnp.asarray, tree)}, x,
                      coords, deterministic=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), want.numpy(),
                               atol=3e-3, rtol=3e-3)


def _titan_full_state_dict(seed=0):
    """vision_encoder.* layout at TITAN's real geometry (768-d, 6
    layers, 12 heads, MLP patch embed, 128-query CoCa pooler)."""
    c = TitanConfig()
    d, mlp = c.embed_dim, int(c.embed_dim * c.mlp_ratio)
    rng = np.random.RandomState(seed)
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, dim):
        sd[f"{name}.weight"] = rng.rand(dim).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(dim).astype(np.float32) * 0.1

    sd["cls_token"] = rng.randn(1, 1, d).astype(np.float32)
    lin("patch_embed.fc1", c.in_dim, c.mlp_patch_embed_dim)
    lin("patch_embed.fc2", c.mlp_patch_embed_dim, d)
    ln("norm_pre", d)
    for i in range(c.depth):
        b = f"blocks.{i}"
        ln(f"{b}.norm1", d)
        lin(f"{b}.attn.qkv", d, 3 * d)
        lin(f"{b}.attn.proj", d, d)
        ln(f"{b}.norm2", d)
        lin(f"{b}.mlp.fc1", d, mlp)
        lin(f"{b}.mlp.fc2", mlp, d)
    ln("norm", d)
    sd["attn_pool.latent"] = rng.randn(
        c.attn_pooler_queries, d).astype(np.float32)
    ln("attn_pool.ln_k", d)
    lin("attn_pool.q", d, d)
    lin("attn_pool.k", d, d)
    lin("attn_pool.v", d, d)
    lin("attn_pool.proj", d, d)
    ln("attn_pool.ln_out", d)
    return sd


def test_titan_full_geometry_convert_keys():
    tree = convert_titan_state_dict(_titan_full_state_dict())
    model = TitanViT(TitanConfig())
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 36, TitanConfig().in_dim)),
                      jnp.zeros((1, 36, 2)),
                      jnp.ones((1, 36), bool))["params"]
    fi, fc = flatten_params(init), flatten_params(tree)
    missing = sorted(set(fi) - set(fc))
    unexpected = sorted(set(fc) - set(fi))
    assert not missing and not unexpected, (missing[:8], unexpected[:8])
    for k in fi:
        assert fi[k].shape == fc[k].shape, (k, fi[k].shape, fc[k].shape)
