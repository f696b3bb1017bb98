"""TITAN safetensors converter: key mapping + value parity.

The real snapshot isn't available in this environment
(PARITY.md delta #4), so the converter is validated the way VERDICT.md
prescribes: a synthetic checkpoint in the documented vision_encoder key
layout is pushed through a minimal torch re-implementation with the
snapshot's semantics (timm pre-norm ViT + CoCa attentional pooler) and
through ``convert_titan_state_dict`` + the flax ``TitanViT``; forward
values must agree.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from convert_titan import convert_titan_state_dict  # noqa: E402
from modaltune_tpu.configs import TitanConfig  # noqa: E402
from modaltune_tpu.models.titan import TitanViT  # noqa: E402

D, DEPTH, HEADS, IN_DIM, NQ = 96, 2, 4, 48, 8


class RefBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.attn_qkv = nn.Linear(D, 3 * D)
        self.attn_proj = nn.Linear(D, D)
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.mlp_fc1 = nn.Linear(D, 4 * D)
        self.mlp_fc2 = nn.Linear(4 * D, D)

    def forward(self, x):
        b, n, _ = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(b, n, 3, HEADS, D // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        s = (q @ k.transpose(-2, -1)) * (D // HEADS) ** -0.5
        o = (s.softmax(-1) @ v).transpose(1, 2).reshape(b, n, D)
        x = x + self.attn_proj(o)
        h = self.norm2(x)
        x = x + self.mlp_fc2(nn.functional.gelu(self.mlp_fc1(h)))
        return x


class RefViT(nn.Module):
    """Snapshot-semantics VisionTransformer (no pos-enc for this test:
    pos_encode_type='none' isolates the weight mapping)."""

    def __init__(self):
        super().__init__()
        self.pe1 = nn.Linear(IN_DIM, D)
        self.pe2 = nn.Linear(D, D)
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.norm_pre = nn.LayerNorm(D, eps=1e-6)
        self.blocks = nn.ModuleList([RefBlock() for _ in range(DEPTH)])
        self.norm = nn.LayerNorm(D, eps=1e-6)
        self.pool_query = nn.Parameter(torch.randn(NQ, D) * 0.02)
        self.pool_ln_k = nn.LayerNorm(D, eps=1e-6)
        self.pool_q = nn.Linear(D, D)
        self.pool_k = nn.Linear(D, D)
        self.pool_v = nn.Linear(D, D)
        self.pool_proj = nn.Linear(D, D)
        self.pool_ln_out = nn.LayerNorm(D, eps=1e-6)

    def forward(self, tokens):
        b = tokens.shape[0]
        h = self.pe2(nn.functional.gelu(self.pe1(tokens)))
        x = torch.cat([self.cls_token.expand(b, -1, -1), h], 1)
        x = self.norm_pre(x)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        kx = self.pool_ln_k(x)
        q = self.pool_q(self.pool_query.expand(b, -1, -1))
        k = self.pool_k(kx)
        v = self.pool_v(kx)
        dh = D // HEADS

        def split(t):
            return t.reshape(b, -1, HEADS, dh).transpose(1, 2)

        s = (split(q) @ split(k).transpose(-2, -1)) * dh ** -0.5
        o = (s.softmax(-1) @ split(v)).transpose(1, 2).reshape(b, NQ, D)
        o = self.pool_ln_out(self.pool_proj(o))
        return o[:, 0]

    def titan_state_dict(self):
        """Rename to the documented vision_encoder layout."""
        sd = self.state_dict()
        out = {}
        ren = {
            "pe1": "patch_embed.fc1", "pe2": "patch_embed.fc2",
            "pool_query": "attn_pool.latent",
            "pool_ln_k": "attn_pool.ln_k", "pool_q": "attn_pool.q",
            "pool_k": "attn_pool.k", "pool_v": "attn_pool.v",
            "pool_proj": "attn_pool.proj",
            "pool_ln_out": "attn_pool.ln_out",
        }
        for k, val in sd.items():
            nk = k
            for a, bnm in ren.items():
                if k == a or k.startswith(a + "."):
                    nk = k.replace(a, bnm, 1)
                    break
            nk = nk.replace(".attn_qkv", ".attn.qkv")
            nk = nk.replace(".attn_proj", ".attn.proj")
            nk = nk.replace(".mlp_fc1", ".mlp.fc1")
            nk = nk.replace(".mlp_fc2", ".mlp.fc2")
            out[nk] = val.detach().numpy()
        return out


def test_titan_converter_value_parity():
    torch.manual_seed(0)
    ref = RefViT().eval()
    sd = ref.titan_state_dict()
    tree = convert_titan_state_dict(sd)

    cfg = TitanConfig(in_dim=IN_DIM, embed_dim=D, depth=DEPTH,
                      num_heads=HEADS, mlp_patch_embed_dim=D,
                      attn_pooler_queries=NQ,
                      attn_pooler_heads=HEADS, pos_encode_type="none")
    model = TitanViT(cfg)

    rng = np.random.RandomState(0)
    tokens = rng.randn(2, 10, IN_DIM).astype(np.float32)
    coords = np.tile(np.stack(np.meshgrid(np.arange(5), np.arange(2)),
                              -1).reshape(1, 10, 2), (2, 1, 1))
    valid = np.ones((2, 10), bool)

    with torch.no_grad():
        want = ref(torch.from_numpy(tokens)).numpy()
    got = model.apply({"params": jax.tree.map(jnp.asarray, tree)},
                      jnp.asarray(tokens), jnp.asarray(coords),
                      jnp.asarray(valid), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                               rtol=2e-5)


def test_titan_converter_covers_model_tree():
    """Every converted key exists in the model's init tree with the
    right shape (no silent drops)."""
    torch.manual_seed(1)
    sd = RefViT().titan_state_dict()
    tree = convert_titan_state_dict(sd)
    cfg = TitanConfig(in_dim=IN_DIM, embed_dim=D, depth=DEPTH,
                      num_heads=HEADS, mlp_patch_embed_dim=D,
                      attn_pooler_queries=NQ,
                      attn_pooler_heads=HEADS, pos_encode_type="none")
    model = TitanViT(cfg)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, IN_DIM)),
                      jnp.zeros((1, 4, 2)),
                      jnp.ones((1, 4), bool))["params"]
    from modaltune_tpu.utils.params_io import flatten_params
    fi, fc = flatten_params(init), flatten_params(tree)
    assert set(fi) == set(fc), (sorted(set(fi) - set(fc))[:5],
                                sorted(set(fc) - set(fi))[:5])
    for k in fi:
        assert fi[k].shape == fc[k].shape, (k, fi[k].shape, fc[k].shape)
