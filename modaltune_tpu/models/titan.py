"""TITAN backbone + ModalTune-TITAN adapter (Flax Linen).

The reference dynamically imports TITAN's ViT from an external HF
snapshot (``titan_adapter.py:29-37``) and adapts it with:
grid scatter of the patch-feature bag (``preprocess_features``,
``titan_adapter.py:295-327``), 2-D ALiBi attention bias + background
mask (``prepare_forward_features``, ``:249-293``), interaction blocks
threaded with ``(attn_bias, bg_mask)``
(``InteractionBlockWithCls_TITAN``, ``adapter_modules.py:526-558``), and
attentional pooling for the image outcome (``:400-403``).

TPU-first deltas:
* the reference **crops** background grid cells at batch size 1
  (``titan_adapter.py:282-291``) — a data-dependent shape. Here the grid
  token list is bucket-padded to a static length and background cells
  are excluded via the attention key mask instead (mathematically the
  same softmax; shapes stay static so every step hits one compiled
  program);
* the grid scatter runs host-side in the data layer
  (:func:`grid_scatter_bag`), so the device graph sees a dense token
  list + grid coords + validity mask;
* ALiBi is evaluated from grid coordinates as one shared (H, N, N) bias
  reused by all 6 blocks.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from ..ops.activations import gelu_exact
from ..configs import GeneEncoderConfig, TitanModalTuneConfig
from ..ops.alibi_flash import alibi_flash_attention
from .adapter import InteractionBlock
from .gene import GeneMixerEncoder
from .layers import DropPath, SelfAttentionLayer, mask_to_bias
from .registry import register_aggregator

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# host-side grid scatter (data layer helper)
# ---------------------------------------------------------------------------


def grid_scatter_bag(features: np.ndarray, coords: np.ndarray,
                     patch_size_lv0: int = 1024,
                     bucket: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Scatter a patch-feature bag onto a 2-D grid and flatten to a
    padded token list.

    Mirrors ``preprocess_features`` (titan_adapter.py:295-327): coords are
    offset to the grid origin, features falling in the same cell are
    summed, background = all-zero cells. Returns
    ``(tokens (N, D), grid_coords (N, 2) float, valid (N,) bool)`` where
    N = bucket (or the grid cell count if bucket is None) and only
    foreground cells are valid.
    """
    features = np.asarray(features, np.float32)
    coords = np.asarray(coords, np.float64)
    g = np.floor_divide(coords - coords.min(axis=0), patch_size_lv0)
    g = g - g.min(axis=0)
    h, w = (int(g[:, 0].max()) + 1, int(g[:, 1].max()) + 1)
    flat_idx = (g[:, 0] * w + g[:, 1]).astype(np.int64)
    grid = np.zeros((h * w, features.shape[1]), np.float32)
    np.add.at(grid, flat_idx, features)
    valid = np.any(grid != 0, axis=1)
    gy, gx = np.divmod(np.arange(h * w), w)
    gcoords = np.stack([gy, gx], axis=1).astype(np.float32)

    # keep only foreground cells first (so buckets truncate background
    # last), then pad to the bucket
    order = np.argsort(~valid, kind="stable")
    grid, gcoords, valid = grid[order], gcoords[order], valid[order]
    n = bucket if bucket is not None else grid.shape[0]
    if grid.shape[0] >= n:
        return grid[:n], gcoords[:n], valid[:n]
    pad = n - grid.shape[0]
    return (np.pad(grid, ((0, pad), (0, 0))),
            np.pad(gcoords, ((0, pad), (0, 0))),
            np.pad(valid, (0, pad)))


def alibi_slopes(num_heads: int) -> np.ndarray:
    """Standard ALiBi head slopes 2^(-8i/n)."""
    return np.array([2.0 ** (-8.0 * (i + 1) / num_heads)
                     for i in range(num_heads)], np.float32)


def alibi_bias(grid_coords: jax.Array, num_heads: int,
               valid: Optional[jax.Array] = None) -> jax.Array:
    """2-D ALiBi: bias[h, i, j] = -slope_h * ||c_i - c_j||_2, with
    invalid keys masked to NEG_INF. grid_coords: (B, N, 2);
    returns (B, H, N+1, N+1) including a cls row/col with zero bias."""
    d = grid_coords[:, :, None, :] - grid_coords[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(d.astype(jnp.float32) ** 2, axis=-1))
    slopes = jnp.asarray(alibi_slopes(num_heads))
    bias = -slopes[None, :, None, None] * dist[:, None, :, :]
    b, n = grid_coords.shape[0], grid_coords.shape[1]
    out = jnp.zeros((b, num_heads, n + 1, n + 1), jnp.float32)
    out = out.at[:, :, 1:, 1:].set(bias)
    if valid is not None:
        keymask = jnp.concatenate(
            [jnp.ones((b, 1), bool), valid], axis=1)          # (B, N+1)
        out = jnp.where(keymask[:, None, None, :], out, NEG_INF)
    return out


# ---------------------------------------------------------------------------
# ViT modules
# ---------------------------------------------------------------------------


class BiasedMHA(nn.Module):
    """timm-style fused-qkv self-attention with ALiBi.

    ``bias`` is either a dense additive (B, H, N, N) tensor (XLA
    fallback) or an ``("alibi", coords3, slopes, key_mask)`` context, in
    which case the bias is computed in-kernel by the fused Pallas ALiBi
    flash kernel (ops/alibi_flash.py) — no (H, N, N) materialization."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        b, n, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]              # (B, H, N, dh)
        if isinstance(bias, tuple) and bias and bias[0] == "alibi":
            _, coords3, slopes, key_mask = bias
            out = alibi_flash_attention(q, k, v, coords3, slopes,
                                        key_mask=key_mask)
        else:
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                preferred_element_type=jnp.float32) * (dh ** -0.5)
            if bias is not None:
                s = s + bias
            p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class TitanBlock(nn.Module):
    """Pre-norm ViT block: x += attn(norm1(x)); x += mlp(norm2(x))."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None, deterministic: bool = True):
        dp = DropPath(self.drop_path, name="drop_path")
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = BiasedMHA(self.dim, self.num_heads, self.qkv_bias,
                      dtype=self.dtype, name="attn")(h, bias)
        x = x + dp(h, deterministic)
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = gelu_exact(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        x = x + dp(h, deterministic)
        return x


class AttentionalPooler(nn.Module):
    """CoCa-style attentional pooling: learned queries cross-attend over
    the token sequence (titan ``forward_attn_pool``,
    titan_adapter.py:400-403). Returns (pooled_first_query, all_queries).
    """

    dim: int
    num_queries: int = 128
    num_heads: int = 12
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, key_mask: Optional[jax.Array] = None):
        b = tokens.shape[0]
        q = self.param("query", nn.initializers.normal(0.02),
                       (self.num_queries, self.dim))
        q = jnp.broadcast_to(q.astype(tokens.dtype),
                             (b, self.num_queries, self.dim))
        h = self.num_heads
        dh = self.dim // h
        tokens_n = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                                name="ln_k")(tokens)
        qh = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q)
        kh = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(tokens_n)
        vh = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(tokens_n)

        def split(t):
            return t.reshape(b, -1, h, dh).transpose(0, 2, 1, 3)

        s = jnp.einsum("bhqd,bhkd->bhqk", split(qh), split(kh),
                       preferred_element_type=jnp.float32) * (dh ** -0.5)
        if key_mask is not None:
            s = s + mask_to_bias(key_mask)[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, split(vh))
        out = out.transpose(0, 2, 1, 3).reshape(b, self.num_queries,
                                                self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)
        out = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                           name="ln_out")(out)
        return out[:, 0], out


class TitanViT(nn.Module):
    """TITAN slide-encoder ViT over grid-scattered patch features."""

    cfg: Any  # TitanConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.pe_fc1 = nn.Dense(c.mlp_patch_embed_dim, dtype=self.dtype,
                               name="patch_embed_fc1")
        self.pe_fc2 = nn.Dense(c.embed_dim, dtype=self.dtype,
                               name="patch_embed_fc2")
        self.cls_token = self.param("cls_token",
                                    nn.initializers.normal(0.02),
                                    (1, 1, c.embed_dim))
        self.norm_pre = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype,
                                     name="norm_pre")
        self.blocks = [TitanBlock(c.embed_dim, c.num_heads, c.mlp_ratio,
                                  c.qkv_bias,
                                  drop_path=c.drop_path_rate,
                                  norm_eps=c.norm_eps, dtype=self.dtype,
                                  name=f"blocks_{i}")
                       for i in range(c.depth)]
        self.norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype,
                                 name="norm")
        self.attn_pool = AttentionalPooler(
            c.embed_dim, c.attn_pooler_queries, c.attn_pooler_heads,
            norm_eps=c.norm_eps, dtype=self.dtype, name="attn_pool")

    def embed(self, tokens, grid_coords, valid):
        """tokens: (B, N, in_dim) grid-cell features; grid_coords:
        (B, N, 2); valid: (B, N) bool. -> (x (B, N+1, D), bias, seq_mask).
        """
        c = self.cfg
        h = self.pe_fc1(tokens)
        h = gelu_exact(h)
        h = self.pe_fc2(h)
        cls = jnp.broadcast_to(self.cls_token.astype(h.dtype),
                               (h.shape[0], 1, c.embed_dim))
        x = jnp.concatenate([cls, h], axis=1)
        x = self.norm_pre(x)
        seq_mask = jnp.concatenate(
            [jnp.ones((x.shape[0], 1), bool), valid], axis=1)
        bias = None
        if c.pos_encode_type == "alibi":
            if pltpu is not None and jax.default_backend() == "tpu":
                # fused Pallas path: pass coords (+cls flag) + slopes
                b = grid_coords.shape[0]
                cls_c = jnp.concatenate(
                    [jnp.zeros((b, 1, 2), jnp.float32),
                     jnp.ones((b, 1, 1), jnp.float32)], axis=-1)
                gc = jnp.concatenate(
                    [grid_coords.astype(jnp.float32),
                     jnp.zeros(grid_coords.shape[:2] + (1,),
                               jnp.float32)], axis=-1)
                coords3 = jnp.concatenate([cls_c, gc], axis=1)
                slopes = jnp.asarray(alibi_slopes(c.num_heads))
                bias = ("alibi", coords3, slopes, seq_mask)
            else:
                bias = alibi_bias(grid_coords, c.num_heads,
                                  valid).astype(jnp.float32)
        x = x * seq_mask[..., None].astype(x.dtype)
        return x, bias, seq_mask

    def run_blocks(self, x, lo: int, hi: int, bias=None,
                   deterministic: bool = True):
        for i in range(lo, hi):
            x = self.blocks[i](x, bias, deterministic)
        return x

    def pool(self, x, seq_mask=None):
        x = self.norm(x)
        pooled, tokens = self.attn_pool(x, key_mask=seq_mask)
        return pooled

    def __call__(self, tokens, grid_coords, valid,
                 deterministic: bool = True):
        x, bias, seq_mask = self.embed(tokens, grid_coords, valid)
        x = self.run_blocks(x, 0, self.cfg.depth, bias, deterministic)
        return self.pool(x, seq_mask)


@register_aggregator("titan_gene_adapter")
@register_aggregator("titan_gene_clinical_adapter")
class TitanModalTuneModel(nn.Module):
    """ModalTune over the TITAN backbone (titan_adapter.py:42-438 and the
    clinical variant :441+). Same modal-token/fusion machinery as the
    GigaPath variant; differs in backbone, bias threading, and the
    attention-pooled image outcome with ``token_agg='cat'``."""

    cfg: TitanModalTuneConfig
    n_gene_groups: int
    max_group_len: int
    dtype: Any = jnp.float32

    def setup(self):
        a = self.cfg.adapter
        d = self.cfg.backbone.embed_dim
        self.backbone = TitanViT(self.cfg.backbone, dtype=self.dtype,
                                 name="backbone")
        gene_cfg = self.cfg.gene
        if gene_cfg.output_dim != d:
            gene_cfg = GeneEncoderConfig(**{**gene_cfg.__dict__,
                                            "output_dim": d})
        self.gene_encoder = GeneMixerEncoder(
            gene_cfg, self.n_gene_groups, self.max_group_len,
            dtype=self.dtype, name="gene_encoder")
        n_int = len(a.interaction_indexes)
        self.interactions = [
            InteractionBlock(
                dim=d, num_heads=a.num_heads, init_values=a.init_values,
                drop_path=a.drop_path_rate, with_cffn=a.with_cffn,
                cffn_ratio=a.cffn_ratio,
                extra_extractor=(i == n_int - 1) and a.use_extra_extractor,
                dtype=self.dtype, name=f"interactions_{i}")
            for i in range(n_int)]
        self.prompt_sa = [None] + [
            (SelfAttentionLayer(d, a.num_heads, with_cffn=a.with_cffn,
                                cffn_ratio=a.cffn_ratio,
                                dropout=a.prompt_dropout, dtype=self.dtype,
                                name=f"prompt_sa_{i}")
             if a.use_prompt_sa else None)
            for i in range(1, n_int)]

        n_modal = gene_cfg.final_groups
        if a.prompt_agg == "cls":
            self.gene_cls = self.param("gene_cls",
                                       nn.initializers.normal(0.02),
                                       (1, 1, d))
            n_modal += 1
        if a.is_multi:
            self.task_dense = nn.Dense(
                d, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.02), name="task_dense")
            self.task_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                          name="task_norm")
            n_modal += 1
        if a.with_clinical:
            self.clinical_fc1 = nn.Dense(
                d // 2, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.02),
                name="clinical_fc1")
            self.clinical_fc2 = nn.Dense(
                d, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.02),
                name="clinical_fc2")
            self.clinical_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                              name="clinical_norm")
            n_modal += 1
        self.n_modal = n_modal
        self.gene_pe = self.param("gene_pe", nn.initializers.normal(0.02),
                                  (n_modal, d))
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")
        self.final_project = nn.Dense(
            a.output_dim, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02), name="final_project")

    def __call__(self, bag, coords, genes, task_token=None, clinical=None,
                 bag_mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """bag: (B, N, in_dim) grid-cell features (see grid_scatter_bag);
        coords: (B, N, 2) *grid* coordinates; bag_mask: (B, N)
        foreground validity."""
        a = self.cfg.adapter
        if bag_mask is None:
            bag_mask = jnp.ones(bag.shape[:2], bool)
        h, bias, seq_mask = self.backbone.embed(bag, coords, bag_mask)

        modal = self.gene_encoder(genes, deterministic)
        bsz = modal.shape[0]
        if a.prompt_agg == "cls":
            cls_tok = jnp.broadcast_to(self.gene_cls.astype(modal.dtype),
                                       (bsz, 1, modal.shape[-1]))
            modal = jnp.concatenate([cls_tok, modal], axis=1)
        if a.is_multi:
            t = self.task_norm(self.task_dense(
                task_token.astype(modal.dtype)))[:, None, :]
            modal = jnp.concatenate([t, modal], axis=1)
        if a.with_clinical:
            ce = self.clinical_fc1(clinical.astype(modal.dtype))
            ce = nn.relu(ce)
            ce = self.clinical_norm(self.clinical_fc2(ce))[:, None, :]
            modal = jnp.concatenate([ce, modal], axis=1)
        gene_pe = self.gene_pe.astype(modal.dtype)

        idx = a.interaction_indexes
        if idx[0][0] != 0:
            h = self.backbone.run_blocks(h, 0, idx[0][0], bias,
                                         deterministic)
        cls, x = h[:, :1], h[:, 1:]
        x_mask = seq_mask[:, 1:]
        for i, block in enumerate(self.interactions):
            lo, hi = idx[i]
            if self.prompt_sa[i] is not None:
                modal = self.prompt_sa[i](modal, query_pos=gene_pe,
                                          deterministic=deterministic)

            def run_span(t, lo=lo, hi=hi):
                return self.backbone.run_blocks(t, lo, hi + 1, bias,
                                                deterministic)

            x, modal, cls = block(x, modal, cls, run_span,
                                  query_pos=gene_pe, x_mask=x_mask,
                                  deterministic=deterministic)

        # image outcome: final norm + attention pool over cls+tokens
        # (titan_adapter.py:400-403)
        h = jnp.concatenate([cls, x], axis=1)
        img = self.backbone.pool(h, seq_mask)[:, None, :]

        off = 0
        clin_out = task_out = None
        if a.with_clinical:
            clin_out = modal[:, off:off + 1]
            off += 1
        if a.is_multi:
            task_out = modal[:, off:off + 1]
            off += 1
        if a.prompt_agg == "cls":
            gene_out = modal[:, off:off + 1]
        else:
            gene_out = modal[:, off:].mean(axis=1, keepdims=True)

        if a.token_agg == "sum":
            outcome = img + gene_out
            if task_out is not None:
                outcome = outcome + task_out
            if clin_out is not None:
                outcome = outcome + clin_out
        elif a.token_agg == "cat":
            parts = [img]
            if task_out is not None:
                parts.append(task_out)
            parts.append(gene_out)
            if clin_out is not None:
                parts.append(clin_out)
            outcome = jnp.concatenate(parts, axis=-1)
        else:
            raise NotImplementedError(a.token_agg)
        outcome = self.final_norm(outcome)
        outcome = self.final_project(outcome)
        return outcome[:, 0]
