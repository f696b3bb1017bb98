"""Shared neural-net building blocks (Flax Linen).

TPU-first re-implementations of the reference's small modules:
stochastic depth (``models/vitadapter/drop_path.py``), alpha dropout
(torch ``nn.AlphaDropout`` used by the gene encoder's SNN blocks,
``models/genomic_utils/gene_encoder.py:167-181``), and a
torch-``nn.MultiheadAttention``-compatible attention layer (separate
q/k/v input dims) whose inner product runs through the Pallas flash
kernel with key masking.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import NEG_INF, flash_attention


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm semantics: scale by 1/keep)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class AlphaDropout(nn.Module):
    """SELU-preserving dropout (torch ``nn.AlphaDropout`` semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        p = self.rate
        alpha_p = -1.7580993408473766  # -scale * alpha of SELU
        a = (1.0 - p) * (1.0 + p * alpha_p ** 2)
        a = a ** -0.5
        b = -a * p * alpha_p
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
        return a * jnp.where(keep, x, alpha_p) + b


def mask_to_bias(mask: Optional[jax.Array]) -> Optional[jax.Array]:
    """(.., L) bool validity mask -> additive fp32 bias (0 / NEG_INF)."""
    if mask is None:
        return None
    return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)


class TorchMHA(nn.Module):
    """torch ``nn.MultiheadAttention``-equivalent attention.

    Supports ``kdim``/``vdim`` differing from ``embed_dim`` (the Modal
    Adapter compresses queries to ``d/4`` while keys/values stay at
    ``d`` — ``adapter_modules.py:36-49,150-164``). Inner attention runs
    through the flash kernel (Pallas on TPU, XLA elsewhere).
    """

    embed_dim: int
    num_heads: int
    kdim: Optional[int] = None
    vdim: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, key_mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        e, h = self.embed_dim, self.num_heads
        assert e % h == 0
        dh = e // h
        xavier = nn.initializers.xavier_uniform()
        dense = lambda name: nn.Dense(e, dtype=self.dtype, name=name,
                                      kernel_init=xavier)
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]

        def split(t, l):
            return (t.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
                    .reshape(b * h, l, dh))

        bias = None
        if key_mask is not None:
            bias = jnp.repeat(mask_to_bias(key_mask), h, axis=0)  # (b*h, lk)
        out, _ = flash_attention(split(q, lq), split(k, lk), split(v, lk),
                                 bias, scale=dh ** -0.5)
        out = (out.reshape(b, h, lq, dh).transpose(0, 2, 1, 3)
               .reshape(b, lq, e))
        return nn.Dense(e, dtype=self.dtype, name="out_proj",
                        kernel_init=xavier)(out)


class CrossAttentionLayer(nn.Module):
    """Pre-norm cross-attention with optional compressed bottleneck.

    Mirrors ``adapter_modules.py:130-245`` (``forward_pre`` path,
    ``normalize_before=True`` everywhere in ModalTune). Note the layer
    *includes* its own residual (``tgt + dropout(...)``); Injector and
    Extractor add a second outer residual on top — reference behavior,
    reproduced faithfully.
    """

    d_model: int
    nheads: int
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 memory_mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        inner = int(self.d_model * self.cffn_ratio) if self.with_cffn \
            else self.d_model
        tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt)
        mem = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_kq")(memory)
        xavier = nn.initializers.xavier_uniform()
        q_in = tgt2 if query_pos is None else tgt2 + query_pos
        if self.with_cffn:
            q_in = nn.Dense(inner, dtype=self.dtype, name="q_proj",
                            kernel_init=xavier)(q_in)
        kv = mem if pos is None else mem + pos
        attn = TorchMHA(inner, self.nheads, dtype=self.dtype,
                        name="multihead_attn")(
            q_in, kv, kv, key_mask=memory_mask, deterministic=deterministic)
        if self.with_cffn:
            attn = nn.Dense(self.d_model, dtype=self.dtype,
                            name="output_proj", kernel_init=xavier)(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        return tgt + attn


class SelfAttentionLayer(nn.Module):
    """Pre-norm self-attention over prompt tokens
    (``adapter_modules.py:18-99``, ``forward_pre``): q/k carry the
    positional embedding, the value does not."""

    d_model: int
    nheads: int
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos=None, deterministic: bool = True):
        inner = int(self.d_model * self.cffn_ratio) if self.with_cffn \
            else self.d_model
        tgt2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt)
        xavier = nn.initializers.xavier_uniform()
        qk = tgt2 if query_pos is None else tgt2 + query_pos
        q_in = qk
        if self.with_cffn:
            q_in = nn.Dense(inner, dtype=self.dtype, name="q_proj",
                            kernel_init=xavier)(q_in)
        attn = TorchMHA(inner, self.nheads, dtype=self.dtype,
                        name="self_attn")(
            q_in, qk, tgt2, deterministic=deterministic)
        if self.with_cffn:
            attn = nn.Dense(self.d_model, dtype=self.dtype,
                            name="output_proj", kernel_init=xavier)(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        return tgt + attn


class FFNLayer(nn.Module):
    """Pre-norm FFN returning the branch only (no residual inside) —
    ``adapter_modules.py:248-293`` ``forward_pre``."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, deterministic: bool = True):
        xavier = nn.initializers.xavier_uniform()
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(tgt)
        x = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     name="linear1", kernel_init=xavier)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="linear2",
                     kernel_init=xavier)(x)
        return x
