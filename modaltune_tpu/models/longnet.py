"""LongNet dilated-attention transformer encoder (Flax Linen).

TPU-first rebuild of the reference's vendored torchscale stack:
``torchscale/architecture/encoder.py`` (pre-norm sub-LN encoder layers)
with ``DilatedAttention`` self-attention
(``torchscale/component/dilated_attention.py``) and the sub-LN
FeedForwardNetwork (``torchscale/component/feedforward_network.py``).
Module / parameter naming mirrors the torch state-dict so weight
conversion from GigaPath's ``slide_encoder.pth`` is a transpose-only
mapping.

Design deltas vs the reference (intentional):
* attention runs the Pallas flash kernel over each dilated branch, with
  padded-token key masking threaded through (bucketed static shapes);
* after every layer padded positions are re-zeroed so garbage cannot
  accumulate through FFNs;
* optional per-layer `jax.checkpoint` (the fairscale
  ``checkpoint_wrapper`` hook at ``LongNet.py:46-49`` becomes XLA remat).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import LongNetConfig
from ..ops import dilated_attention
from .layers import DropPath


class DilatedSelfAttention(nn.Module):
    """q/k/v/out projections around multi-branch dilated attention
    (``dilated_attention.py:146-262``; sub-LN ``inner_attn_ln`` from
    ``multihead_attention.py:50-54``)."""

    cfg: LongNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        c = self.cfg
        d = c.embed_dim
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, l = x.shape[0], x.shape[1]
        split = lambda t: t.reshape(b, l, c.num_heads, c.head_dim)
        out = dilated_attention(
            split(q), split(k), split(v),
            segment_lengths=c.segment_lengths,
            dilated_ratios=c.dilated_ratios,
            mask=mask if c.mask_padding else None)
        out = out.reshape(b, l, d)
        if c.subln:
            out = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                               name="inner_attn_ln")(out)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class FeedForwardNetwork(nn.Module):
    """fc1 -> exact gelu (fp32) -> [sub-LN] -> fc2 -> dropout
    (``feedforward_network.py:105-143``)."""

    cfg: LongNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        x = nn.Dense(c.ffn_dim, dtype=self.dtype, name="fc1")(x)
        # reference computes the activation in fp32: activation_fn(x.float())
        x = jax.nn.gelu(x.astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = nn.Dropout(c.activation_dropout)(x, deterministic=deterministic)
        if c.subln:
            x = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                             name="ffn_layernorm")(x)
        x = nn.Dense(c.embed_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        return x


class LongNetEncoderLayer(nn.Module):
    """Pre-norm encoder layer (``encoder.py:121-175``, alpha=1)."""

    cfg: LongNetConfig
    depth: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        c = self.cfg
        if c.drop_path_rate > 0 and c.num_layers > 1:
            rate = c.drop_path_rate * self.depth / (c.num_layers - 1)
        else:
            rate = 0.0
        drop_path = DropPath(rate, name="drop_path")

        residual = x
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        h = DilatedSelfAttention(c, dtype=self.dtype, name="self_attn")(
            h, mask, deterministic)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        h = drop_path(h, deterministic)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        h = FeedForwardNetwork(c, dtype=self.dtype, name="ffn")(
            h, deterministic)
        h = drop_path(h, deterministic)
        x = residual + h

        if mask is not None and c.mask_padding:
            x = x * mask[..., None].astype(x.dtype)
        return x


class LongNetEncoder(nn.Module):
    """Stack of LongNet layers with split prepare/run API.

    The reference exposes ``prepare_forward`` / ``layer_forward``
    (``encoder.py:342-436``) precisely so the Modal Adapter can interleave
    interaction blocks between layer spans; we keep that contract:
    :meth:`prepare` embeds dropout + padding zeroing, :meth:`run_layers`
    runs a half-open span ``[lo, hi)``, and :meth:`finalize` applies the
    encoder-level LayerNorm used only by the plain backbone path.
    """

    cfg: LongNetConfig
    dtype: Any = jnp.float32

    def setup(self):
        layer_cls = LongNetEncoderLayer
        if self.cfg.remat:
            layer_cls = nn.remat(LongNetEncoderLayer,
                                 static_argnums=(2,))
        self.layers = [layer_cls(self.cfg, depth=i, dtype=self.dtype,
                                 name=f"layers_{i}")
                       for i in range(self.cfg.num_layers)]
        self.embed_dropout = nn.Dropout(self.cfg.dropout)
        if self.cfg.normalize_output and self.cfg.normalize_before:
            self.layer_norm = nn.LayerNorm(epsilon=self.cfg.layernorm_eps,
                                           dtype=self.dtype,
                                           name="layer_norm")
        else:
            self.layer_norm = None

    def prepare(self, x, mask: Optional[jax.Array] = None,
                deterministic: bool = True):
        """embed_scale=1, no layernorm_embedding; dropout then zero padded
        positions (``encoder.py:323-371``)."""
        x = self.embed_dropout(x, deterministic=deterministic)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x

    def run_layers(self, x, lo: int, hi: int,
                   mask: Optional[jax.Array] = None,
                   deterministic: bool = True):
        for i in range(lo, hi):
            x = self.layers[i](x, mask, deterministic)
        return x

    def finalize(self, x):
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return x

    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        x = self.prepare(x, mask, deterministic)
        x = self.run_layers(x, 0, self.cfg.num_layers, mask, deterministic)
        return self.finalize(x)
