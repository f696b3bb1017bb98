"""LongNetViT slide encoder (frozen Prov-GigaPath backbone), Flax Linen.

Rebuild of ``gigapath/slide_encoder.py:37-290``. The key TPU-first
change: the reference materializes a non-persistent ``(1000^2+1, 768)``
fp32 positional-embedding buffer (~3 GB) and gathers rows per token
(``slide_encoder.py:115-120,146-150,232``). Here the 2-D sin-cos
embedding is computed **on the fly** from the tile coordinates — a few
transcendentals per token, no HBM buffer, no gather — producing
bit-identical values to ``pos_embed.get_2d_sincos_pos_embed`` for
in-grid coordinates.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import LongNetConfig, SlideEncoderConfig
from .longnet import LongNetEncoder, default_spans


def sincos_1d(pos: jax.Array, dim: int) -> jax.Array:
    """MAE-style 1-D sin-cos embedding: ``[sin(pos*w), cos(pos*w)]`` with
    ``w_k = 10000^(-k/(dim/2))`` — matches ``pos_embed.py:63-81``."""
    assert dim % 2 == 0
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / (10000.0 ** omega)
    out = pos[..., None].astype(jnp.float32) * omega
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def coords_pos_embed(coords: jax.Array, embed_dim: int,
                     tile_size: int = 256) -> jax.Array:
    """2-D sin-cos positional embedding evaluated at tile coordinates.

    coords: ``(..., 2)`` pixel coordinates. The reference's buffer row for
    grid cell ``(i, j) = floor(coords/tile)`` stores
    ``[sincos(j), sincos(i)]`` (meshgrid with "w goes first",
    ``pos_embed.py:40-48``) and is indexed via
    ``pos = i*ngrids + j`` (``slide_encoder.py:198-211``); evaluating the
    closed form at ``(i, j)`` reproduces it exactly.
    """
    g = jnp.floor(coords.astype(jnp.float32) / float(tile_size))
    half = embed_dim // 2
    return jnp.concatenate([sincos_1d(g[..., 1], half),
                            sincos_1d(g[..., 0], half)], axis=-1)


class PatchEmbed(nn.Module):
    """Tile-feature embedding: Linear in_chans -> embed_dim
    (``slide_encoder.py:37-56``)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)


class LongNetViT(nn.Module):
    """Frozen slide-level backbone.

    Exposes the same split API the Modal Adapter needs:
    ``embed`` (patch embed + pos + cls + encoder.prepare) and
    ``run_layers`` (a span of LongNet layers), plus a plain ``__call__``
    reproducing ``slide_encoder.py:213-290`` for backbone-only use.
    """

    cfg: SlideEncoderConfig
    longnet: Optional[LongNetConfig] = None
    spans: Optional[tuple] = None   # layer spans (see longnet.default_spans)
    dtype: Any = jnp.float32

    @property
    def _longnet_cfg(self) -> LongNetConfig:
        return self.longnet if self.longnet is not None else \
            self.cfg.longnet()

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.embed_dim, dtype=self.dtype,
                                      name="patch_embed")
        self.cls_token = self.param(
            "cls_token",
            nn.initializers.normal(stddev=0.02),  # slide_encoder.py:157
            (1, 1, c.embed_dim))
        self.encoder = LongNetEncoder(self._longnet_cfg,
                                      spans=self.spans, dtype=self.dtype,
                                      name="encoder")
        self.norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype,
                                 name="norm")

    def embed(self, x, coords, mask: Optional[jax.Array] = None,
              deterministic: bool = True):
        """-> (tokens (B, 1+L, D), seq_mask (B, 1+L) or None).

        Patch embed + on-the-fly sincos pos + cls prepend (cls pos row is
        the zero vector — ``pos_embed.py:47-48``) + encoder prepare
        (dropout, padding zeroing).
        """
        c = self.cfg
        h = self.patch_embed(x)
        pe = coords_pos_embed(coords, c.embed_dim, c.tile_size)
        h = h + pe.astype(h.dtype)
        cls = jnp.broadcast_to(self.cls_token.astype(h.dtype),
                               (h.shape[0], 1, c.embed_dim))
        h = jnp.concatenate([cls, h], axis=1)
        seq_mask = None
        if mask is not None:
            ones = jnp.ones((h.shape[0], 1), mask.dtype)
            seq_mask = jnp.concatenate([ones, mask], axis=1)
        h = self.encoder.prepare(h, seq_mask, deterministic)
        return h, seq_mask

    def run_layers(self, h, lo: int, hi: int,
                   seq_mask: Optional[jax.Array] = None,
                   deterministic: bool = True):
        return self.encoder.run_layers(h, lo, hi, seq_mask, deterministic)

    def pool(self, h, seq_mask: Optional[jax.Array] = None):
        """Output head of the plain backbone (``slide_encoder.py:277-285``):
        encoder LayerNorm, then cls token (or masked global average)."""
        h = self.encoder.finalize(h)
        if self.cfg.global_pool:
            tokens = h[:, 1:]
            if seq_mask is not None:
                m = seq_mask[:, 1:, None].astype(h.dtype)
                pooled = (tokens * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            else:
                pooled = tokens.mean(1)
            return self.norm(pooled)
        return self.norm(h)[:, 0]

    def __call__(self, x, coords, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        h, seq_mask = self.embed(x, coords, mask, deterministic)
        for lo, hi in self.encoder.span_bounds:
            h = self.run_layers(h, lo, hi, seq_mask, deterministic)
        return self.pool(h, seq_mask)
