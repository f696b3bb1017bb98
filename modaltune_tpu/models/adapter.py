"""Modal Adapter: Injector / Extractor interaction blocks (Flax Linen).

Rebuild of ``models/vitadapter/adapter_modules.py:296-523``. The block
structure — inject modal tokens into the frozen image stream, run a span
of frozen LongNet layers, extract back into the modal tokens — is
preserved exactly, including the reference's double-residual behavior
(the inner CrossAttentionLayer already returns ``tgt + attn`` and the
Injector/Extractor add ``query + ...`` on top; gamma init 0 keeps the
injector an identity at init).

TPU addition: the extractor cross-attends modal queries over the
(bucket-padded) image tokens, so the image validity mask is threaded in
as a key mask — the reference never pads and has no equivalent.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import CrossAttentionLayer, DropPath, FFNLayer


class Injector(nn.Module):
    """image tokens += gamma * CrossAttn(q=image, kv=modal)
    (``adapter_modules.py:338-369``)."""

    dim: int
    num_heads: int
    init_values: float = 0.0
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, feat, pos=None, deterministic: bool = True):
        attn = CrossAttentionLayer(self.dim, self.num_heads,
                                   with_cffn=self.with_cffn,
                                   cffn_ratio=self.cffn_ratio,
                                   dtype=self.dtype, name="attn")(
            query, feat, pos=pos, query_pos=None,
            deterministic=deterministic)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.init_values),
                           (self.dim,))
        return query + gamma.astype(query.dtype) * attn


class Extractor(nn.Module):
    """modal tokens <- CrossAttn(q=modal(+pe), kv=image) + FFN
    (``adapter_modules.py:296-335``)."""

    dim: int
    num_heads: int
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, feat, pos=None,
                 feat_mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        attn = CrossAttentionLayer(self.dim, self.num_heads,
                                   with_cffn=self.with_cffn,
                                   cffn_ratio=self.cffn_ratio,
                                   dtype=self.dtype, name="attn")(
            query, feat, pos=None, query_pos=pos, memory_mask=feat_mask,
            deterministic=deterministic)
        query = query + attn
        if self.with_cffn:
            ffn = FFNLayer(self.dim, int(self.dim * self.cffn_ratio),
                           self.drop, dtype=self.dtype, name="ffn")(
                query, deterministic=deterministic)
            query = query + DropPath(self.drop_path, name="drop_path")(
                ffn, deterministic)
        return query


class InteractionBlock(nn.Module):
    """Inject -> frozen LongNet span -> extract (+2 extra extractors on
    the last block) — ``InteractionBlockWithCls_LongNetViT``
    (``adapter_modules.py:459-523``). The frozen span itself is run by
    the caller via a callback so this module owns only adapter params.
    """

    dim: int
    num_heads: int
    init_values: float = 0.0
    drop_path: float = 0.0
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    extra_extractor: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, modal, cls, run_span, query_pos=None,
                 x_mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """x: (B, L, D) patch tokens (no cls); modal: (B, M, D);
        cls: (B, 1, D); run_span: callable tokens->tokens running the
        frozen layer span on the cls-prefixed sequence."""
        x = Injector(self.dim, self.num_heads, self.init_values,
                     self.with_cffn, self.cffn_ratio, dtype=self.dtype,
                     name="injector")(x, modal, pos=query_pos,
                                      deterministic=deterministic)
        h = jnp.concatenate([cls, x], axis=1)
        h = run_span(h)
        cls, x = h[:, :1], h[:, 1:]
        modal = Extractor(self.dim, self.num_heads, self.with_cffn,
                          self.cffn_ratio, drop_path=self.drop_path,
                          dtype=self.dtype, name="extractor")(
            modal, x, pos=query_pos, feat_mask=x_mask,
            deterministic=deterministic)
        if self.extra_extractor:
            for i in range(2):
                modal = Extractor(self.dim, self.num_heads, self.with_cffn,
                                  self.cffn_ratio, drop_path=self.drop_path,
                                  dtype=self.dtype,
                                  name=f"extra_extractor_{i}")(
                    modal, x, pos=query_pos, feat_mask=x_mask,
                    deterministic=deterministic)
        return x, modal, cls
