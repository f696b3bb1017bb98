"""LongNet dilated-attention transformer encoder (Flax Linen).

TPU-first rebuild of the reference's vendored torchscale stack:
``torchscale/architecture/encoder.py`` (pre-norm sub-LN encoder layers)
with ``DilatedAttention`` self-attention
(``torchscale/component/dilated_attention.py``) and the sub-LN
FeedForwardNetwork (``torchscale/component/feedforward_network.py``).

Design deltas vs the reference (intentional):
* attention runs the Pallas flash kernel over each dilated branch, with
  padded-token key masking threaded through (bucketed static shapes);
* after every layer padded positions are re-zeroed so garbage cannot
  accumulate through FFNs;
* per-layer ``jax.checkpoint`` (the fairscale ``checkpoint_wrapper`` hook
  at ``LongNet.py:46-49`` becomes XLA remat);
* layers are grouped into **spans** (the intervals between Modal-Adapter
  interaction points, e.g. ``[0:4), [4:8), [8:12)``) and each span runs
  as ``nn.scan`` over stacked parameters — XLA compiles ONE layer body
  per span instead of 12 unrolled layers, cutting full-model compile
  time by an order of magnitude with identical math. The reference's
  ``encoder.layers[lo:hi]`` slicing (exploited by the adapter at
  ``longvit_adapter.py:294-307``) maps to span-aligned ``run_layers``.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.activations import gelu_exact
from ..ops.gelu_ln import gelu_ln, gelu_ln_eligible
from ..configs import LongNetConfig
# Note: ops.dilated_fast (head-major layout) wins ~10% on forward but its
# strided-scatter backward loses more than that; the reference-layout
# implementation is net faster for training on current XLA/Mosaic.
from ..ops import dilated_attention
from ..ops.dilated_fused import (comb, fused_dilated_attention,
                                 fused_eligible, uncomb)
from ..ops.dilated_mega import mega_dilated_attention, mega_eligible
from ..ops.dilated_sp import sp_island_attention
from ..ops.flash_attention import get_flash_mode


def _interpret_forced() -> bool:
    """Test hook: run the Pallas paths in interpret mode off-TPU so the
    comb-resident wiring is exercised on the CPU suite."""
    return os.environ.get("MODALTUNE_PALLAS_INTERPRET", "") not in ("", "0")


def span_comb_R(c: LongNetConfig, seq_len: int,
                dtype: Any = None) -> Optional[int]:
    """Max dilation ratio R if the encoder should run this sequence
    length span-resident in the mega kernel's comb_R token order
    (hoisting every per-layer comb/uncomb relayout out of the layer
    loop — every op between attentions is per-token, so the stream can
    stay permuted across a whole span); None = natural order.
    ``dtype``: attention operand dtype for the VMEM-fit check (fp32
    doubles the kernel's windows); None assumes bf16."""
    if (c.seq_axes is not None or c.lora_adapter
            or not c.fused_attention
            or not getattr(c, "mega_attention", True)):
        return None
    if get_flash_mode() == "xla":
        return None
    if jax.default_backend() != "tpu" and not _interpret_forced():
        return None
    isz = 2 if dtype is None else jnp.dtype(dtype).itemsize
    if not mega_eligible(seq_len, c.num_heads, c.head_dim,
                         c.segment_lengths, c.dilated_ratios,
                         itemsize=isz):
        return None
    return max(int(r) for r in c.dilated_ratios)


class DilatedSelfAttention(nn.Module):
    """q/k/v/out projections around multi-branch dilated attention
    (``dilated_attention.py:146-262``; sub-LN ``inner_attn_ln`` from
    ``multihead_attention.py:50-54``)."""

    cfg: LongNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 pre_combed: bool = False):
        c = self.cfg
        d = c.embed_dim
        q = checkpoint_name(nn.Dense(d, dtype=self.dtype,
                                     name="q_proj")(x), "attn_qkv")
        k = checkpoint_name(nn.Dense(d, dtype=self.dtype,
                                     name="k_proj")(x), "attn_qkv")
        v = checkpoint_name(nn.Dense(d, dtype=self.dtype,
                                     name="v_proj")(x), "attn_qkv")
        b, l = x.shape[0], x.shape[1]
        split = lambda t: t.reshape(b, l, c.num_heads, c.head_dim)
        out = None
        if pre_combed:
            # span-resident comb layout (see span_comb_R): tokens and
            # mask arrive permuted, output stays permuted
            out = mega_dilated_attention(
                split(q), split(k), split(v),
                segment_lengths=c.segment_lengths,
                dilated_ratios=c.dilated_ratios,
                mask=mask if c.mask_padding else None,
                interpret=_interpret_forced(),
                pre_combed=True)
        elif c.seq_axes is not None and c.fused_attention and \
                get_flash_mode() != "xla":
            out = sp_island_attention(
                split(q), split(k), split(v),
                mask if c.mask_padding else None,
                segment_lengths=c.segment_lengths,
                dilated_ratios=c.dilated_ratios,
                batch_axis=c.seq_axes[0], seq_axis=c.seq_axes[1])
        if out is None:
            pallas_ok = (c.fused_attention and get_flash_mode() != "xla"
                         and jax.default_backend() == "tpu")
            if pallas_ok and c.mega_attention and mega_eligible(
                    l, c.num_heads, c.head_dim, c.segment_lengths,
                    c.dilated_ratios,
                    itemsize=jnp.dtype(self.dtype).itemsize):
                attn = mega_dilated_attention
            elif pallas_ok and fused_eligible(l, c.num_heads,
                                              c.head_dim,
                                              c.segment_lengths,
                                              c.dilated_ratios):
                attn = fused_dilated_attention
            else:
                attn = functools.partial(dilated_attention,
                                         use_pallas=None)
            out = attn(
                split(q), split(k), split(v),
                segment_lengths=c.segment_lengths,
                dilated_ratios=c.dilated_ratios,
                mask=mask if c.mask_padding else None)
        out = out.reshape(b, l, d)
        if c.subln:
            out = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                               name="inner_attn_ln")(out)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class _LnScaleBias(nn.Module):
    """LayerNorm affine params only (same tree/init as ``nn.LayerNorm``:
    ``{scale: ones, bias: zeros}``) for the fused gelu+LN kernel path."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class FeedForwardNetwork(nn.Module):
    """fc1 -> exact gelu (fp32) -> [sub-LN] -> fc2 -> dropout
    (``feedforward_network.py:105-143``). A fused Pallas gelu -> sub-LN
    kernel exists (``ops/gelu_ln.py``) but is OFF by default: the
    round-4 end-to-end A/B (``tools/sweep_step.py``, one process,
    bench geometry) measured it 554.4 -> 569.8 ms/step — XLA's own
    fusion of this chain already wins; the extra kernel launch plus
    backward erf recompute loses more than the saved HBM passes. Set
    ``MODALTUNE_FUSED_GELU_LN=1`` to re-enable for sweeps."""

    cfg: LongNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        x = nn.Dense(c.ffn_dim, dtype=self.dtype, name="fc1")(x)
        x = checkpoint_name(x, "ffn_fc1")
        fused = (os.environ.get("MODALTUNE_FUSED_GELU_LN", "0") == "1"
                 and c.subln
                 and (c.activation_dropout == 0.0 or deterministic)
                 and get_flash_mode() != "xla"
                 and (jax.default_backend() == "tpu"
                      or _interpret_forced())
                 and gelu_ln_eligible(rows, c.ffn_dim))
        if fused:
            s, b = _LnScaleBias(c.ffn_dim, name="ffn_layernorm")()
            x = gelu_ln(x, s, b, eps=c.layernorm_eps,
                        interpret=_interpret_forced() or None)
        else:
            # reference computes the activation in fp32:
            # activation_fn(x.float())
            x = gelu_exact(x)
            x = nn.Dropout(c.activation_dropout)(
                x, deterministic=deterministic)
            if c.subln:
                x = nn.LayerNorm(epsilon=c.layernorm_eps,
                                 dtype=self.dtype,
                                 name="ffn_layernorm")(x)
        x = nn.Dense(c.embed_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        return x


def _traced_drop_path(x, rate, rng, deterministic: bool):
    """timm stochastic depth with a *traced* per-layer rate (needed under
    scan); rate 0 reduces to identity."""
    if deterministic:
        return x
    keep = 1.0 - rate.astype(jnp.float32)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    # keep the scan carry dtype stable (e.g. bf16 compute)
    return jnp.where(mask, x / keep.astype(x.dtype),
                     jnp.zeros((), x.dtype))


class ScannedLongNetLayer(nn.Module):
    """Pre-norm encoder layer (``encoder.py:121-175``, alpha=1), written
    as an ``nn.scan`` body: carry = tokens, scanned input = the layer's
    drop-path rate."""

    cfg: LongNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rate, mask, deterministic: bool,
                 context=None, pre_combed: bool = False):
        c = self.cfg
        residual = x
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        if c.lora_adapter:
            # per-modality LoRA encoder variant (LongNet.py:85-177):
            # gene/task pooled context vectors come from the caller,
            # defaulting to zeros (= plain dilated attention at init,
            # since LoRA B matrices start at zero)
            from .extras import LoraDilatedSelfAttention
            if context is None:
                z = jnp.zeros((x.shape[0], 1, c.embed_dim), x.dtype)
                context = (z, z)
            h = LoraDilatedSelfAttention(
                c, lora_alpha=c.lora_alpha, img_rank=c.img_lora_dim,
                mm_rank=c.mm_lora_dim, lora_dropout=c.lora_dropout,
                dtype=self.dtype, name="self_attn")(
                h, context[0], context[1], mask, deterministic)
        else:
            h = DilatedSelfAttention(c, dtype=self.dtype,
                                     name="self_attn")(
                h, mask, deterministic, pre_combed)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        if not deterministic and c.drop_path_rate > 0:
            h = _traced_drop_path(h, rate, self.make_rng("dropout"),
                                  deterministic)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        h = FeedForwardNetwork(c, dtype=self.dtype, name="ffn")(
            h, deterministic)
        if not deterministic and c.drop_path_rate > 0:
            h = _traced_drop_path(h, rate, self.make_rng("dropout"),
                                  deterministic)
        x = residual + h

        if mask is not None and c.mask_padding:
            x = x * mask[..., None].astype(x.dtype)
        return x, None


def remat_policy(name: str):
    """Rematerialization policy by name.

    ``"flash"`` saves the checkpoint_name-tagged flash-attention kernel
    outputs (``flash_out``/``flash_lse`` — tagged inside the kernels'
    custom-VJP forwards in ops/) so the backward pass reads them back
    instead of re-running every forward kernel; everything else (layer
    norms, projections, FFN activations) is still recomputed. ``"full"``
    (or ``"none"``) recomputes everything — minimum memory.
    """
    if name in ("full", "none", ""):
        return None
    if name == "flash":
        return jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse", "dilated_out", "dilated_lse",
            "dilated_stats")
    if name == "flash_ffn":
        # additionally keep the fc1 pre-activation and the q/k/v
        # projections (~3.6 GB at the 10k-patch bench geometry): the
        # backward skips re-running those matmuls. Full no-remat OOMs
        # (31.7 GB measured) because the adapter's dense interaction
        # maps get saved too — this list is the HBM-affordable middle.
        return jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse", "dilated_out", "dilated_lse",
            "dilated_stats", "ffn_fc1", "attn_qkv")
    raise ValueError(f"unknown remat policy {name!r}")


# Back-compat alias for direct single-layer use in tests/tools.
class LongNetEncoderLayer(nn.Module):
    cfg: LongNetConfig
    depth: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        c = self.cfg
        if c.drop_path_rate > 0 and c.num_layers > 1:
            rate = c.drop_path_rate * self.depth / (c.num_layers - 1)
        else:
            rate = 0.0
        x, _ = ScannedLongNetLayer(c, dtype=self.dtype, name="layer")(
            x, jnp.float32(rate), mask, deterministic, None)
        return x


def default_spans(cfg: LongNetConfig,
                  interaction_indexes=None) -> Tuple[Tuple[int, int], ...]:
    """Layer spans: one per adapter interaction (plus a pre-span), or a
    single span covering the whole encoder."""
    if not interaction_indexes:
        return ((0, cfg.num_layers),)
    spans = []
    first = interaction_indexes[0][0]
    if first != 0:
        spans.append((0, first))
    for lo, hi in interaction_indexes:
        spans.append((int(lo), int(hi) + 1))
    return tuple(spans)


class LongNetEncoder(nn.Module):
    """Span-scanned LongNet encoder with the reference's split
    prepare/run API (``encoder.py:342-436``): :meth:`prepare` embeds
    dropout + padding zeroing, :meth:`run_layers` runs one span
    ``[lo, hi)``, :meth:`finalize` applies the encoder-level LayerNorm
    used only by the plain backbone path."""

    cfg: LongNetConfig
    spans: Optional[Tuple[Tuple[int, int], ...]] = None
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        spans = self.spans if self.spans else ((0, c.num_layers),)
        self._span_bounds = tuple((int(a), int(b)) for a, b in spans)
        assert self._span_bounds[0][0] == 0
        assert self._span_bounds[-1][1] == c.num_layers
        for (a, b), (a2, _) in zip(self._span_bounds,
                                   self._span_bounds[1:]):
            assert b == a2, f"spans must tile the encoder: {spans}"

        body = ScannedLongNetLayer
        if c.remat:
            # static_argnums counts self: (self, x, rate, mask, det,
            # context, pre_combed) -> det is 4, pre_combed is 6
            body = nn.remat(body, static_argnums=(4, 6),
                            prevent_cse=False,
                            policy=remat_policy(c.remat_policy))
        mods = []
        for k, (a, b) in enumerate(self._span_bounds):
            span_cls = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast),
                length=b - a)
            mods.append(span_cls(c, dtype=self.dtype, name=f"span_{k}"))
        self.span_modules = mods

        if c.drop_path_rate > 0 and c.num_layers > 1:
            self._rates = [c.drop_path_rate * i / (c.num_layers - 1)
                           for i in range(c.num_layers)]
        else:
            self._rates = [0.0] * c.num_layers

        self.embed_dropout = nn.Dropout(c.dropout)
        if c.normalize_output and c.normalize_before:
            self.layer_norm = nn.LayerNorm(epsilon=c.layernorm_eps,
                                           dtype=self.dtype,
                                           name="layer_norm")
        else:
            self.layer_norm = None

    @property
    def span_bounds(self):
        return self._span_bounds

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
                   deterministic: bool = True, context=None):
        try:
            k = self._span_bounds.index((lo, hi))
        except ValueError as e:
            raise ValueError(
                f"run_layers({lo},{hi}) must match a configured span "
                f"{self._span_bounds}") from e
        rates = jnp.asarray(self._rates[lo:hi], jnp.float32)
        # Span-resident comb layout: permute the token stream into the
        # mega kernel's comb_R order ONCE per span (every op between
        # attentions — LN/FFN/residual/projections — is per-token and
        # order-equivariant), so the per-layer q/k/v comb and output
        # uncomb relayouts vanish from both passes.
        R = span_comb_R(self.cfg, x.shape[1], self.dtype)
        m = mask
        if R is not None:
            x = comb(x, R)
            m = comb(mask, R) if mask is not None else None
        x, _ = self.span_modules[k](x, rates, m, deterministic,
                                    context, R is not None)
        if R is not None:
            x = uncomb(x, R)
        return x

    def finalize(self, x):
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return x

    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        x = self.prepare(x, mask, deterministic)
        for lo, hi in self._span_bounds:
            x = self.run_layers(x, lo, hi, mask, deterministic)
        return self.finalize(x)
