"""ABMIL and TransMIL baseline aggregators (TPU-native).

The reference's CLI defaults to ``--mil_name abmil``
(``train_modaltune.py:615``) and its paper tables report ABMIL /
TransMIL — plus their late-fusion "(cat)" variants concatenating a
genomics embedding — as the main baselines (BASELINE.md / BASELINE.json
target configs #1-#2), but the aggregator classes themselves were
trained outside the published repo. This module completes the registry
surface (``models/aggregators/aggregators.py:6-41``) with TPU-first
implementations:

- static bucketed bags with validity masks instead of the reference's
  batch-size-1 ragged bags: every attention softmax is masked, so one
  compiled program covers a whole bucket and the MXU sees real batch
  dims;
- ABMIL is the gated-attention MIL of Ilse et al. 2018 (tanh x sigmoid
  gate, masked instance softmax);
- TransMIL (Shao et al. 2021) uses Nystrom self-attention (landmark
  means + Newton-Schulz pseudo-inverse — pure batched matmuls, no
  data-dependent shapes) and the PPEG pyramid conv positional encoding
  over the squared token grid;
- the "(cat)" fusion variant runs the same pathway-grouped
  GeneMixerEncoder as the adapter models (``models/gene.py``) and
  concatenates its mean-pooled embedding before the head;
- output heads follow ``Aggregator.return_logits``
  (``aggregators.py:43-58``): feature / classifier / survival modes.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import GeneEncoderConfig
from .gene import GeneMixerEncoder
from .heads import classifier_logits, survival_from_logits
from .registry import register_aggregator

_NEG = -1e9


def _trunc02():
    return nn.initializers.normal(stddev=0.02)


def masked_mean(x: jax.Array, mask: jax.Array, axis: int) -> jax.Array:
    """Mean over ``axis`` counting only mask-true rows (count clamped
    to >= 1 so empty segments give exact zeros, not NaN)."""
    m = mask.astype(x.dtype)
    num = jnp.sum(x * m, axis=axis)
    den = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return num / den


class GatedAttentionPool(nn.Module):
    """Gated attention-based MIL pooling (Ilse et al. 2018 eq. 9):
    ``a_i = softmax(w^T (tanh(V h_i) * sigmoid(U h_i)))`` with padded
    instances masked out of the softmax. Returns (pooled (B, C),
    attention (B, N))."""

    attn_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, mask):
        v = nn.tanh(nn.Dense(self.attn_dim, dtype=self.dtype,
                             kernel_init=_trunc02(), name="attn_v")(h))
        u = nn.sigmoid(nn.Dense(self.attn_dim, dtype=self.dtype,
                                kernel_init=_trunc02(), name="attn_u")(h))
        scores = nn.Dense(1, dtype=self.dtype, kernel_init=_trunc02(),
                          name="attn_w")(v * u)[..., 0]
        scores = jnp.where(mask, scores.astype(jnp.float32), _NEG)
        attn = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
        pooled = jnp.einsum("bn,bnc->bc", attn, h)
        return pooled, attn


class _MilHead(nn.Module):
    """Shared feature/classifier/survival epilogue + optional gene
    "(cat)" fusion for the MIL baselines."""

    n_classes: int
    mode: str
    gene_cfg: Optional[GeneEncoderConfig]
    n_gene_groups: int
    max_group_len: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled, genes, deterministic: bool = True):
        if self.gene_cfg is not None:
            assert genes is not None, \
                "(cat) fusion model called without genes"
            gtok = GeneMixerEncoder(self.gene_cfg, self.n_gene_groups,
                                    self.max_group_len, dtype=self.dtype,
                                    name="gene_encoder")(
                genes, deterministic)
            pooled = jnp.concatenate(
                [pooled, jnp.mean(gtok, axis=1).astype(pooled.dtype)],
                axis=-1)
        if self.mode == "feature":
            return pooled
        h = nn.LayerNorm(epsilon=1e-5, name="final_norm")(
            pooled.astype(jnp.float32))
        w = self.param("classifier_kernel", _trunc02(),
                       (h.shape[-1], self.n_classes))
        b = self.param("classifier_bias", nn.initializers.zeros,
                       (self.n_classes,))
        logits = classifier_logits(h, w, b)
        if self.mode == "classifier":
            return logits
        if self.mode == "survival":
            return survival_from_logits(logits)
        raise NotImplementedError(f"mode={self.mode}")


@register_aggregator("abmil")
class AbmilModel(nn.Module):
    """Attention-based MIL over cached patch-feature bags.

    ``bag (B, N, in_dim)``, ``mask (B, N)`` bool validity ->
    feature (B, hidden [+gene]) / classifier logits / survival tuple.
    Set ``gene_cfg`` for the late-fusion "(cat)" variant
    (BASELINE.md "ABMIL (cat)").
    """

    hidden: int = 512
    attn_dim: int = 256
    n_classes: int = 2
    mode: str = "classifier"          # feature | classifier | survival
    dropout: float = 0.25
    gene_cfg: Optional[GeneEncoderConfig] = None
    n_gene_groups: int = 0
    max_group_len: int = 0
    dtype: Any = jnp.float32

    @property
    def use_genes(self) -> bool:
        return self.gene_cfg is not None

    @nn.compact
    def __call__(self, bag, mask=None, genes=None,
                 deterministic: bool = True):
        if mask is None:
            mask = jnp.ones(bag.shape[:2], bool)
        h = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=_trunc02(), name="fc1")(
            bag.astype(self.dtype))
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        pooled, _ = GatedAttentionPool(self.attn_dim, dtype=self.dtype,
                                       name="attn_pool")(h, mask)
        return _MilHead(self.n_classes, self.mode, self.gene_cfg,
                        self.n_gene_groups, self.max_group_len,
                        dtype=self.dtype, name="head")(
            pooled, genes, deterministic)


# ---------------------------------------------------------------------------
# TransMIL
# ---------------------------------------------------------------------------


def _newton_schulz_pinv(a: jax.Array, iters: int = 6) -> jax.Array:
    """Moore-Penrose pseudo-inverse of batched (.., m, m) matrices via
    the cubic Newton-Schulz iteration (Nystromformer appendix B) —
    batched matmuls only, MXU-friendly, no data-dependent control flow."""
    m = a.shape[-1]
    eye = jnp.eye(m, dtype=a.dtype)
    scale = (jnp.max(jnp.sum(jnp.abs(a), axis=-2), axis=-1) *
             jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1))
    z = jnp.swapaxes(a, -1, -2) / jnp.maximum(
        scale, 1e-6)[..., None, None]
    for _ in range(iters):
        az = a @ z
        z = 0.25 * z @ (13.0 * eye - az @ (15.0 * eye - az @
                                           (7.0 * eye - az)))
    return z


class NystromSelfAttention(nn.Module):
    """Masked Nystrom self-attention (Xiong et al. 2021, as used by
    TransMIL): landmark keys/queries are masked segment means, the
    softmax over real keys is exact in the third factor, and the m x m
    kernel is inverted with Newton-Schulz. All shapes static.

    A per-head depthwise conv over the token axis (the Nystromformer
    "residual conv", kernel 33) is added to the value path.
    """

    dim: int
    heads: int = 8
    landmarks: int = 64
    pinv_iters: int = 6
    conv_kernel: int = 33
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype,
                       kernel_init=_trunc02(), name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_of(t):
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        q = q * (dh ** -0.5)
        # zero masked rows so landmark means and the value matmul never
        # see padding
        mrow = mask[:, None, :, None].astype(q.dtype)
        q, k, v = q * mrow, k * mrow, v * mrow

        # landmark means over ceil(n / m)-sized segments (pad to a
        # multiple of m with masked rows — static shapes)
        m = self.landmarks
        pad = (-n) % m
        if pad:
            zf = ((0, 0), (0, 0), (0, pad), (0, 0))
            qp, kp = jnp.pad(q, zf), jnp.pad(k, zf)
            mp = jnp.pad(mask, ((0, 0), (0, pad)))
        else:
            qp, kp, mp = q, k, mask
        seg = qp.shape[2] // m
        segmask = mp.reshape(b, 1, m, seg, 1)
        q_l = masked_mean(qp.reshape(b, h, m, seg, dh), segmask, axis=3)
        k_l = masked_mean(kp.reshape(b, h, m, seg, dh), segmask, axis=3)

        f32 = jnp.float32
        sim1 = jnp.einsum("bhnd,bhmd->bhnm", q, k_l).astype(f32)
        sim2 = jnp.einsum("bhmd,bhld->bhml", q_l, k_l).astype(f32)
        sim3 = jnp.einsum("bhmd,bhnd->bhmn", q_l, k).astype(f32)
        # only the exact factor attends over individual keys: mask it
        sim3 = jnp.where(mask[:, None, None, :], sim3, _NEG)
        a1 = jax.nn.softmax(sim1, axis=-1).astype(self.dtype)
        # the Newton-Schulz iteration needs fp32 headroom; the result is
        # cast back to the compute dtype for the two chained matmuls
        a2inv = _newton_schulz_pinv(jax.nn.softmax(sim2, axis=-1),
                                    self.pinv_iters).astype(self.dtype)
        a3 = jax.nn.softmax(sim3, axis=-1).astype(self.dtype)
        out = a1 @ a2inv @ (a3 @ v)

        # per-head depthwise residual conv over tokens (kernel shared
        # across the dh lanes of a head, like Conv2d(groups=heads))
        wconv = self.param("res_conv", _trunc02(),
                           (self.conv_kernel, 1, h))
        vt = v.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
        vc = jax.lax.conv_general_dilated(
            vt, jnp.repeat(wconv.astype(vt.dtype), dh, axis=-1),
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=h * dh)
        out = out + vc.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = out * mask[:, :, None].astype(out.dtype)
        return nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=_trunc02(), name="proj")(out)


class PPEG(nn.Module):
    """Pyramid Position Encoding Generator (TransMIL §3.3): square the
    instance tokens into a (Hs, Hs) grid and add depthwise 7x7 / 5x5 /
    3x3 convs + identity. Padded grid cells are zeroed before and after
    the convs so positional mixing never leaks padding."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, mask):
        b, n, c = tokens.shape
        side = math.isqrt(n)
        if side * side < n:
            side += 1
        pad = side * side - n
        x = jnp.pad(tokens * mask[:, :, None].astype(tokens.dtype),
                    ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(b, side, side, c)
        y = x
        for ksz in (7, 5, 3):
            y = y + nn.Conv(c, (ksz, ksz), feature_group_count=c,
                            dtype=self.dtype, kernel_init=_trunc02(),
                            name=f"conv{ksz}")(x)
        y = y.reshape(b, side * side, c)[:, :n]
        return y * mask[:, :, None].astype(y.dtype)


@register_aggregator("transmil")
class TransMilModel(nn.Module):
    """TransMIL (Shao et al. 2021) over cached patch-feature bags:
    fc -> cls token -> NystromAttention layer -> PPEG -> Nystrom layer
    -> cls readout. ``gene_cfg`` enables the "(cat)" late-fusion
    variant (BASELINE.md "TransMIL (cat)")."""

    hidden: int = 512
    heads: int = 8
    landmarks: int = 64
    n_classes: int = 2
    mode: str = "classifier"
    dropout: float = 0.1
    gene_cfg: Optional[GeneEncoderConfig] = None
    n_gene_groups: int = 0
    max_group_len: int = 0
    dtype: Any = jnp.float32

    @property
    def use_genes(self) -> bool:
        return self.gene_cfg is not None

    @nn.compact
    def __call__(self, bag, mask=None, genes=None,
                 deterministic: bool = True):
        b, n, _ = bag.shape
        if mask is None:
            mask = jnp.ones((b, n), bool)
        h = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=_trunc02(), name="fc1")(
            bag.astype(self.dtype))
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(h.dtype),
                              (b, 1, self.hidden)), h], axis=1)
        m1 = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)

        def trans_layer(x, name):
            return x + NystromSelfAttention(
                self.hidden, heads=self.heads, landmarks=self.landmarks,
                dtype=self.dtype, name=name)(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_norm")(x), m1)

        h = trans_layer(h, "layer1")
        # PPEG runs on the instance tokens only; cls passes through
        h = jnp.concatenate(
            [h[:, :1], h[:, 1:] + PPEG(self.hidden, dtype=self.dtype,
                                       name="ppeg")(h[:, 1:], mask)],
            axis=1)
        h = trans_layer(h, "layer2")
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="norm")(h)
        return _MilHead(self.n_classes, self.mode, self.gene_cfg,
                        self.n_gene_groups, self.max_group_len,
                        dtype=self.dtype, name="head")(
            h[:, 0], genes, deterministic)
