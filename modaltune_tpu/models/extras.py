"""Inventoried-but-config-off components, TPU-native.

The reference ships several mechanisms that its shipped configs disable;
they are part of the public capability surface (SURVEY.md §2.3/§2.6), so
they exist here too, tested, in idiomatic JAX form:

* :class:`LoraDilatedSelfAttention` — per-modality (img/gene/task) LoRA
  deltas on q/k/v around dilated attention
  (``DilatedAttentionLoraAdapter``, ``dilated_attention.py:265-492``;
  disabled by ``lora_adapter=False`` at ``slide_encoder.py:101``).
* :class:`MoeFeedForward` — GShard-style top-1/top-2 token routing with
  capacity + load-balance aux loss; expert parallelism maps to a mesh
  ``expert`` axis with ``jax.lax.all_to_all`` under shard_map (the
  reference's ``_AllToAll`` autograd collective,
  ``xmoe/moe_layer.py:49-64``; off in every LongNet config via
  ``moe_freq: 0``).
* :func:`apply_xpos` — xPos rotary embedding
  (``xpos_relative_position.py``; off: ``xpos_rel_pos=False``).
* :class:`RelativePositionBias` — T5 bucketed bias
  (``relative_position_bias.py``; off: ``rel_pos_buckets=0``).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import gelu_exact
from ..configs import LongNetConfig
from ..ops import dilated_attention


# ---------------------------------------------------------------------------
# LoRA dilated attention
# ---------------------------------------------------------------------------


class LoraDilatedSelfAttention(nn.Module):
    """Dilated self-attention with frozen base q/k/v/out projections and
    trainable per-modality LoRA deltas:

    ``q = W_q x + (B_i A_i x + B_g A_g gene + B_t A_t task) / 3``

    with per-branch scaling alpha/rank (``apply_lora``,
    ``dilated_attention.py:372-401``). ``gene``/``task`` are pooled
    (B, 1, D) context vectors broadcast over tokens."""

    cfg: LongNetConfig
    lora_alpha: float = 32.0
    img_rank: int = 4
    mm_rank: int = 8
    lora_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, gene, task, mask=None, deterministic=True):
        c = self.cfg
        d = c.embed_dim
        kaiming = nn.initializers.he_uniform()
        drop = nn.Dropout(self.lora_dropout)

        def lora_proj(name, inp):
            base = nn.Dense(d, dtype=self.dtype, name=f"{name}_proj")(inp)

            def delta(ctx, rank, tag):
                a = nn.Dense(rank, use_bias=False, dtype=self.dtype,
                             kernel_init=kaiming,
                             name=f"{name}_lora_A_{tag}")(
                    drop(ctx, deterministic=deterministic))
                b = nn.Dense(d, use_bias=False, dtype=self.dtype,
                             kernel_init=nn.initializers.zeros,
                             name=f"{name}_lora_B_{tag}")(a)
                return b * (self.lora_alpha / rank)

            deltas = (delta(inp, self.img_rank, "img")
                      + delta(gene, self.mm_rank, "gene")
                      + delta(task, self.mm_rank, "task"))
            return base + deltas / 3.0

        q = lora_proj("q", x)
        k = lora_proj("k", x)
        v = lora_proj("v", x)
        b, l = x.shape[0], x.shape[1]
        split = lambda t: t.reshape(b, l, c.num_heads, c.head_dim)
        out = dilated_attention(split(q), split(k), split(v),
                                segment_lengths=c.segment_lengths,
                                dilated_ratios=c.dilated_ratios,
                                mask=mask if c.mask_padding else None)
        out = out.reshape(b, l, d)
        if c.subln:
            out = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=self.dtype,
                               name="inner_attn_ln")(out)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


# ---------------------------------------------------------------------------
# Mixture of experts
# ---------------------------------------------------------------------------


def top1_gating(logits: jax.Array, capacity: int
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (combine (S, E, C), dispatch (S, E, C) bool, aux loss).
    GShard top-1 with capacity dropping (``xmoe/routing.py:36-137``)."""
    s, e = logits.shape
    probs = jax.nn.softmax(logits, axis=-1)
    expert = jnp.argmax(probs, axis=-1)                  # (S,)
    onehot = jax.nn.one_hot(expert, e)                   # (S, E)
    # position of each token within its expert's queue
    pos = jnp.cumsum(onehot, axis=0) * onehot - onehot   # rank, 0-based
    pos = jnp.sum(pos, axis=-1).astype(jnp.int32)
    keep = pos < capacity
    gate = jnp.sum(probs * onehot, axis=-1) * keep
    # load-balance aux loss (mean gate prob * mean dispatch per expert)
    density = onehot.mean(axis=0)
    density_proxy = probs.mean(axis=0)
    aux = jnp.sum(density * density_proxy) * e
    dispatch = onehot[:, :, None] * jax.nn.one_hot(pos, capacity
                                                   )[:, None, :]
    dispatch = dispatch * keep[:, None, None]
    combine = dispatch * gate[:, None, None]
    return combine, dispatch.astype(bool), aux


def top2_gating(logits: jax.Array, capacity: Optional[int] = None,
                rng: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """GShard top-2 gating (``xmoe/routing.py:258-448``).

    -> (combine (S, E, C), dispatch (S, E, C) bool, aux loss). Mirrors
    the reference defaults: capacity ``2*ceil(S/E)``; the second expert
    is the argmax of the remaining logits (plus Gumbel noise when
    ``rng`` is given — ``second_expert_policy='sampling'``); gate
    weights are normalized g/(g1+g2) AFTER capacity dropping
    (``normalize_gate_prob_before_dropping=False``); aux loss
    ``mean(me * ce) * E^2`` uses top-1 dispatch only.
    """
    s, e = logits.shape
    if capacity is None:
        capacity = 2 * -(-s // e)
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx1 = jnp.argmax(gates, axis=-1)
    mask1 = jax.nn.one_hot(idx1, e)
    noisy = logits if rng is None else \
        logits + jax.random.gumbel(rng, logits.shape, jnp.float32)
    logits_except1 = jnp.where(mask1 > 0, -jnp.inf, noisy)
    idx2 = jnp.argmax(logits_except1, axis=-1)
    mask2 = jax.nn.one_hot(idx2, e)

    # capacity-queue positions; expert-2 queues start after expert-1's
    loc1 = jnp.cumsum(mask1, axis=0) * mask1 - mask1
    loc2 = jnp.cumsum(mask2, axis=0) * mask2 - mask2
    loc2 = loc2 + jnp.sum(mask1, axis=0, keepdims=True)

    me = gates.mean(axis=0)
    ce = mask1.mean(axis=0)
    aux = jnp.mean(me * ce) * e * e

    mask1 = mask1 * (loc1 < capacity)
    mask2 = mask2 * (loc2 < capacity)
    g1 = jnp.sum(gates * mask1, axis=-1)
    g2 = jnp.sum(gates * mask2, axis=-1)
    denom = jnp.maximum(g1 + g2, jnp.finfo(jnp.float32).eps)
    g1, g2 = g1 / denom, g2 / denom

    pos1 = jnp.sum(loc1 * mask1, axis=-1).astype(jnp.int32)
    pos2 = jnp.sum(loc2 * mask2, axis=-1).astype(jnp.int32)
    c1 = (g1[:, None] * mask1)[:, :, None] * \
        jax.nn.one_hot(pos1, capacity)[:, None, :]
    c2 = (g2[:, None] * mask2)[:, :, None] * \
        jax.nn.one_hot(pos2, capacity)[:, None, :]
    combine = c1 + c2
    return combine, combine > 0, aux


class MoeFeedForward(nn.Module):
    """Token-routed expert FFN. Single-device by default; with
    ``axis_name`` set (under shard_map over a mesh ``expert`` axis), the
    dispatched tokens are exchanged with ``jax.lax.all_to_all`` — the
    XLA-collective equivalent of the reference's ``_AllToAll`` autograd
    function (``xmoe/moe_layer.py:49-64,232-246``)."""

    dim: int
    ffn_dim: int
    num_experts: int
    capacity_factor: float = 1.0
    gate_type: str = "top1"         # "top1" | "top2" (Top2Gate)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, l, d = x.shape
        s = b * l
        tokens = x.reshape(s, d)
        e = self.num_experts
        logits = nn.Dense(e, use_bias=False, dtype=jnp.float32,
                          name="gate")(tokens.astype(jnp.float32))
        if self.gate_type == "top2":
            capacity = max(1, int(self.capacity_factor * 2 * s / e))
            rng = None if deterministic else self.make_rng("dropout")
            combine, dispatch, aux = top2_gating(logits, capacity, rng)
        else:
            capacity = max(1, int(self.capacity_factor * s / e))
            combine, dispatch, aux = top1_gating(logits, capacity)

        # (E, C, D) expert inputs
        expert_in = jnp.einsum("sec,sd->ecd", dispatch.astype(x.dtype),
                               tokens)
        if self.axis_name is not None:
            # tokens are sharded over the mesh axis and experts are
            # sharded too: exchange dispatched blocks so each shard
            # receives its experts' tokens from every token shard
            n_shards = jax.lax.axis_size(self.axis_name)
            local_e = e // n_shards
            expert_in = expert_in.reshape(n_shards, local_e, capacity, d)
            expert_in = jax.lax.all_to_all(expert_in, self.axis_name, 0, 0,
                                           tiled=False)
            # (src_shard, local_e, C, d) -> (local_e, src*C, d)
            expert_in = expert_in.transpose(1, 0, 2, 3).reshape(
                local_e, n_shards * capacity, d)
        else:
            local_e = e

        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (local_e, d, self.ffn_dim))
        b1 = self.param("b1", nn.initializers.zeros,
                        (local_e, 1, self.ffn_dim))
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (local_e, self.ffn_dim, d))
        b2 = self.param("b2", nn.initializers.zeros, (local_e, 1, d))
        h = jnp.einsum("ecd,edf->ecf", expert_in,
                       w1.astype(expert_in.dtype)) + b1.astype(x.dtype)
        h = gelu_exact(h)
        h = jnp.einsum("ecf,efd->ecd", h,
                       w2.astype(h.dtype)) + b2.astype(x.dtype)

        if self.axis_name is not None:
            n_shards = jax.lax.axis_size(self.axis_name)
            h = h.reshape(local_e, n_shards, capacity, d)
            h = h.transpose(1, 0, 2, 3)
            h = jax.lax.all_to_all(h, self.axis_name, 0, 0, tiled=False)
            h = h.reshape(e, capacity, d)

        out = jnp.einsum("sec,ecd->sd", combine.astype(h.dtype), h)
        return out.reshape(b, l, d), aux


# ---------------------------------------------------------------------------
# xPos rotary + T5 relative position bias
# ---------------------------------------------------------------------------


def apply_xpos(x: jax.Array, offset: int = 0, scale_base: float = 512.0,
               downscale: bool = False) -> jax.Array:
    """xPos: rotary embedding with exponential length scaling
    (``xpos_relative_position.py``). x: (B, L, D_head)."""
    b, l, d = x.shape
    half = d // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(half) / half))
    pos = jnp.arange(offset, offset + l, dtype=jnp.float32)
    angles = pos[:, None] * freqs[None, :]
    zeta = ((jnp.arange(half) / half + 0.4) / 1.4)[None, :] ** (
        pos[:, None] / scale_base)
    if downscale:
        zeta = 1.0 / zeta
    sin, cos = jnp.sin(angles), jnp.cos(angles)
    x1, x2 = x[..., :half], x[..., half:]
    rot1 = x1 * cos - x2 * sin
    rot2 = x2 * cos + x1 * sin
    return jnp.concatenate([rot1 * zeta, rot2 * zeta], axis=-1
                           ).astype(x.dtype)


class RelativePositionBias(nn.Module):
    """T5 bucketed relative position bias
    (``relative_position_bias.py``)."""

    num_buckets: int = 32
    max_distance: int = 128
    num_heads: int = 12

    @staticmethod
    def _bucket(rel, num_buckets, max_distance):
        n = -rel
        num_buckets //= 2
        ret = (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
        max_exact = num_buckets // 2
        is_small = n < max_exact
        val_large = max_exact + (
            jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
            / math.log(max_distance / max_exact)
            * (num_buckets - max_exact)).astype(jnp.int32)
        val_large = jnp.minimum(val_large, num_buckets - 1)
        return ret + jnp.where(is_small, n, val_large)

    @nn.compact
    def __call__(self, qlen: int, klen: int) -> jax.Array:
        emb = self.param("rel_attn_bias", nn.initializers.normal(0.02),
                         (self.num_buckets, self.num_heads))
        ctx = jnp.arange(qlen)[:, None]
        mem = jnp.arange(klen)[None, :]
        buckets = self._bucket(mem - ctx, self.num_buckets,
                               self.max_distance)
        return emb[buckets].transpose(2, 0, 1)  # (H, qlen, klen)
