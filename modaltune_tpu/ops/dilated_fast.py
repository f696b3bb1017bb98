"""Head-major dilated attention: the fast production path.

Same math as ops/dilated.py (which remains the readable reference
implementation and handles arbitrary shapes), but laid out to be pure
slice/pad/concat for XLA:

* q/k/v are transposed to head-major ``(B, H, L, D)`` **once per layer**
  (the reference layout transposes per branch per tensor — 15x more);
* the head-rotation gather (``torch.diagonal`` in the reference,
  ``dilated_attention.py:22-37``) becomes, per head-group ``g``, a
  contiguous head slice + a **strided position slice** ``[g::r]`` —
  no gather at all. Valid whenever each head group's stride pattern is
  uniform across segments, i.e. ``segment % ratio == 0`` or the branch
  is single-segment (true for every LongNet schedule; the general case
  falls back to ops/dilated.py);
* the scatter back is a zero-pad + reshape interleave (no diag_embed);
* branch mixing happens in ``(B, H, L)`` head-major layout and the
  result is transposed back once.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .flash_attention import NEG_INF, flash_attention


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _branch_supported(length: int, seg_len: int, ratio: int,
                      num_heads: int) -> bool:
    sl = min(seg_len, length)
    if num_heads % ratio != 0:
        return False
    if ratio == 1:
        return True
    # strided slicing needs the in-segment stride pattern to tile:
    # multi-segment branches require segment % ratio == 0
    lp = _round_up(length, sl)
    n = lp // sl
    return n == 1 or sl % ratio == 0


def _branch_hm(qh, kh, vh, mask, seg_len: int, ratio: int, scale: float,
               use_pallas, block_q: int, block_k: int):
    """One branch in head-major layout.

    qh/kh/vh: ``(B, H, L, D)``; mask ``(B, L)`` or None.
    Returns out ``(B, H, L, D)`` fp32, lse ``(B, H, L)`` fp32.
    """
    b, h, length, d = qh.shape
    r = ratio
    hg = h // r
    sl = min(seg_len, length)
    if r > 1:
        # segment length must be a multiple of r for the strided-slice
        # pattern; _branch_supported guarantees this is only a rounding of
        # single-segment (clamped) branches
        sl = _round_up(sl, r)
    lp = _round_up(length, sl)
    n = lp // sl
    s = sl // r

    def pad_l(x, fill=0.0):
        if lp != length:
            cfg = [(0, 0)] * x.ndim
            cfg[2 if x.ndim == 4 else 1] = (0, lp - length)
            x = jnp.pad(x, cfg, constant_values=fill)
        return x

    qp, kp, vp = pad_l(qh), pad_l(kh), pad_l(vh)
    need_mask = mask is not None or lp != length
    bias = None
    if need_mask:
        m = mask if mask is not None else jnp.ones((b, length), bool)
        if lp != length:
            m = jnp.pad(m, ((0, 0), (0, lp - length)))
    if r == 1:
        # (B, H, n, s, D) -> (B*H*n, s, D)
        qs = qp.reshape(b * h * n, s, d)
        ks = kp.reshape(b * h * n, s, d)
        vs = vp.reshape(b * h * n, s, d)
        if need_mask:
            mm = jnp.broadcast_to(m[:, None, :], (b, h, lp))
            bias = jnp.where(mm.reshape(b * h * n, s), 0.0, NEG_INF)
    else:
        # per head-group g: heads [g*hg:(g+1)*hg], positions [g::r]
        def dilate(x):
            # x (B, H, lp, D) -> (B, H, n, s, D) with the group pattern:
            # view as (B, r, hg, lp, D); group g takes positions g::r
            xg = x.reshape(b, r, hg, lp, d)
            parts = [xg[:, g, :, g::r, :].reshape(b, hg, n, s, d)
                     for g in range(r)]
            return jnp.stack(parts, axis=1)  # (B, r, hg, n, s, D)

        qs = dilate(qp).reshape(b * h * n, s, d)
        ks = dilate(kp).reshape(b * h * n, s, d)
        vs = dilate(vp).reshape(b * h * n, s, d)
        if need_mask:
            parts = [m[:, g::r].reshape(b, 1, n, s) for g in range(r)]
            mm = jnp.broadcast_to(jnp.stack(parts, axis=1),
                                  (b, r, hg, n, s))
            bias = jnp.where(mm.reshape(b * h * n, s), 0.0, NEG_INF)

    out, lse = flash_attention(qs, ks, vs, bias, scale,
                               block_q=block_q, block_k=block_k,
                               use_pallas=use_pallas)

    if r == 1:
        out_d = out.astype(jnp.float32).reshape(b, h, lp, d)
        lse_d = lse.reshape(b, h, lp)
    else:
        # interleave back: group g owns positions g::r
        out = out.astype(jnp.float32).reshape(b, r, hg, n * s, d)
        lse = lse.reshape(b, r, hg, n * s)
        outs, lses = [], []
        for g in range(r):
            # (B, hg, n*s, 1, D) padded to slot r at offset g
            og = jnp.pad(out[:, g][:, :, :, None, :],
                         ((0, 0), (0, 0), (0, 0), (g, r - 1 - g), (0, 0)))
            lg = jnp.pad(lse[:, g][:, :, :, None],
                         ((0, 0), (0, 0), (0, 0), (g, r - 1 - g)),
                         constant_values=NEG_INF)
            outs.append(og.reshape(b, hg, lp, d))
            lses.append(lg.reshape(b, hg, lp))
        out_d = jnp.concatenate(outs, axis=1)
        lse_d = jnp.concatenate(lses, axis=1)
    return out_d[:, :, :length], lse_d[:, :, :length]


def dilated_attention_fast(q, k, v, *, segment_lengths: Sequence[int],
                           dilated_ratios: Sequence[int],
                           mask: Optional[jax.Array] = None,
                           scale: Optional[float] = None,
                           use_pallas: Optional[bool] = None,
                           block_q: int = 1024,
                           block_k: int = 1024) -> jax.Array:
    """Head-major LongNet dilated attention; public contract identical to
    :func:`ops.dilated.dilated_attention` (q/k/v ``(B, L, H, D)``)."""
    b, length, h, d = q.shape
    if not all(_branch_supported(length, int(sl), int(r), h)
               for sl, r in zip(segment_lengths, dilated_ratios)):
        from .dilated import dilated_attention
        return dilated_attention(q, k, v,
                                 segment_lengths=segment_lengths,
                                 dilated_ratios=dilated_ratios, mask=mask,
                                 scale=scale, use_pallas=use_pallas,
                                 block_q=block_q, block_k=block_k)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # one head-major transpose per tensor per layer
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    outs, lses = [], []
    for sl, r in zip(segment_lengths, dilated_ratios):
        o, l = _branch_hm(qh, kh, vh, mask, int(sl), int(r), float(scale),
                          use_pallas, block_q, block_k)
        outs.append(o)
        lses.append(l)
    if len(outs) == 1:
        return outs[0].transpose(0, 2, 1, 3).astype(q.dtype)
    lse = jnp.stack(lses)                              # (n_br, B, H, L)
    m = jax.lax.stop_gradient(jnp.max(lse, axis=0))
    w = jnp.exp(jax.lax.stop_gradient(lse) - m)
    w = w / jnp.sum(w, axis=0)
    out = sum(o * wi[..., None] for o, wi in zip(outs, w))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
