"""Flash attention with in-kernel 2-D ALiBi bias (TITAN backbone).

The reference TITAN materializes a dense ``(H, N, N)`` ALiBi tensor from
grid coordinates and hands it to every block
(``titan_adapter.py:249-293``) — at a few thousand grid tokens that is
hundreds of MB of HBM traffic per layer. This kernel computes the bias
on the fly per tile from the (N, 3) coordinate array
(``[row, col, is_cls]``; cls rows/cols get zero bias) and a per-head
slope, fused into the flash softmax:

    s_ij = q_i . k_j * scale - slope_h * ||c_i - c_j||_2 + key_bias_j

Forward + custom-VJP backward mirror ops/flash_attention.py. A pure-XLA
reference (:func:`alibi_attention_reference`) is the CPU fallback and
numerical oracle.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .flash_attention import (NEG_INF, _MASK_THRESHOLD, _mm_precision,
                              _pick_block, _round_up)


# On-chip sweep (tools/sweep_alibi.py, v5e, 4100-token TITAN geometry,
# fwd+bwd ms/layer): per-head bq/bk=512/512 ran 59.3; MXU-dist with
# bk=1024 collapsed the bias-tile cost, and the all-heads variant on
# top landed 9.9 (512/1024). Defaults encode that optimum; env knobs
# remain for re-sweeps on other geometries.
_MXU_DIST = os.environ.get("MODALTUNE_ALIBI_MXU_DIST", "1") == "1"
_ALL_HEADS = os.environ.get("MODALTUNE_ALIBI_ALLHEADS", "1") == "1"


def _dist_nc(cq, ck):
    """(3, bq) x (3, bk) -> (bq, bk) fp32 ``dist * not_cls`` (the
    slope-free part of the ALiBi bias).

    Coordinates are carried lane-major — ``(B, 3, N)`` with the token
    axis in lanes — so each kernel block is 3 contiguous rows instead
    of bq 12-byte rows (one DMA descriptor per row; the same (N, 1)
    penalty measured for the fused dilated stats in round 2). The
    (1, n) -> (n, 1) reshape is the Mosaic-supported relayout.

    With ``MODALTUNE_ALIBI_MXU_DIST=1`` (default) the squared distance
    rides the MXU: ||cq - ck||^2 = |cq|^2 + |ck|^2 - 2 cq.ck with a
    K=2 contraction, replacing the per-element subtract/square VPU
    passes. Grid coords are small integers, so d2 is exact in fp32;
    the max(., 0) guards rounding on the diagonal."""
    not_cls = (1.0 - cq[2:3, :].reshape(-1, 1)) * (1.0 - ck[2:3, :])
    if _MXU_DIST:
        cq2 = cq[0:2, :]
        ck2 = ck[0:2, :]
        cross = jax.lax.dot_general(
            cq2, ck2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        qn = jnp.sum(cq2 * cq2, axis=0, keepdims=True).reshape(-1, 1)
        kn = jnp.sum(ck2 * ck2, axis=0, keepdims=True)
        d2 = jnp.maximum((qn + kn) - 2.0 * cross, 0.0)
        dist = jnp.sqrt(d2)
    else:
        dy = cq[0:1, :].reshape(-1, 1) - ck[0:1, :]
        dx = cq[1:2, :].reshape(-1, 1) - ck[1:2, :]
        dist = jnp.sqrt(dy * dy + dx * dx)
    return dist * not_cls


def _tile_bias(cq, ck, slope):
    """(3, bq) x (3, bk) -> (bq, bk) ALiBi bias tile in fp32."""
    return -slope * _dist_nc(cq, ck)


def _fwd_kernel(slope_ref, q_ref, k_ref, v_ref, cq_ref, ck_ref, bias_ref,
                o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                scale: float, nk: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    cq = cq_ref[0].astype(jnp.float32)
    ck = ck_ref[0].astype(jnp.float32)
    kbias = bias_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    s = s * scale + _tile_bias(cq, ck, slope_ref[pl.program_id(0)]) + kbias

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(kbias > _MASK_THRESHOLD, p, 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_ref[:, :1] + jnp.log(l_safe),
                        jnp.float32(NEG_INF))
        lse_ref[0] = lse.reshape(1, -1)


def _dq_kernel(slope_ref, q_ref, k_ref, v_ref, cq_ref, ck_ref, bias_ref,
               do_ref, lse_ref, delta_ref, dq_ref, acc_ref, *,
               scale: float, nk: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    cq = cq_ref[0].astype(jnp.float32)
    ck = ck_ref[0].astype(jnp.float32)
    kbias = bias_ref[0]
    lse = lse_ref[0].reshape(-1, 1)
    delta = delta_ref[0].reshape(-1, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    s = s * scale + _tile_bias(cq, ck, slope_ref[pl.program_id(0)]) + kbias
    p = jnp.exp(s - lse)
    p = jnp.where(kbias > _MASK_THRESHOLD, p, 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    ds = p * (dp - delta)
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype)) * scale

    @pl.when(kb == nk - 1)
    def _finalize():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(slope_ref, q_ref, k_ref, v_ref, cq_ref, ck_ref, bias_ref,
                do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale: float, nq: int):
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    cq = cq_ref[0].astype(jnp.float32)
    ck = ck_ref[0].astype(jnp.float32)
    bias_col = bias_ref[0].reshape(-1, 1)
    lse = lse_ref[0]
    delta = delta_ref[0]

    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    st = st * scale + _tile_bias(ck, cq, slope_ref[pl.program_id(0)]) + bias_col
    pt = jnp.exp(st - lse)
    pt = jnp.where(bias_col > _MASK_THRESHOLD, pt, 0.0)
    dv_acc[...] += jax.lax.dot_general(
        pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    dst = pt * (dpt - delta)
    dk_acc[...] += jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype)) * scale

    @pl.when(qb == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# All-heads-per-step variant: grid (B, nq, nk) with every head computed
# inside one grid step. The distance tile (sqrt chain) is computed ONCE
# per (i, j) instead of H times, coord/bias blocks load once per step,
# and per-grid-step overhead amortizes across H. Costs H x the block
# VMEM (q/k/v/do blocks and accumulators carry an H axis).
# ---------------------------------------------------------------------------


def _fwd_kernel_ah(slope_ref, q_ref, k_ref, v_ref, cq_ref, ck_ref,
                   bias_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                   scale: float, nk: int, H: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    cq = cq_ref[0].astype(jnp.float32)
    ck = ck_ref[0].astype(jnp.float32)
    kbias = bias_ref[0]
    dnc = _dist_nc(cq, ck)          # shared across all H heads
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_mm_precision(k.dtype))
        s = s * scale - slope_ref[h] * dnc + kbias
        m_prev = m_ref[h, :, :]
        l_prev = l_ref[h, :, :]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(kbias > _MASK_THRESHOLD, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[h, :, :] = l_prev * corr + jnp.sum(p, axis=-1,
                                                 keepdims=True)
        acc_ref[h] = acc_ref[h] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(k.dtype))
        m_ref[h, :, :] = m_new

    @pl.when(kb == nk - 1)
    def _finalize():
        for h in range(H):
            l = l_ref[h, :, :]
            l_safe = jnp.where(l > 0.0, l, 1.0)
            o_ref[0, h] = (acc_ref[h] / l_safe).astype(o_ref.dtype)
            lse = jnp.where(l > 0.0, m_ref[h, :, :] + jnp.log(l_safe),
                            jnp.float32(NEG_INF))
            lse_ref[0, h:h + 1, :] = lse.reshape(1, -1)


def _dq_kernel_ah(slope_ref, q_ref, k_ref, v_ref, cq_ref, ck_ref,
                  bias_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
                  *, scale: float, nk: int, H: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    cq = cq_ref[0].astype(jnp.float32)
    ck = ck_ref[0].astype(jnp.float32)
    kbias = bias_ref[0]
    dnc = _dist_nc(cq, ck)
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]
        lse = lse_ref[0, h:h + 1, :].reshape(-1, 1)
        delta = delta_ref[0, h:h + 1, :].reshape(-1, 1)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_mm_precision(k.dtype))
        s = s * scale - slope_ref[h] * dnc + kbias
        p = jnp.exp(s - lse)
        p = jnp.where(kbias > _MASK_THRESHOLD, p, 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_mm_precision(k.dtype))
        ds = p * (dp - delta)
        acc_ref[h] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(k.dtype)) * scale

    @pl.when(kb == nk - 1)
    def _finalize():
        for h in range(H):
            dq_ref[0, h] = acc_ref[h].astype(dq_ref.dtype)


def _dkv_kernel_ah(slope_ref, q_ref, k_ref, v_ref, cq_ref, ck_ref,
                   bias_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                   dk_acc, dv_acc, *, scale: float, nq: int, H: int):
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    cq = cq_ref[0].astype(jnp.float32)
    ck = ck_ref[0].astype(jnp.float32)
    bias_col = bias_ref[0].reshape(-1, 1)
    dnc_t = _dist_nc(ck, cq)
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]
        lse = lse_ref[0, h:h + 1, :]
        delta = delta_ref[0, h:h + 1, :]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_mm_precision(k.dtype))
        st = st * scale - slope_ref[h] * dnc_t + bias_col
        pt = jnp.exp(st - lse)
        pt = jnp.where(bias_col > _MASK_THRESHOLD, pt, 0.0)
        dv_acc[h] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(k.dtype))
        dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=_mm_precision(k.dtype))
        dst = pt * (dpt - delta)
        dk_acc[h] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_precision(k.dtype)) * scale

    @pl.when(qb == nq - 1)
    def _finalize():
        for h in range(H):
            dk_ref[0, h] = dk_acc[h].astype(dk_ref.dtype)
            dv_ref[0, h] = dv_acc[h].astype(dv_ref.dtype)


def _pad_args_ah(q, k, v, coords, bias, bq, bk):
    """4-D (B, H, L, D) padding variant; coords -> lane-major."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    Lqp, Lkp = _round_up(Lq, bq), _round_up(Lk, bk)
    cl = jnp.swapaxes(coords, 1, 2)
    cq = cl
    ck = cl
    if Lqp != Lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Lqp - Lq), (0, 0)))
        cq = jnp.pad(cq, ((0, 0), (0, 0), (0, Lqp - Lq)))
    if Lkp != Lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Lkp - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Lkp - Lk), (0, 0)))
        ck = jnp.pad(ck, ((0, 0), (0, 0), (0, Lkp - Lk)))
        bias = jnp.pad(bias, ((0, 0), (0, Lkp - Lk)),
                       constant_values=NEG_INF)
    return q, k, v, cq, ck, bias, Lqp, Lkp


def _specs_ah(H, bq, bk, D):
    return [
        pl.BlockSpec((1, H, bq, D), lambda b, i, j, *_: (b, 0, i, 0)),
        pl.BlockSpec((1, H, bk, D), lambda b, i, j, *_: (b, 0, j, 0)),
        pl.BlockSpec((1, H, bk, D), lambda b, i, j, *_: (b, 0, j, 0)),
        pl.BlockSpec((1, 3, bq), lambda b, i, j, *_: (b, 0, i)),
        pl.BlockSpec((1, 3, bk), lambda b, i, j, *_: (b, 0, j)),
        pl.BlockSpec((1, 1, bk), lambda b, i, j, *_: (b, 0, j)),
    ]


def _ah_params():
    if pltpu is None:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_pallas_ah(q, k, v, coords, slopes, bias, scale, block_q,
                   block_k, interpret=False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    bq = _pick_block(block_q, Lq)
    bk = _pick_block(block_k, Lk)
    qf, kf, vf, cq, ck, biasp, Lqp, Lkp = _pad_args_ah(q, k, v, coords,
                                                       bias, bq, bk)
    nq, nk = Lqp // bq, Lkp // bk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq, nk),
        in_specs=_specs_ah(H, bq, bk, D),
        out_specs=[
            pl.BlockSpec((1, H, bq, D), lambda b, i, j, *_: (b, 0, i, 0)),
            pl.BlockSpec((1, H, bq), lambda b, i, j, *_: (b, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, bq, D), jnp.float32),
            pltpu.VMEM((H, bq, 1), jnp.float32),
            pltpu.VMEM((H, bq, 1), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_ah, scale=scale, nk=nk, H=H),
        grid_spec=grid_spec,
        compiler_params=_ah_params(),
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lqp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lqp), jnp.float32),
        ],
    )(slopes.astype(jnp.float32), qf, kf, vf, cq, ck, biasp[:, None, :])
    return out[:, :, :Lq], lse[:, :, :Lq]


def _bwd_pallas_ah(scale, block_q, block_k, interpret, res, grads):
    q, k, v, coords, slopes, bias, out, lse = res
    do, _ = grads
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    bq = _pick_block(block_q, Lq)
    bk = _pick_block(block_k, Lk)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    qf, kf, vf, cq, ck, biasp, Lqp, Lkp = _pad_args_ah(q, k, v, coords,
                                                       bias, bq, bk)
    dof, lsef = do, lse
    if Lqp != Lq:
        dof = jnp.pad(dof, ((0, 0), (0, 0), (0, Lqp - Lq), (0, 0)))
        lsef = jnp.pad(lsef, ((0, 0), (0, 0), (0, Lqp - Lq)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, Lqp - Lq)))
    nq, nk = Lqp // bq, Lkp // bk
    slopes_f = slopes.astype(jnp.float32)

    base = _specs_ah(H, bq, bk, D)
    qblk = pl.BlockSpec((1, H, bq, D), lambda b, i, j, *_: (b, 0, i, 0))
    qrow = pl.BlockSpec((1, H, bq), lambda b, i, j, *_: (b, 0, i))
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nq, nk),
        in_specs=base + [qblk, qrow, qrow],
        out_specs=qblk,
        scratch_shapes=[pltpu.VMEM((H, bq, D), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel_ah, scale=scale, nk=nk, H=H),
        grid_spec=dq_spec,
        compiler_params=_ah_params(),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B, H, Lqp, D), q.dtype),
    )(slopes_f, qf, kf, vf, cq, ck, biasp[:, None, :], dof, lsef, delta)

    kv_specs = [
        pl.BlockSpec((1, H, bq, D), lambda b, j, i, *_: (b, 0, i, 0)),
        pl.BlockSpec((1, H, bk, D), lambda b, j, i, *_: (b, 0, j, 0)),
        pl.BlockSpec((1, H, bk, D), lambda b, j, i, *_: (b, 0, j, 0)),
        pl.BlockSpec((1, 3, bq), lambda b, j, i, *_: (b, 0, i)),
        pl.BlockSpec((1, 3, bk), lambda b, j, i, *_: (b, 0, j)),
        pl.BlockSpec((1, 1, bk), lambda b, j, i, *_: (b, 0, j)),
        pl.BlockSpec((1, H, bq, D), lambda b, j, i, *_: (b, 0, i, 0)),
        pl.BlockSpec((1, H, bq), lambda b, j, i, *_: (b, 0, i)),
        pl.BlockSpec((1, H, bq), lambda b, j, i, *_: (b, 0, i)),
    ]
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nk, nq),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((1, H, bk, D), lambda b, j, i, *_: (b, 0, j, 0)),
            pl.BlockSpec((1, H, bk, D), lambda b, j, i, *_: (b, 0, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, bk, D), jnp.float32),
            pltpu.VMEM((H, bk, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_ah, scale=scale, nq=nq, H=H),
        grid_spec=dkv_spec,
        compiler_params=_ah_params(),
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lkp, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Lkp, D), v.dtype),
        ],
    )(slopes_f, qf, kf, vf, cq, ck, biasp[:, None, :], dof, lsef, delta)
    return (dq[:, :, :Lq], dk[:, :, :Lk], dv[:, :, :Lk],
            jnp.zeros_like(coords), jnp.zeros_like(slopes),
            jnp.zeros_like(bias))


def _pad_args(q, k, v, coords, bias, bq, bk):
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    Lqp, Lkp = _round_up(Lq, bq), _round_up(Lk, bk)
    # lane-major coords: (B, N, 3) -> (B, 3, N) (see _tile_bias)
    cl = jnp.swapaxes(coords, 1, 2)
    cq = cl
    ck = cl
    if Lqp != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lqp - Lq), (0, 0)))
        cq = jnp.pad(cq, ((0, 0), (0, 0), (0, Lqp - Lq)))
    if Lkp != Lk:
        k = jnp.pad(k, ((0, 0), (0, Lkp - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lkp - Lk), (0, 0)))
        ck = jnp.pad(ck, ((0, 0), (0, 0), (0, Lkp - Lk)))
        bias = jnp.pad(bias, ((0, 0), (0, Lkp - Lk)),
                       constant_values=NEG_INF)
    return q, k, v, cq, ck, bias, Lqp, Lkp


def _specs(B, H, bq, bk, D):
    """Input block specs (the per-(b,h) slope rides as a scalar-prefetch
    argument). Grid is (B*H, nq, nk); coords/bias index by batch
    b = bh // H (shared across heads)."""
    def qmap(bh, i, j, *_):
        return (bh, i, 0)

    def kmap(bh, i, j, *_):
        return (bh, j, 0)

    return [
        pl.BlockSpec((1, bq, D), qmap),
        pl.BlockSpec((1, bk, D), kmap),
        pl.BlockSpec((1, bk, D), kmap),
        pl.BlockSpec((1, 3, bq), lambda bh, i, j, *_: (bh // H, 0, i)),
        pl.BlockSpec((1, 3, bk), lambda bh, i, j, *_: (bh // H, 0, j)),
        pl.BlockSpec((1, 1, bk), lambda bh, i, j, *_: (bh // H, 0, j)),
    ]


def _fwd_pallas(q, k, v, coords, slopes, bias, scale, block_q, block_k,
                interpret=False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    bq = _pick_block(block_q, Lq)
    bk = _pick_block(block_k, Lk)
    qf = q.reshape(B * H, Lq, D)
    kf = k.reshape(B * H, Lk, D)
    vf = v.reshape(B * H, Lk, D)
    qf, kf, vf, cq, ck, bias, Lqp, Lkp = _pad_args(qf, kf, vf, coords,
                                                   bias, bq, bk)
    nq, nk = Lqp // bq, Lkp // bk
    slopes_bh = jnp.tile(slopes.astype(jnp.float32)[None, :],
                         (B, 1)).reshape(B * H)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, nq, nk),
        in_specs=_specs(B, H, bq, bk, D),
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, i, j, *_: (bh, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda bh, i, j, *_: (bh, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nk=nk),
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lqp, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, 1, Lqp), jnp.float32),
        ],
    )(slopes_bh, qf, kf, vf, cq, ck, bias[:, None, :])
    return (out[:, :Lq].reshape(B, H, Lq, D),
            lse[:, 0, :Lq].reshape(B, H, Lq))


def _bwd_pallas(scale, block_q, block_k, interpret, res, grads):
    q, k, v, coords, slopes, bias, out, lse = res
    do, _ = grads
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    bq = _pick_block(block_q, Lq)
    bk = _pick_block(block_k, Lk)
    qf = q.reshape(B * H, Lq, D)
    kf = k.reshape(B * H, Lk, D)
    vf = v.reshape(B * H, Lk, D)
    dof = do.reshape(B * H, Lq, D)
    outf = out.reshape(B * H, Lq, D)
    lsef = lse.reshape(B * H, Lq)
    delta = jnp.sum(dof.astype(jnp.float32) * outf.astype(jnp.float32),
                    axis=-1)
    qf, kf, vf, cq, ck, biasp, Lqp, Lkp = _pad_args(qf, kf, vf, coords,
                                                    bias, bq, bk)
    if Lqp != Lq:
        dof = jnp.pad(dof, ((0, 0), (0, Lqp - Lq), (0, 0)))
        lsef = jnp.pad(lsef, ((0, 0), (0, Lqp - Lq)))
        delta = jnp.pad(delta, ((0, 0), (0, Lqp - Lq)))
    nq, nk = Lqp // bq, Lkp // bk
    slopes_bh = jnp.tile(slopes.astype(jnp.float32)[None, :],
                         (B, 1)).reshape(B * H)

    base = _specs(B, H, bq, bk, D)
    qrow = pl.BlockSpec((1, 1, bq), lambda bh, i, j, *_: (bh, 0, i))
    qblk = pl.BlockSpec((1, bq, D), lambda bh, i, j, *_: (bh, i, 0))

    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, nq, nk),
        in_specs=base + [qblk, qrow, qrow],
        out_specs=qblk,
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, nk=nk),
        grid_spec=dq_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((B * H, Lqp, D), q.dtype),
    )(slopes_bh, qf, kf, vf, cq, ck, biasp[:, None, :], dof,
      lsef[:, None, :], delta[:, None, :])

    # grid (bh, j over k-blocks, i over q-blocks)
    kv_specs = [
        pl.BlockSpec((1, bq, D), lambda bh, j, i, *_: (bh, i, 0)),
        pl.BlockSpec((1, bk, D), lambda bh, j, i, *_: (bh, j, 0)),
        pl.BlockSpec((1, bk, D), lambda bh, j, i, *_: (bh, j, 0)),
        pl.BlockSpec((1, 3, bq), lambda bh, j, i, *_: (bh // H, 0, i)),
        pl.BlockSpec((1, 3, bk), lambda bh, j, i, *_: (bh // H, 0, j)),
        pl.BlockSpec((1, 1, bk), lambda bh, j, i, *_: (bh // H, 0, j)),
        pl.BlockSpec((1, bq, D), lambda bh, j, i, *_: (bh, i, 0)),
        pl.BlockSpec((1, 1, bq), lambda bh, j, i, *_: (bh, 0, i)),
        pl.BlockSpec((1, 1, bq), lambda bh, j, i, *_: (bh, 0, i)),
    ]
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, nk, nq),
        in_specs=kv_specs,
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda bh, j, i, *_: (bh, j, 0)),
            pl.BlockSpec((1, bk, D), lambda bh, j, i, *_: (bh, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, nq=nq),
        grid_spec=dkv_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Lkp, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, Lkp, D), v.dtype),
        ],
    )(slopes_bh, qf, kf, vf, cq, ck, biasp[:, None, :], dof,
      lsef[:, None, :], delta[:, None, :])

    # coords / slopes / key-bias are non-learned inputs -> zero cotangents
    return (dq[:, :Lq].reshape(B, H, Lq, D),
            dk[:, :Lk].reshape(B, H, Lk, D),
            dv[:, :Lk].reshape(B, H, Lk, D),
            jnp.zeros_like(coords), jnp.zeros_like(slopes),
            jnp.zeros_like(bias))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _alibi_pallas(q, k, v, coords, slopes, bias, scale, block_q, block_k,
                  interpret=False, all_heads=False):
    fwd = _fwd_pallas_ah if all_heads else _fwd_pallas
    return fwd(q, k, v, coords, slopes, bias, scale, block_q,
               block_k, interpret)


def _alibi_fwd(q, k, v, coords, slopes, bias, scale, block_q, block_k,
               interpret=False, all_heads=False):
    fwd = _fwd_pallas_ah if all_heads else _fwd_pallas
    out, lse = fwd(q, k, v, coords, slopes, bias, scale, block_q,
                   block_k, interpret)
    # remat-policy names (see ops/flash_attention.py): lets
    # save_only_these_names keep the kernel outputs so the backward does
    # not re-run the forward kernel.
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return (out, lse), (q, k, v, coords, slopes, bias, out, lse)


def _alibi_bwd(scale, block_q, block_k, interpret, all_heads, res,
               grads):
    bwd = _bwd_pallas_ah if all_heads else _bwd_pallas
    return bwd(scale, block_q, block_k, interpret, res, grads)


_alibi_pallas.defvjp(_alibi_fwd, _alibi_bwd)


def alibi_attention_reference(q, k, v, coords, slopes, key_mask=None,
                              scale=None):
    """Dense oracle. q/k/v: (B, H, N, D); coords: (B, N, 3); slopes: (H,).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    d = coords[:, :, None, :2] - coords[:, None, :, :2]
    dist = jnp.sqrt(jnp.sum(d.astype(jnp.float32) ** 2, axis=-1))
    not_cls = (1.0 - coords[:, :, None, 2]) * (1.0 - coords[:, None, :, 2])
    bias = -slopes[None, :, None, None] * (dist * not_cls)[:, None]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale + bias
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, NEG_INF)
        p = jnp.where(key_mask[:, None, None, :],
                      jax.nn.softmax(s, axis=-1), 0.0)
        denom = jnp.maximum(p.sum(-1, keepdims=True), 1e-30)
        p = p / denom
    else:
        p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p,
                     v.astype(jnp.float32)).astype(q.dtype)
    return out


def alibi_flash_attention(q, k, v, coords, slopes,
                          key_mask: Optional[jax.Array] = None,
                          scale: Optional[float] = None, *,
                          block_q: int = 512, block_k: int = 1024,
                          use_pallas: Optional[bool] = None,
                          interpret: bool = False,
                          all_heads: Optional[bool] = None):
    """Fused ALiBi flash attention.

    q/k/v: ``(B, H, N, D)``; coords: ``(B, N, 3)`` = [row, col, is_cls];
    slopes: ``(H,)``; key_mask: ``(B, N)`` bool. Returns ``(B, H, N, D)``.
    ``interpret``: run the Pallas kernels in interpret mode (CPU
    parity tests).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = pltpu is not None and jax.default_backend() == "tpu"
    if not use_pallas:
        return alibi_attention_reference(q, k, v, coords, slopes, key_mask,
                                         scale)
    b, n = q.shape[0], k.shape[2]
    bias = jnp.zeros((b, n), jnp.float32) if key_mask is None else \
        jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    if all_heads is None:
        all_heads = _ALL_HEADS
    out, _ = _alibi_pallas(q, k, v, coords.astype(jnp.float32),
                           slopes.astype(jnp.float32), bias,
                           float(scale), block_q, block_k, interpret,
                           bool(all_heads))
    return out
