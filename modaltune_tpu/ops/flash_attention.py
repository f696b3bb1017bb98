"""Pallas TPU flash attention that returns the log-sum-exp.

This is the TPU-native replacement for the reference's CUDA kernel shim
(``torchscale/component/flash_attention.py:10-28`` — FlashAttention-2 /
xformers CUTLASS): LongNet's dilated-branch recombination
(``torchscale/component/dilated_attention.py:113-144``) weights each branch
by the softmax of its per-token LSE, so the kernel must expose LSE both in
the forward and as a residual for the backward.

Differences from the reference kernel, by design:

* **Explicit key masking.** The reference lets zero-padded segment tokens
  participate in softmax (quirk of ``dilated_attention.py:96-101``). Here
  padded keys are excluded via an additive bias of ``NEG_INF``, which is
  required for bucketed static-shape batching on TPU.
* **No dropout** inside the kernel: every LongNet config sets
  ``attention_dropout: 0.0``.
* Layout is ``(batch*heads, length, head_dim)`` — contiguous on the TPU
  (sublane, lane) tiling; softmax statistics are carried in fp32 VMEM
  scratch across the k-block grid dimension.

A pure-XLA reference implementation (:func:`flash_attention_reference`)
with identical semantics is used on CPU (tests / virtual-device meshes)
and as the numerical oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG_INF = -1e9
_MASK_THRESHOLD = NEG_INF * 0.5

# Global kernel-choice override: 'auto' (Pallas on TPU), 'pallas', 'xla'.
# GSPMD sequence-parallel runs force 'xla' so the compiler can partition
# the attention einsums; Pallas calls are device-local (use shard_map).
_FLASH_MODE = "auto"


def set_flash_mode(mode: str) -> None:
    global _FLASH_MODE
    assert mode in ("auto", "pallas", "xla"), mode
    _FLASH_MODE = mode


def get_flash_mode() -> str:
    return _FLASH_MODE


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(requested: int, length: int) -> int:
    """Pick a kernel block size for an axis of ``length``.

    Tile sizes for the (1, 1, b) aux blocks must be 128-divisible or
    cover the whole (padded) axis. Among the 128-multiple candidates
    ≤ ``requested`` (and ≥ 512 to bound grid overhead), prefer the one
    minimizing the padded length — flash FLOPs scale with
    ``round_up(L, bq) * round_up(L, bk)``, so e.g. L=1280 with a 1024
    block pads to 2048 (2.56x the work) while a 640 block is exact.
    """
    if requested >= length:
        return _round_up(length, 8)
    best = _round_up(requested, 128)
    best_pad = _round_up(length, best)
    for b in range(512, requested + 1, 128):
        pad = _round_up(length, b)
        if pad < best_pad or (pad == best_pad and b > best):
            best, best_pad = b, pad
    return best


def _mm_precision(dtype):
    """Matmul precision for kernel dots, chosen by input dtype.

    fp32 inputs at Mosaic DEFAULT run as single bf16 MXU passes
    (measured ~2.8e-3 relative error) -- HIGHEST restores exact fp32.
    bf16 inputs are natively exact on the MXU with an fp32 accumulator,
    so DEFAULT already loses nothing and stays on the fast path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, scale: float, nk: int, has_bias: bool):
    if has_bias:
        (q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
         acc_ref, m_ref, l_ref) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, lse_ref,
         acc_ref, m_ref, l_ref) = refs
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                      # (bq, d)
    k = k_ref[0]                      # (bk, d)
    v = v_ref[0]                      # (bk, d)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    s = s * scale
    if has_bias:
        s = s + bias_ref[0]           # (1, bk) additive, 0 or NEG_INF

    m_prev = m_ref[:, :1]             # (bq, 1)
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    if has_bias:
        # Exact zero for masked keys: when every key in the block is
        # masked the row max equals NEG_INF and exp(0)=1 would otherwise
        # leak mass.
        p = jnp.where(bias_ref[0] > _MASK_THRESHOLD, p, 0.0)
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


def _fwd_pallas(q, k, v, bias, scale, block_q, block_k):
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    bq = _pick_block(block_q, Lq)
    bk = _pick_block(block_k, Lk)
    Lqp, Lkp = _round_up(Lq, bq), _round_up(Lk, bk)
    has_bias = bias is not None
    if Lqp != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lqp - Lq), (0, 0)))
    if Lkp != Lk:
        k = jnp.pad(k, ((0, 0), (0, Lkp - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lkp - Lk), (0, 0)))
        if not has_bias:
            # key padding introduced here must still be masked out
            bias = jnp.zeros((BH, Lk), jnp.float32)
            has_bias = True
        bias = jnp.pad(bias, ((0, 0), (0, Lkp - Lk)),
                       constant_values=NEG_INF)
    nq, nk = Lqp // bq, Lkp // bk
    # TPU blocks need the 2nd-to-last dim divisible by 8 (or full): carry
    # per-token scalars as (BH, 1, L) so blocks are (1, 1, bk)/(1, 1, bq).
    in_specs = [
        pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
    ]
    operands = [q, k, v]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)))
        operands.append(bias[:, None, :])

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nk=nk,
                          has_bias=has_bias),
        grid=(BH, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lqp, D), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, Lqp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
    )(*operands)
    return out[:, :Lq], lse[:, 0, :Lq]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
               dq_ref, acc_ref, *, scale: float, nk: int):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias = bias_ref[0]                       # (1, bk)
    lse = lse_ref[0].reshape(-1, 1)          # (bq, 1)
    delta = delta_ref[0].reshape(-1, 1)      # (bq, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    s = s * scale + bias
    p = jnp.exp(s - lse)
    p = jnp.where(bias > _MASK_THRESHOLD, p, 0.0)
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


def _dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float, nq: int):
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bias_col = bias_ref[0].reshape(-1, 1)    # (bk, 1)
    lse = lse_ref[0]                         # (1, bq)
    delta = delta_ref[0]                     # (1, bq)

    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
        precision=_mm_precision(k.dtype))
    st = st * scale + bias_col               # (bk, bq)
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


def _bwd_pallas(scale, block_q, block_k, res, grads):
    q, k, v, bias, out, lse = res
    do, _ = grads
    BH, Lq, D = q.shape
    Lk = k.shape[1]
    bias_was_none = bias is None
    if bias_was_none:
        bias = jnp.zeros((BH, Lk), jnp.float32)
    bq = _pick_block(block_q, Lq)
    bk = _pick_block(block_k, Lk)
    Lqp, Lkp = _round_up(Lq, bq), _round_up(Lk, bk)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                                   # (BH, Lq)
    if Lqp != Lq:
        pad_q = ((0, 0), (0, Lqp - Lq), (0, 0))
        q = jnp.pad(q, pad_q)
        do = jnp.pad(do, pad_q)
        # padded query rows: lse=NEG_INF would make exp overflow; use 0 with
        # do=0 so they contribute nothing.
        lse = jnp.pad(lse, ((0, 0), (0, Lqp - Lq)))
        delta = jnp.pad(delta, ((0, 0), (0, Lqp - Lq)))
    if Lkp != Lk:
        pad_k = ((0, 0), (0, Lkp - Lk), (0, 0))
        k = jnp.pad(k, pad_k)
        v = jnp.pad(v, pad_k)
        bias = jnp.pad(bias, ((0, 0), (0, Lkp - Lk)),
                       constant_values=NEG_INF)
    nq, nk = Lqp // bq, Lkp // bk
    bias = bias[:, None, :]
    lse = lse[:, None, :]
    delta = delta[:, None, :]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, nk=nk),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Lqp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
    )(q, k, v, bias, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, nq=nq),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, j, i: (b, 0, j)),
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lkp, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Lkp, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
    )(q, k, v, bias, do, lse, delta)

    # bias is a mask, not a learned tensor — zero cotangent. The lse output
    # is likewise treated as non-differentiable: the dilated branch mixer
    # applies stop_gradient to its lse-derived weights, matching the
    # reference's torch.no_grad at dilated_attention.py:132-137.
    dbias = None if bias_was_none else jnp.zeros_like(bias)
    return (dq[:, :Lq], dk[:, :Lk], dv[:, :Lk], dbias)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_pallas(q, k, v, bias, scale, block_q, block_k):
    return _fwd_pallas(q, k, v, bias, scale, block_q, block_k)


def _flash_pallas_fwd(q, k, v, bias, scale, block_q, block_k):
    out, lse = _fwd_pallas(q, k, v, bias, scale, block_q, block_k)
    # Name the kernel outputs so remat policies
    # (save_only_these_names("flash_out", "flash_lse"), see
    # models/longnet.py) keep them as residuals: the backward then reuses
    # them instead of re-running the forward kernel per layer.
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return (out, lse), (q, k, v, bias, out, lse)


_flash_pallas.defvjp(_flash_pallas_fwd, _bwd_pallas)


def flash_attention_reference(q, k, v, bias=None, scale=None):
    """Pure-XLA oracle with semantics identical to the Pallas kernel.

    ``q``: (B, L_q, D); ``k``/``v``: (B, L_k, D); ``bias``: (B, L_k)
    additive (0 for valid keys / ``NEG_INF`` for masked). B is typically
    batch*heads. Returns ``(out (B, L_q, D), lse (B, L_q))``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # HIGHEST is load-bearing: at TPU DEFAULT precision these fp32
    # einsums run as bf16 MXU passes (~1e-3 relative), which is larger
    # than the Pallas kernels' own error — the oracle must be the more
    # precise side of every parity test.
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * scale
    if bias is not None:
        s = s + bias[:, None, :].astype(jnp.float32)
        valid = (bias > _MASK_THRESHOLD)[:, None, :]
    else:
        valid = jnp.ones(s.shape[:1] + (1,) + s.shape[2:], bool)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l > 0.0, l, 1.0)
    out = jnp.einsum("bqk,bkd->bqd", p / l_safe,
                     v.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST).astype(q.dtype)
    lse = jnp.where(l[..., 0] > 0.0, m[..., 0] + jnp.log(l_safe[..., 0]),
                    NEG_INF)
    return out, lse


def flash_attention(q, k, v, bias=None, scale=None, *,
                    block_q: int = 1024, block_k: int = 1024,
                    use_pallas: Optional[bool] = None):
    """Flash attention returning ``(out, lse)``.

    Args:
      q: ``(B, L_q, D)`` queries (B usually = batch * heads).
      k, v: ``(B, L_k, D)`` keys / values.
      bias: optional ``(B, L_k)`` additive key bias; ``NEG_INF`` masks a key.
      scale: softmax scale; defaults to ``D ** -0.5``.
      block_q / block_k: Pallas tile sizes along the two length axes.
      use_pallas: force kernel choice; defaults to Pallas on TPU backends.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scale = float(scale)
    if use_pallas is None:
        if _FLASH_MODE == "xla":
            use_pallas = False
        elif _FLASH_MODE == "pallas":
            use_pallas = True
        else:
            use_pallas = pltpu is not None and \
                jax.default_backend() == "tpu"
    if not use_pallas:
        return flash_attention_reference(q, k, v, bias, scale)
    if bias is not None:
        bias = bias.astype(jnp.float32)
    return _flash_pallas(q, k, v, bias, scale, block_q, block_k)
