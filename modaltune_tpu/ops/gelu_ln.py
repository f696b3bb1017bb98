"""Fused exact-GELU -> LayerNorm for the FFN inner chain.

The reference FFN (``feedforward_network.py:105-143``) computes
``fc2(ffn_layernorm(activation_fn(fc1(x).float())))`` with subln
enabled. As separate XLA ops the chain between the two matmuls costs
five HBM passes over the (rows, ffn_dim) tensor per layer per
direction (fc1-out write, gelu read+write, LN stats read, LN
normalize read+write) — ``gelu_exact``'s custom VJP is opaque to XLA
fusion, so nothing merges. At bench geometry that tensor is 189 MB
(bf16, 3x10240x3072) and the chain dominated the round-4 trace's
elementwise-fusion pool (docs/perf_analysis_r4.md).

``gelu_ln`` runs the whole chain in one Pallas kernel: ONE read of the
fc1 output and ONE write of the normalized activation, with the fp32
GELU, the bf16 materialization round-trip, and the LayerNorm stats all
in VMEM. The custom VJP saves only the bf16 fc1 output (which the fc1
matmul materializes anyway) and recomputes gelu/stats in-register in
the backward — 2 reads + 1 write there, plus the (F,)-sized
dgamma/dbeta accumulated across grid steps in VMEM.

Numerics mirror the unfused chain exactly op-for-op: fp32 erf GELU,
round to the operand dtype (the materialization boundary between
``gelu_exact`` and the LN), flax's fast-variance fp32 stats
(``var = max(0, E[x^2] - E[x]^2)``), fp32 normalize + affine, cast
back. The backward applies the analytic LayerNorm gradient and the
same dtype rounding at the op boundary.

STATUS: measured rejection. The one-process end-to-end A/B
(tools/sweep_step.py, bench geometry) put the fused kernel at
569.8 ms/step vs 554.4 unfused — XLA's own fusion of the chain is
already at the bandwidth floor and the extra launch + backward erf
recompute loses. Kept off the hot path (opt-in via
MODALTUNE_FUSED_GELU_LN=1) as the measured-rejection record, same
precedent as ops/dilated_fast.py; see docs/perf_analysis_r4.md.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .dilated_fused import _kernel_params
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

    def _kernel_params():
        return None

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _gelu_f32(x32):
    return 0.5 * x32 * (1.0 + jax.lax.erf(x32 * _INV_SQRT2))


# Mosaic has no erf lowering; evaluate XLA's own f32 erf rational
# polynomial in-kernel (coefficients from openxla math.cc ErfImpl32 —
# the same minimax rational P(x^2)/Q(x^2) XLA expands lax.erf to, so
# kernel values agree with the unfused chain to ~1 f32 ulp).
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145,
              1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 0.000023547966471313185,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)
_ERF_CLAMP = 3.832506856900711       # erfinv(1 - 2^-23)


def _poly(x, coeffs):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def _erf_kernel(x32):
    x = jnp.clip(x32, -_ERF_CLAMP, _ERF_CLAMP)
    x2 = x * x
    return (x * _poly(x2, _ERF_ALPHA)) / _poly(x2, _ERF_BETA)


def _gelu_f32_kernel(x32):
    return 0.5 * x32 * (1.0 + _erf_kernel(x32 * _INV_SQRT2))


def gelu_ln_ref(x, scale, bias, *, eps: float = 1e-5):
    """XLA composition oracle: ``gelu_exact`` then flax-semantics LN
    (fp32 fast-variance stats, fp32 affine, cast to x.dtype)."""
    g = _gelu_f32(x.astype(jnp.float32)).astype(x.dtype)
    g32 = g.astype(jnp.float32)
    mu = jnp.mean(g32, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(g32 * g32, axis=-1, keepdims=True) - mu * mu)
    y = (g32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _pick_bn(n: int, max_bn: int = 512) -> int:
    """Largest row-block <= max_bn dividing n. The backward holds ~8
    live (bn, F) fp32 temps (gelu/stats/xhat/grad chains) in scoped
    VMEM, so its blocks stay at 256 rows (512 hit the 16 MB scoped cap
    at F=3072: compiler reported 18.02M); the leaner forward takes
    512."""
    for bn in (512, 256, 128, 64, 32, 16, 8):
        if bn <= max_bn and n % bn == 0:
            return bn
    return 0


def gelu_ln_eligible(n_rows: int, f: int) -> bool:
    return (pl is not None and f % 128 == 0 and f <= 8192
            and _pick_bn(n_rows) > 0)


def _fwd_kernel(eps, x_ref, s_ref, b_ref, y_ref):
    x32 = x_ref[...].astype(jnp.float32)
    g = _gelu_f32_kernel(x32).astype(x_ref.dtype).astype(jnp.float32)
    mu = jnp.mean(g, axis=1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(g * g, axis=1, keepdims=True)
                      - mu * mu)
    y = (g - mu) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(eps, x_ref, s_ref, dy_ref, dx_ref, dg_ref, db_ref):
    i = pl.program_id(0)
    x32 = x_ref[...].astype(jnp.float32)
    g = _gelu_f32_kernel(x32).astype(x_ref.dtype).astype(jnp.float32)
    mu = jnp.mean(g, axis=1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(g * g, axis=1, keepdims=True)
                      - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (g - mu) * rstd
    dy32 = dy_ref[...].astype(jnp.float32)
    dyg = dy32 * s_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dyg, axis=1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=1, keepdims=True)
    # analytic LN input grad; round to operand dtype at the op
    # boundary (the unfused chain hands gelu_exact a bf16 cotangent)
    dgb = (rstd * (dyg - m1 - xhat * m2)).astype(
        x_ref.dtype).astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_kernel(x32 * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * x32 * x32) * _INV_SQRT_2PI
    dx_ref[...] = (dgb * (cdf + x32 * pdf)).astype(dx_ref.dtype)
    dg_part = jnp.sum(dy32 * xhat, axis=0, keepdims=True)
    db_part = jnp.sum(dy32, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = dg_part
        db_ref[...] = db_part

    @pl.when(i > 0)
    def _acc():
        dg_ref[...] += dg_part
        db_ref[...] += db_part


def _fwd_call(x2, s2, b2, eps: float, interpret: bool):
    n, f = x2.shape
    bn = _pick_bn(n)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, f), lambda i: (i, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, f), x2.dtype),
        # the chain of fp32 gelu/stats temps exceeds the 16 MB default
        # scoped-VMEM cap; share the raised limit with the mega kernels
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(x2, s2, b2)


def _bwd_call(x2, s2, dy2, eps: float, interpret: bool):
    n, f = x2.shape
    bn = _pick_bn(n, max_bn=256)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, f), lambda i: (i, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((bn, f), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, f), lambda i: (i, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, f), x2.dtype),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        compiler_params=_kernel_params(),
        interpret=interpret,
    )(x2, s2, dy2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gelu_ln_p(x2, s2, b2, eps: float, interpret: bool):
    return _fwd_call(x2, s2, b2, eps, interpret)


def _gelu_ln_fwd(x2, s2, b2, eps, interpret):
    return _fwd_call(x2, s2, b2, eps, interpret), (x2, s2)


def _gelu_ln_bwd(eps, interpret, res, dy2):
    x2, s2 = res
    dx, dg, db = _bwd_call(x2, s2, dy2, eps, interpret)
    return dx, dg.astype(s2.dtype), db.astype(s2.dtype)


_gelu_ln_p.defvjp(_gelu_ln_fwd, _gelu_ln_bwd)


def gelu_ln(x, scale, bias, *, eps: float = 1e-5,
            interpret: Optional[bool] = None):
    """Fused exact-GELU + LayerNorm over the last axis.

    ``x``: (..., F); ``scale``/``bias``: (F,). Falls back to the XLA
    composition when Pallas/TPU is unavailable or the shape is
    ineligible. ``interpret=None`` auto-selects interpret mode off-TPU.
    """
    f = x.shape[-1]
    n = 1
    for d in x.shape[:-1]:
        n *= d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pl is None or not gelu_ln_eligible(n, f):
        return gelu_ln_ref(x, scale, bias, eps=eps)
    x2 = x.reshape(n, f)
    s2 = scale.reshape(1, f)
    b2 = bias.reshape(1, f)
    y = _gelu_ln_p(x2, s2, b2, float(eps), bool(interpret))
    return y.reshape(x.shape)
