"""Memory-lean exact GELU.

The reference computes every FFN activation in fp32
(``feedforward_network.py:105-143``: ``activation_fn(x.float())``).
Naive autodiff of ``gelu(x.astype(f32)).astype(bf16)`` makes XLA save a
**fp32 copy of the (rows, ffn_dim) activation tensor** for the backward
— at the flagship geometry that is a 377 MB HBM round-trip per layer
per step (measured: the dominant non-kernel pool in the round-3 trace,
docs/perf_analysis_r3.md).

``gelu_exact`` computes the same fp32 erf forward, but its custom VJP
re-derives ``gelu'(x)`` in the backward from the *bf16 input* (which is
the fc1 matmul output and exists anyway), so nothing fp32 is ever
materialized. Numerically identical to the naive composition: the fp32
gelu input is already bf16-valued, and autodiff's derivative
``cdf + x * pdf`` is evaluated at exactly the same points.
"""

import math

import jax
import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _gelu_val(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf * _INV_SQRT2))).astype(
        x.dtype)


@jax.custom_vjp
def gelu_exact(x):
    """Exact (erf) GELU in fp32 math, input-dtype output, with a
    residual-lean VJP (saves only ``x``)."""
    return _gelu_val(x)


def _fwd(x):
    return _gelu_val(x), x


def _bwd(x, g):
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(xf * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * xf * xf) * _INV_SQRT_2PI
    return ((g.astype(jnp.float32) * (cdf + xf * pdf)).astype(g.dtype),)


gelu_exact.defvjp(_fwd, _bwd)
