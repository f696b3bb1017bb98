"""gelu_exact vs the naive fp32 composition it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.ops.activations import gelu_exact


def _naive(t):
    return jax.nn.gelu(t.astype(jnp.float32),
                       approximate=False).astype(t.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gelu_exact_value_and_grad(dtype):
    x = jnp.asarray(np.random.RandomState(0).randn(256, 129) * 3.0,
                    dtype)
    g = jnp.asarray(np.random.RandomState(1).randn(256, 129), dtype)

    v1, v2 = gelu_exact(x), _naive(x)
    # identical fp32 math; backends may differ by an erf ulp pre-cast
    np.testing.assert_allclose(np.asarray(v1, np.float32),
                               np.asarray(v2, np.float32),
                               rtol=1e-2, atol=4e-5)

    g1 = jax.vjp(gelu_exact, x)[1](g)[0]
    g2 = jax.vjp(_naive, x)[1](g)[0]
    # the VJP evaluates cdf + x*pdf at the same fp32 points autodiff
    # does; association order differs, so bf16 casts can shift one ulp
    tol = dict(rtol=1e-2, atol=5e-3) if dtype == jnp.bfloat16 else \
        dict(rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g1, np.float32),
                               np.asarray(g2, np.float32), **tol)


def test_gelu_exact_under_jit_and_remat():
    x = jnp.asarray(np.random.RandomState(2).randn(64, 64), jnp.bfloat16)

    @jax.jit
    def loss(t):
        return jnp.sum(jax.checkpoint(gelu_exact)(t).astype(jnp.float32)
                       ** 2)

    g1 = jax.grad(loss)(x)
    g2 = jax.grad(lambda t: jnp.sum(
        _naive(t).astype(jnp.float32) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1, np.float32),
                               np.asarray(g2, np.float32),
                               rtol=2e-2, atol=2e-2)
