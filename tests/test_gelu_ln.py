"""Fused exact-GELU + LayerNorm kernel (ops/gelu_ln.py) vs the unfused
composition (ops/activations.gelu_exact + flax nn.LayerNorm) — the
chain it replaces in FeedForwardNetwork
(``feedforward_network.py:105-143``)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.ops.activations import gelu_exact
from modaltune_tpu.ops.gelu_ln import gelu_ln, gelu_ln_eligible

INTERPRET = jax.default_backend() != "tpu"
N, F = 96, 512
EPS = 1e-5


class _Unfused(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = gelu_exact(x)
        return nn.LayerNorm(epsilon=EPS, dtype=x.dtype, name="ln")(x)


def _setup(dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, N // 2, F) * 2.0, dtype)
    scale = jnp.asarray(rng.rand(F) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(F) * 0.1, jnp.float32)
    params = {"params": {"ln": {"scale": scale, "bias": bias}}}
    cot = jnp.asarray(rng.randn(2, N // 2, F), dtype)
    return x, scale, bias, params, cot


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_unfused(dtype):
    x, scale, bias, params, _ = _setup(dtype)
    ref = _Unfused().apply(params, x)
    got = gelu_ln(x, scale, bias, eps=EPS, interpret=INTERPRET)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_backward_matches_unfused(dtype):
    x, scale, bias, params, cot = _setup(dtype)

    def f_ref(x, s, b):
        p = {"params": {"ln": {"scale": s, "bias": b}}}
        return jnp.sum(_Unfused().apply(p, x).astype(jnp.float32) *
                       cot.astype(jnp.float32))

    def f_got(x, s, b):
        return jnp.sum(gelu_ln(x, s, b, eps=EPS, interpret=INTERPRET)
                       .astype(jnp.float32) * cot.astype(jnp.float32))

    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    gg = jax.grad(f_got, argnums=(0, 1, 2))(x, scale, bias)
    # dx is elementwise -> tight; dgamma/dbeta are row-sum reductions
    # whose order differs (per-block partials), looser in bf16
    tols = ((1e-5, 1e-5), (2e-3, 1e-3), (2e-3, 1e-3)) \
        if dtype == jnp.float32 else \
        ((3e-2, 2e-2), (2e-1, 2e-2), (2e-1, 2e-2))
    for name, r, g, (atol, rtol) in zip(
            ("dx", "dgamma", "dbeta"), gr, gg, tols):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(r, np.float32),
            atol=atol, rtol=rtol, err_msg=f"{name} mismatch")


def test_eligibility_and_fallback():
    assert gelu_ln_eligible(30720, 3072)
    assert gelu_ln_eligible(8, 128)
    assert not gelu_ln_eligible(30720, 3000)   # F not 128-multiple
    assert not gelu_ln_eligible(13, 3072)      # rows not 8-divisible
    # ineligible shapes fall back to the XLA composition (same values)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 5, 384),
                    jnp.float32)
    s = jnp.ones((384,), jnp.float32)
    b = jnp.zeros((384,), jnp.float32)
    p = {"params": {"ln": {"scale": s, "bias": b}}}
    np.testing.assert_allclose(
        np.asarray(gelu_ln(x, s, b, eps=EPS)),
        np.asarray(_Unfused().apply(p, x)), atol=1e-6, rtol=1e-6)


def test_ffn_module_fused_path_matches_unfused(monkeypatch):
    """FeedForwardNetwork with the fused kernel forced (opt-in env +
    interpret mode off-TPU) matches the unfused module
    bit-for-tolerance, with an identical param tree."""
    monkeypatch.setenv("MODALTUNE_FUSED_GELU_LN", "1")
    monkeypatch.setenv("MODALTUNE_PALLAS_INTERPRET", "1")
    from modaltune_tpu.configs import LongNetConfig
    from modaltune_tpu.models.longnet import FeedForwardNetwork

    cfg = LongNetConfig(embed_dim=256, ffn_dim=512, num_heads=4,
                        num_layers=1, subln=True)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 256),
                    jnp.float32)
    m = FeedForwardNetwork(cfg, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y_fused = m.apply(params, x)

    monkeypatch.setenv("MODALTUNE_PALLAS_INTERPRET", "0")
    y_ref = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
