"""Flash-attention kernel tests: XLA reference vs numpy oracle, and (on
TPU) Pallas vs XLA reference, forward + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.ops import NEG_INF, flash_attention, flash_attention_reference

from conftest import requires_tpu


def numpy_oracle(q, k, v, bias=None, scale=None):
    q, k, v = np.asarray(q, np.float64), np.asarray(k, np.float64), np.asarray(v, np.float64)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = np.einsum("bqd,bkd->bqk", q, k) * scale
    if bias is not None:
        s = s + np.asarray(bias, np.float64)[:, None, :]
        valid = np.asarray(bias)[:, None, :] > NEG_INF * 0.5
    else:
        valid = np.ones_like(s, bool)
    m = s.max(-1, keepdims=True)
    p = np.where(valid, np.exp(s - m), 0.0)
    l = p.sum(-1, keepdims=True)
    l_safe = np.where(l > 0, l, 1.0)
    out = np.einsum("bqk,bkd->bqd", p / l_safe, v)
    lse = np.where(l[..., 0] > 0, m[..., 0] + np.log(l_safe[..., 0]), NEG_INF)
    return out, lse


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("lq,lk", [(64, 64), (33, 57), (128, 16)])
def test_reference_matches_numpy(lq, lk):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    b, d = 3, 32
    q = _rand((b, lq, d), keys[0])
    k = _rand((b, lk, d), keys[1])
    v = _rand((b, lk, d), keys[2])
    mask = jax.random.bernoulli(keys[3], 0.8, (b, lk))
    mask = mask.at[:, 0].set(True)  # at least one valid key per row
    bias = jnp.where(mask, 0.0, NEG_INF)
    with jax.default_matmul_precision("highest"):
        out, lse = flash_attention_reference(q, k, v, bias)
    out_np, lse_np = numpy_oracle(q, k, v, bias)
    # 'highest' on this TPU still shows ~1e-4 fp32 noise
    tol = 5e-4 if jax.default_backend() == "tpu" else 1e-5
    np.testing.assert_allclose(out, out_np, atol=tol, rtol=tol)
    np.testing.assert_allclose(lse, lse_np, atol=tol, rtol=tol)


def test_fully_masked_rows_are_finite():
    b, l, d = 2, 16, 8
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand((b, l, d), keys[0])
    k = _rand((b, l, d), keys[1])
    v = _rand((b, l, d), keys[2])
    bias = jnp.full((b, l), NEG_INF)
    out, lse = flash_attention_reference(q, k, v, bias)
    assert np.all(np.isfinite(out))
    assert np.all(lse == NEG_INF)


def test_reference_gradients_finite_and_masked():
    b, l, d = 2, 24, 16
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = _rand((b, l, d), keys[0])
    k = _rand((b, l, d), keys[1])
    v = _rand((b, l, d), keys[2])
    mask = jnp.arange(l)[None, :] < jnp.array([[16], [24]])
    bias = jnp.where(mask, 0.0, NEG_INF)

    def loss(q, k, v):
        out, _ = flash_attention_reference(q, k, v, bias)
        return jnp.sum(out**2 * mask[..., None])

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (dq, dk, dv):
        assert np.all(np.isfinite(g))
    # masked keys get no gradient
    np.testing.assert_allclose(np.where(mask[..., None], 0.0, dk), 0.0)
    np.testing.assert_allclose(np.where(mask[..., None], 0.0, dv), 0.0)


@requires_tpu
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("lq,lk,d,bq,bk", [
    (256, 256, 48, 128, 128),   # LongNet head_dim, multi-block
    (1024, 1024, 48, 1024, 1024),  # single-block segment shape
    (100, 200, 64, 128, 128),   # ragged lengths (internal padding)
])
def test_pallas_matches_reference(dtype, lq, lk, d, bq, bk):
    b = 4
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    q = _rand((b, lq, d), keys[0], dtype)
    k = _rand((b, lk, d), keys[1], dtype)
    v = _rand((b, lk, d), keys[2], dtype)
    mask = jax.random.bernoulli(keys[3], 0.9, (b, lk))
    mask = mask.at[:, 0].set(True)
    bias = jnp.where(mask, 0.0, NEG_INF)

    out_p, lse_p = flash_attention(q, k, v, bias, use_pallas=True,
                                   block_q=bq, block_k=bk)
    with jax.default_matmul_precision("highest"):
        out_r, lse_r = flash_attention_reference(q, k, v, bias)
    # fp32 on the MXU is bf16-multipass; allow matching slack
    tol = 2e-2
    np.testing.assert_allclose(np.float32(out_p), np.float32(out_r),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(lse_p, lse_r, atol=1e-2, rtol=1e-3)


@requires_tpu
def test_pallas_no_bias_fast_path():
    """bias=None (full buckets) must match the masked path with an
    all-valid mask, forward and backward."""
    b, l, d = 3, 256, 48
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    q = _rand((b, l, d), keys[0])
    k = _rand((b, l, d), keys[1])
    v = _rand((b, l, d), keys[2])
    zeros_bias = jnp.zeros((b, l), jnp.float32)
    out_n, lse_n = flash_attention(q, k, v, None, use_pallas=True)
    out_b, lse_b = flash_attention(q, k, v, zeros_bias, use_pallas=True)
    np.testing.assert_allclose(out_n, out_b, atol=1e-6)
    np.testing.assert_allclose(lse_n, lse_b, atol=1e-6)

    def loss(fn_bias, q, k, v):
        out, _ = flash_attention(q, k, v, fn_bias, use_pallas=True)
        return jnp.sum(out ** 2)

    gn = jax.grad(loss, argnums=(1, 2, 3))(None, q, k, v)
    gb = jax.grad(loss, argnums=(1, 2, 3))(zeros_bias, q, k, v)
    for a, b_ in zip(gn, gb):
        np.testing.assert_allclose(a, b_, atol=1e-6)

    # non-multiple length with bias=None exercises the internal pad+mask
    out_p, _ = flash_attention(q[:, :200], k[:, :200], v[:, :200], None,
                               use_pallas=True, block_q=128, block_k=128)
    out_r, _ = flash_attention_reference(q[:, :200], k[:, :200],
                                         v[:, :200], None)
    np.testing.assert_allclose(np.float32(out_p), np.float32(out_r),
                               atol=2e-3, rtol=2e-3)


@requires_tpu
def test_pallas_gradients_match_reference():
    b, l, d = 2, 256, 48
    keys = jax.random.split(jax.random.PRNGKey(4), 4)
    q = _rand((b, l, d), keys[0])
    k = _rand((b, l, d), keys[1])
    v = _rand((b, l, d), keys[2])
    mask = jnp.arange(l)[None, :] < jnp.array([[200], [256]])
    bias = jnp.where(mask, 0.0, NEG_INF)
    tangent = _rand((b, l, d), keys[3])

    def loss(fn, q, k, v):
        out, _ = fn(q, k, v)
        return jnp.sum(out * tangent * mask[..., None])

    pallas_fn = lambda q, k, v: flash_attention(q, k, v, bias,
                                                use_pallas=True,
                                                block_q=128, block_k=128)
    ref_fn = lambda q, k, v: flash_attention_reference(q, k, v, bias)
    gp = jax.grad(lambda *a: loss(pallas_fn, *a), argnums=(0, 1, 2))(q, k, v)
    with jax.default_matmul_precision("highest"):
        gr = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(q, k, v)
    for p, r in zip(gp, gr):
        np.testing.assert_allclose(p, r, atol=5e-3, rtol=5e-3)
