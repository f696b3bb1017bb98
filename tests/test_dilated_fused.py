"""Fused dilated attention vs the XLA oracle (ops/dilated.py).

The fused Pallas path must match ``dilated_attention`` (the re-derived
reference semantics, itself tested against a brute-force oracle in
test_dilated.py) in both forward values and gradients. On CPU the
kernels run in interpret mode; with MODALTUNE_TEST_BACKEND=tpu they run
compiled on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.ops.dilated import dilated_attention
from modaltune_tpu.ops.dilated_fused import (fused_dilated_attention,
                                             fused_eligible, make_plans)

INTERPRET = jax.default_backend() != "tpu"
TOL = 2e-5 if INTERPRET else 5e-3

# Covers all three layout modes: slc (64,1), comb multi-chunk (128,2),
# comb single-chunk clamped (512->256, 4), gather (96,2).
S, H, D = 256, 4, 32
SEGS = (64, 128, 512, 96)
RATIOS = (1, 2, 4, 2)


def _inputs(seed=0, masked=True, B=2):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    if masked:
        lens = rng.randint(S // 2, S + 1, size=B)
        mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])
    else:
        mask = None
    return q, k, v, mask


def test_eligibility():
    assert fused_eligible(S, H, D, SEGS, RATIOS)
    R, plans = make_plans(S, SEGS, RATIOS)
    assert [p.mode for p in plans] == ["slc", "comb", "comb", "crd"]
    # flagship geometry (bucket 10240, GigaPath schedule)
    assert fused_eligible(10240, 16, 48,
                          (1024, 5792, 32768, 185363, 1048576),
                          (1, 2, 4, 8, 16))
    # ineligible: no r=1 branch
    assert not fused_eligible(S, H, D, (128,), (2,))
    # ineligible: heads not divisible by ratio
    assert not fused_eligible(S, 3, D, SEGS, RATIOS)


@pytest.mark.parametrize("masked", [True, False])
def test_forward_matches_oracle(masked):
    q, k, v, mask = _inputs(0, masked)
    want = dilated_attention(q, k, v, segment_lengths=SEGS,
                             dilated_ratios=RATIOS, mask=mask,
                             use_pallas=False)
    got = fused_dilated_attention(q, k, v, segment_lengths=SEGS,
                                  dilated_ratios=RATIOS, mask=mask,
                                  interpret=INTERPRET)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    if masked:
        m = np.asarray(mask)[:, :, None, None]
        w, g = w * m, g * m
    np.testing.assert_allclose(g, w, atol=TOL, rtol=TOL)


@pytest.mark.slow  # fused path is the non-mega fallback; fwd parity stays fast
def test_grads_match_oracle_small():
    """Reduced-geometry gradient parity (fast-suite variant of
    test_grads_match_oracle: same code paths — slc + comb + gather
    modes — at 1/4 the sequence)."""
    S2 = 64
    segs, ratios = (16, 32, 48), (1, 2, 2)
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(2, S2, 4, 16), jnp.float32)
    mask = jnp.asarray(np.arange(S2)[None, :] <
                       np.array([40, 64])[:, None])
    cot = jax.random.normal(jax.random.PRNGKey(5), q.shape) * \
        mask[:, :, None, None]

    f_ref = lambda x: jnp.sum(dilated_attention(
        x, x, x, segment_lengths=segs, dilated_ratios=ratios,
        mask=mask, use_pallas=False) * cot)
    f_fus = lambda x: jnp.sum(fused_dilated_attention(
        x, x, x, segment_lengths=segs, dilated_ratios=ratios,
        mask=mask, interpret=INTERPRET) * cot)
    gw = jax.grad(f_ref)(q)
    gg = jax.grad(f_fus)(q)
    mm = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(gg) * mm, np.asarray(gw) * mm,
                               atol=TOL * 10, rtol=TOL * 10)


@pytest.mark.slow
def test_grads_match_oracle():
    q, k, v, mask = _inputs(1, True)
    key = jax.random.PRNGKey(3)
    cot = jax.random.normal(key, q.shape, q.dtype) * \
        mask[:, :, None, None]

    def loss(fn, *args):
        out = fn(*args)
        return jnp.sum(out * cot)

    f_ref = lambda q, k, v: dilated_attention(
        q, k, v, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, use_pallas=False)
    f_fused = lambda q, k, v: fused_dilated_attention(
        q, k, v, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, interpret=INTERPRET)

    gw = jax.grad(lambda a, b, c: loss(f_ref, a, b, c),
                  argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(lambda a, b, c: loss(f_fused, a, b, c),
                  argnums=(0, 1, 2))(q, k, v)
    for name, w, g in zip("qkv", gw, gg):
        w = np.asarray(w) * np.asarray(mask)[:, :, None, None]
        g = np.asarray(g) * np.asarray(mask)[:, :, None, None]
        np.testing.assert_allclose(
            g, w, atol=TOL * 10, rtol=TOL * 10,
            err_msg=f"d{name} mismatch")


def test_bf16_forward():
    q, k, v, mask = _inputs(2, True)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = dilated_attention(q, k, v, segment_lengths=SEGS,
                             dilated_ratios=RATIOS, mask=mask,
                             use_pallas=False)
    got = fused_dilated_attention(q, k, v, segment_lengths=SEGS,
                                  dilated_ratios=RATIOS, mask=mask,
                                  interpret=INTERPRET)
    assert got.dtype == jnp.bfloat16
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(got, np.float32) * m,
        np.asarray(want, np.float32) * m, atol=0.05, rtol=0.05)


def test_all_training_buckets_eligible():
    """Every DEFAULT_BUCKETS size (+cls) must take the fused path with
    the flagship GigaPath schedule — a silent fallback would tank
    training throughput."""
    from modaltune_tpu.data.datasets import DEFAULT_BUCKETS
    segs = (1024, 5792, 32768, 185363, 1048576)
    ratios = (1, 2, 4, 8, 16)
    for b in DEFAULT_BUCKETS:
        assert fused_eligible(b + 1, 16, 48, segs, ratios), b


@pytest.mark.slow
def test_flagship_bucket_4096_matches_oracle():
    """Oracle parity at the smallest common training bucket (S=4096,
    where the 5792 branch clamps to 'comb' mode instead of 'crd')."""
    S2, H2, D2 = 4096, 16, 48
    segs = (1024, 5792, 32768, 185363, 1048576)
    ratios = (1, 2, 4, 8, 16)
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(1, S2, H2, D2), jnp.float32)
    k = jnp.asarray(rng.randn(1, S2, H2, D2), jnp.float32)
    v = jnp.asarray(rng.randn(1, S2, H2, D2), jnp.float32)
    mask = jnp.asarray((np.arange(S2) < 3900)[None])
    want = dilated_attention(q, k, v, segment_lengths=segs,
                             dilated_ratios=ratios, mask=mask,
                             use_pallas=False)
    got = fused_dilated_attention(q, k, v, segment_lengths=segs,
                                  dilated_ratios=ratios, mask=mask,
                                  interpret=INTERPRET)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got) * m,
                               np.asarray(want) * m,
                               atol=TOL * 3, rtol=TOL * 3)


@pytest.mark.slow
def test_edge_masks_and_bf16_grads():
    """Degenerate masks (nearly-empty and full rows in one batch) keep
    outputs/grads finite and matching the oracle; bf16 gradients track
    the fp32 ones."""
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(2, S, H, D), jnp.float32)
    lens = np.array([8, S])          # one nearly-empty bag, one full
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    def loss(fn, x):
        out = fn(x) * mask[:, :, None, None]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    f_ref = lambda x: dilated_attention(
        x, x, x, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, use_pallas=False)
    f_fus = lambda x: fused_dilated_attention(
        x, x, x, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, interpret=INTERPRET)
    gw = jax.grad(lambda x: loss(f_ref, x))(q)
    gg = jax.grad(lambda x: loss(f_fus, x))(q)
    assert np.all(np.isfinite(np.asarray(gg)))
    mm = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(gg) * mm, np.asarray(gw) * mm,
                               atol=5e-4, rtol=5e-4)

    # bf16 path: finite and within bf16 distance of fp32 grads
    qb = q.astype(jnp.bfloat16)
    gb = jax.grad(lambda x: loss(f_fus, x))(qb)
    gb = np.asarray(gb, np.float32) * mm
    assert np.all(np.isfinite(gb))
    ref = np.asarray(gg, np.float32) * mm
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(gb - ref).max() / denom < 0.1
