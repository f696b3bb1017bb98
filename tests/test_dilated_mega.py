"""Mega-kernel dilated attention (ops/dilated_mega.py) vs the XLA
oracle. The mega kernel computes every branch + the LSE mix in one
Pallas call per (batch*head); these tests pin forward/gradient parity
against ``dilated_attention`` (itself oracle-tested in
test_dilated.py), including the aligned-window masking used for
segment boundaries that are not 8-row aligned (the flagship w=5792
case, scaled down here to w=80 -> 20 rows/slab)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.ops.dilated import dilated_attention
from modaltune_tpu.ops.dilated_mega import (mega_dilated_attention,
                                            mega_eligible, mega_mode)

INTERPRET = jax.default_backend() != "tpu"
TOL = 2e-5 if INTERPRET else 5e-3

S, H, D = 256, 4, 32
SEGS = (64, 128, 512, 96)     # slc, comb, comb(clamped), unaligned
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
    assert mega_eligible(S, H, D, SEGS, RATIOS)
    # flagship geometry (bucket 10240, GigaPath schedule): the w=5792
    # branch joins because 5792 = 16 * 362 (w % R == 0)
    assert mega_eligible(10240, 16, 48,
                         (1024, 5792, 32768, 185363, 1048576),
                         (1, 2, 4, 8, 16))
    # every default training bucket (+cls) is covered by some flavor:
    # monolithic BlockSpec-windowed kernels up to 16384; the 25600
    # flagship bucket's monolithic backward needs 164.5MB scoped VMEM
    # (compiler OOM report, v5e has 128MB physical) so it must route
    # to the HBM-resident-window backward instead
    from modaltune_tpu.data.datasets import DEFAULT_BUCKETS
    for b in DEFAULT_BUCKETS:
        want = "mono" if (b + 1) <= 16384 else "hbm_bwd"
        assert mega_mode(b + 1, 16, 48,
                         (1024, 5792, 32768, 185363, 1048576),
                         (1, 2, 4, 8, 16)) == want, b
    # ineligible: no r=1 branch / w not a multiple of R
    assert not mega_eligible(S, H, D, (128,), (2,))
    assert not mega_eligible(S, H, D, (64, 90), (1, 4))


@pytest.mark.parametrize("masked", [True, False])
def test_forward_matches_oracle(masked):
    q, k, v, mask = _inputs(0, masked)
    want = dilated_attention(q, k, v, segment_lengths=SEGS,
                             dilated_ratios=RATIOS, mask=mask,
                             use_pallas=False)
    got = mega_dilated_attention(q, k, v, segment_lengths=SEGS,
                                 dilated_ratios=RATIOS, mask=mask,
                                 interpret=INTERPRET)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    if masked:
        m = np.asarray(mask)[:, :, None, None]
        w, g = w * m, g * m
    np.testing.assert_allclose(g, w, atol=TOL, rtol=TOL)


def test_grads_match_oracle():
    q, k, v, mask = _inputs(1, True)
    cot = jax.random.normal(jax.random.PRNGKey(3), q.shape) * \
        mask[:, :, None, None]

    f_ref = lambda a, b, c: jnp.sum(dilated_attention(
        a, b, c, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, use_pallas=False) * cot)
    f_meg = lambda a, b, c: jnp.sum(mega_dilated_attention(
        a, b, c, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, interpret=INTERPRET) * cot)
    gw = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(f_meg, argnums=(0, 1, 2))(q, k, v)
    mm = np.asarray(mask)[:, :, None, None]
    for name, w, g in zip("qkv", gw, gg):
        np.testing.assert_allclose(
            np.asarray(g) * mm, np.asarray(w) * mm,
            atol=TOL * 10, rtol=TOL * 10, err_msg=f"d{name} mismatch")


@pytest.mark.slow  # unaligned geometry; aligned fwd+grad parity stays fast
def test_unaligned_windows_match_oracle():
    """A branch whose rows-per-slab is not 8-aligned (w=80 -> cw=20)
    exercises the aligned-window + iota-mask path on both sides of the
    boundary."""
    segs, ratios = (64, 80), (1, 2)
    q, k, v, mask = _inputs(4, True)
    want = dilated_attention(q, k, v, segment_lengths=segs,
                             dilated_ratios=ratios, mask=mask,
                             use_pallas=False)
    got = mega_dilated_attention(q, k, v, segment_lengths=segs,
                                 dilated_ratios=ratios, mask=mask,
                                 interpret=INTERPRET)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(got) * m,
                               np.asarray(want) * m,
                               atol=TOL, rtol=TOL)
    # and its gradient
    cot = jax.random.normal(jax.random.PRNGKey(8), q.shape) * \
        mask[:, :, None, None]
    gw = jax.grad(lambda x: jnp.sum(dilated_attention(
        x, x, x, segment_lengths=segs, dilated_ratios=ratios,
        mask=mask, use_pallas=False) * cot))(q)
    gg = jax.grad(lambda x: jnp.sum(mega_dilated_attention(
        x, x, x, segment_lengths=segs, dilated_ratios=ratios,
        mask=mask, interpret=INTERPRET) * cot))(q)
    np.testing.assert_allclose(np.asarray(gg) * m, np.asarray(gw) * m,
                               atol=TOL * 10, rtol=TOL * 10)


def test_bf16_forward():
    q, k, v, mask = _inputs(2, True)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    want = dilated_attention(q, k, v, segment_lengths=SEGS,
                             dilated_ratios=RATIOS, mask=mask,
                             use_pallas=False)
    got = mega_dilated_attention(q, k, v, segment_lengths=SEGS,
                                 dilated_ratios=RATIOS, mask=mask,
                                 interpret=INTERPRET)
    assert got.dtype == jnp.bfloat16
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(got, np.float32) * m,
        np.asarray(want, np.float32) * m, atol=0.05, rtol=0.05)


@pytest.mark.slow
def test_edge_masks_and_bf16_grads():
    """Degenerate masks (nearly-empty and full rows) keep outputs and
    grads finite and matching; bf16 grads track fp32."""
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(2, S, H, D), jnp.float32)
    lens = np.array([8, S])
    mask = jnp.asarray(np.arange(S)[None, :] < lens[:, None])

    def loss(fn, x):
        out = fn(x) * mask[:, :, None, None]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    f_ref = lambda x: dilated_attention(
        x, x, x, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, use_pallas=False)
    f_meg = lambda x: mega_dilated_attention(
        x, x, x, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, interpret=INTERPRET)
    gw = jax.grad(lambda x: loss(f_ref, x))(q)
    gg = jax.grad(lambda x: loss(f_meg, x))(q)
    assert np.all(np.isfinite(np.asarray(gg)))
    mm = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(np.asarray(gg) * mm, np.asarray(gw) * mm,
                               atol=5e-4, rtol=5e-4)

    qb = q.astype(jnp.bfloat16)
    gb = jax.grad(lambda x: loss(f_meg, x))(qb)
    gb = np.asarray(gb, np.float32) * mm
    assert np.all(np.isfinite(gb))
    ref = np.asarray(gg, np.float32) * mm
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(gb - ref).max() / denom < 0.1


def test_hbm_io_backward_matches_monolithic():
    """The HBM-resident-window backward (``hbm_io`` — the 25,599
    flagship bucket's flavor, where the monolithic windows exceed VMEM)
    computes EXACTLY the same tiles in the same order as the monolithic
    backward; outputs must match to fp32 roundoff. Exercises both the
    batched window DMA (nk > 1) and the per-tile staging path (nk == 1,
    the r == R branch)."""
    from modaltune_tpu.ops.dilated_fused import comb, to_head_major
    from modaltune_tpu.ops.dilated_mega import (_mega_bwd_call,
                                                _mega_fwd_call,
                                                make_mega_plans)
    from modaltune_tpu.ops.flash_attention import NEG_INF

    segs, ratios = (64, 128, 256, 80), (1, 2, 4, 4)  # incl. nk=1 (r=R)
    rng = np.random.RandomState(11)
    B = 2
    q = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
    lens = rng.randint(S // 2, S + 1, size=B)
    vmask = jnp.asarray((np.arange(S)[None, :] < lens[:, None]),
                        jnp.float32)
    dmix = jnp.asarray(rng.randn(B, S, H, D), jnp.float32)

    R, plans = make_mega_plans(S, segs, ratios)
    qc = comb(to_head_major(q), R)
    kc = comb(to_head_major(k), R)
    vc = comb(to_head_major(v), R)
    dmc = comb(to_head_major(dmix), R)
    bias = jnp.where(comb(vmask, R) > 0.5, 0.0,
                     NEG_INF).astype(jnp.float32)[:, None, :]
    scale = D ** -0.5
    _, stats = _mega_fwd_call(plans, qc, kc, vc, bias, S, H, scale,
                              interpret=INTERPRET)

    ref = _mega_bwd_call(plans, qc, kc, vc, bias, dmc, stats, S, H,
                         scale, interpret=INTERPRET, hbm_io=False)
    got = _mega_bwd_call(plans, qc, kc, vc, bias, dmc, stats, S, H,
                         scale, interpret=INTERPRET, hbm_io=True)
    for name, a, b in zip(("dq", "dk", "dv"), got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6,
                                   err_msg=f"{name} hbm_io mismatch")


def test_hbm_io_full_vjp_matches_oracle(monkeypatch):
    """End-to-end custom-VJP parity with the hbm_io backward forced via
    a squeezed VMEM budget (between the hbm estimate and the monolithic
    one), vs the XLA oracle."""
    import modaltune_tpu.ops.dilated_mega as dm

    # pick a budget that rejects the monolithic bwd but admits hbm_io
    nbrs = len(SEGS)
    R, plans = dm.make_mega_plans(S, SEGS, RATIOS)
    max_wr = max(p.max_wr for p in plans)
    lo = max(dm._vmem_estimate_bwd_hbm(S, D, nbrs, max_wr, 4),
             dm._vmem_estimate_fwd(S, D, nbrs, max_wr, 4))
    hi = dm._vmem_estimate(S, D, nbrs, max_wr, 4)
    assert lo < hi
    monkeypatch.setattr(dm, "_VMEM_BUDGET", (lo + hi) // 2)
    dm._build_mega.cache_clear()
    assert dm.mega_mode(S, H, D, SEGS, RATIOS, itemsize=4) == "hbm_bwd"

    q, k, v, mask = _inputs(7, True)
    cot = jax.random.normal(jax.random.PRNGKey(5), q.shape) * \
        mask[:, :, None, None]
    f_ref = lambda a, b, c: jnp.sum(dilated_attention(
        a, b, c, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, use_pallas=False) * cot)
    f_meg = lambda a, b, c: jnp.sum(mega_dilated_attention(
        a, b, c, segment_lengths=SEGS, dilated_ratios=RATIOS,
        mask=mask, interpret=INTERPRET) * cot)
    np.testing.assert_allclose(float(f_meg(q, k, v)),
                               float(f_ref(q, k, v)), rtol=1e-4)
    gw = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(f_meg, argnums=(0, 1, 2))(q, k, v)
    mm = np.asarray(mask)[:, :, None, None]
    for name, w, g in zip("qkv", gw, gg):
        np.testing.assert_allclose(
            np.asarray(g) * mm, np.asarray(w) * mm,
            atol=TOL * 10, rtol=TOL * 10, err_msg=f"d{name} mismatch")
    dm._build_mega.cache_clear()
