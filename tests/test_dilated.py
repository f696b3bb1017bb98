"""Dilated attention tests against brute-force numpy oracles.

The oracle re-derives LongNet semantics from first principles (per-branch
segment/dilation/head-rotation attention + LSE-softmax mixing) so it is an
independent check on ops/dilated.py, not a copy of it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.ops import (NEG_INF, dense_to_sparse, dilated_attention,
                               sparse_to_dense)

from conftest import on_tpu

# TPU fp32 matmuls are bf16 multi-pass at default precision (and this
# environment's chip shows ~1e-2 absolute noise on fp32 attention)
TOL = 2e-2 if on_tpu() else 1e-4
STRICT = 5e-3 if on_tpu() else 1e-5


def test_dense_to_sparse_pattern():
    """sparse[b, l, g*h+j] == dense[b, l*r + g, g*h+j] (head rotation)."""
    b, s, heads, d, r = 2, 16, 8, 4, 4
    x = np.arange(b * s * heads * d, dtype=np.float32).reshape(b, s, heads, d)
    sp = np.asarray(dense_to_sparse(jnp.asarray(x), r))
    h = heads // r
    assert sp.shape == (b, s // r, heads, d)
    for l in range(s // r):
        for head in range(heads):
            g = head // h
            np.testing.assert_array_equal(sp[:, l, head], x[:, l * r + g, head])


def test_sparse_to_dense_roundtrip():
    b, s, heads, d, r = 2, 24, 8, 4, 2
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, s, heads, d))
    lse_sparse = jax.random.normal(jax.random.PRNGKey(1),
                                   (b, s // r, heads))
    sp = dense_to_sparse(x, r)
    out, lse = sparse_to_dense(sp, lse_sparse, r, s)
    assert out.shape == (b, s, heads, d)
    h = heads // r
    out, lse, x = np.asarray(out), np.asarray(lse), np.asarray(x)
    for pos in range(s):
        for head in range(heads):
            g = head // h
            if pos % r == g:
                np.testing.assert_allclose(out[:, pos, head],
                                           x[:, pos, head])
                np.testing.assert_allclose(lse[:, pos, head],
                                           np.asarray(lse_sparse)[:, pos // r, head])
            else:
                np.testing.assert_allclose(out[:, pos, head], 0.0)
                np.testing.assert_allclose(lse[:, pos, head], NEG_INF)


def oracle_dilated(q, k, v, segment_lengths, ratios, mask=None):
    """Brute-force per-token oracle: for each (token, head), each branch
    attends over the tokens in the same segment with position ≡ head-group
    offset (mod r); branches mixed by softmax of their LSEs."""
    q = np.asarray(q, np.float64)
    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    b, L, H, D = q.shape
    if mask is None:
        mask = np.ones((b, L), bool)
    mask = np.asarray(mask)
    scale = D ** -0.5
    outs = np.zeros((len(segment_lengths), b, L, H, D))
    lses = np.full((len(segment_lengths), b, L, H), NEG_INF)
    for bi, (w, r) in enumerate(zip(segment_lengths, ratios)):
        w = min(w, L)
        h = H // r  # assumes H % r == 0 in tests
        for batch in range(b):
            for pos in range(L):
                seg = pos // w
                for head in range(H):
                    g = head // h
                    if (pos % w) % r != g:
                        continue
                    # keys: same segment, offset g, stride r, valid
                    ks = [j for j in range(seg * w, min((seg + 1) * w, L))
                          if (j % w) % r == g and mask[batch, j]]
                    if not ks:
                        continue
                    s = np.array([q[batch, pos, head] @ k[batch, j, head]
                                  for j in ks]) * scale
                    m = s.max()
                    p = np.exp(s - m)
                    l = p.sum()
                    outs[bi, batch, pos, head] = (p / l) @ v[batch, ks, head]
                    lses[bi, batch, pos, head] = m + np.log(l)
    m = lses.max(0)
    wgt = np.exp(lses - m)
    wgt /= wgt.sum(0)
    return (outs * wgt[..., None]).sum(0)


@pytest.mark.parametrize("L,segs,ratios", [
    (32, (8,), (1,)),
    (32, (8, 16), (1, 2)),
    (40, (8, 16, 32), (1, 2, 4)),   # L not a multiple of segments
    (16, (64,), (4,)),              # segment clamped to L
])
def test_dilated_vs_oracle(L, segs, ratios):
    b, H, D = 2, 4, 8
    keys = jax.random.split(jax.random.PRNGKey(42), 3)
    q = jax.random.normal(keys[0], (b, L, H, D))
    k = jax.random.normal(keys[1], (b, L, H, D))
    v = jax.random.normal(keys[2], (b, L, H, D))
    out = dilated_attention(q, k, v, segment_lengths=segs,
                            dilated_ratios=ratios)
    ref = oracle_dilated(q, k, v, segs, ratios)
    np.testing.assert_allclose(np.asarray(out), ref, atol=TOL, rtol=TOL)


def test_dilated_with_padding_mask():
    b, L, H, D = 1, 32, 4, 8
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(keys[0], (b, L, H, D))
    k = jax.random.normal(keys[1], (b, L, H, D))
    v = jax.random.normal(keys[2], (b, L, H, D))
    valid = 20
    mask = jnp.arange(L)[None] < valid
    segs, ratios = (8, 16), (1, 2)
    out = dilated_attention(q, k, v, segment_lengths=segs,
                            dilated_ratios=ratios, mask=mask)
    ref = oracle_dilated(q, k, v, segs, ratios, mask=np.asarray(mask))
    np.testing.assert_allclose(np.asarray(out[:, :valid]), ref[:, :valid],
                               atol=TOL, rtol=TOL)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dilated_mask_invariance():
    """Outputs on valid tokens must not depend on padded-token values."""
    b, L, H, D = 1, 24, 4, 8
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(keys[0], (b, L, H, D))
    k = jax.random.normal(keys[1], (b, L, H, D))
    v = jax.random.normal(keys[2], (b, L, H, D))
    valid = 17
    mask = jnp.arange(L)[None] < valid
    segs, ratios = (8, 24), (1, 2)
    out1 = dilated_attention(q, k, v, segment_lengths=segs,
                             dilated_ratios=ratios, mask=mask)
    noise = jax.random.normal(keys[3], (b, L, H, D)) * 100
    pad = ~mask[..., None, None]
    out2 = dilated_attention(jnp.where(pad, noise, q),
                             jnp.where(pad, noise, k),
                             jnp.where(pad, noise, v),
                             segment_lengths=segs, dilated_ratios=ratios,
                             mask=mask)
    np.testing.assert_allclose(np.asarray(out1[:, :valid]),
                               np.asarray(out2[:, :valid]),
                               atol=STRICT, rtol=STRICT)


# ---------------------------------------------------------------------------
# head-major fast path (ops/dilated_fast.py)
# ---------------------------------------------------------------------------

from modaltune_tpu.ops import dilated_attention_fast


@pytest.mark.parametrize("L,segs,ratios", [
    (32, (8,), (1,)),
    (32, (8, 16), (1, 2)),
    (40, (8, 16, 32), (1, 2, 4)),
    (16, (64,), (4,)),
    (33, (8, 64), (1, 4)),          # clamped odd-length branch
])
def test_fast_matches_reference_impl(L, segs, ratios):
    b, H, D = 2, 4, 8
    keys = jax.random.split(jax.random.PRNGKey(21), 3)
    q = jax.random.normal(keys[0], (b, L, H, D))
    k = jax.random.normal(keys[1], (b, L, H, D))
    v = jax.random.normal(keys[2], (b, L, H, D))
    mask = jnp.broadcast_to(jnp.arange(L)[None] < (L - 3), (b, L))
    fast = dilated_attention_fast(q, k, v, segment_lengths=segs,
                                  dilated_ratios=ratios, mask=mask)
    slow = dilated_attention(q, k, v, segment_lengths=segs,
                             dilated_ratios=ratios, mask=mask)
    np.testing.assert_allclose(np.asarray(fast[:, :L - 3]),
                               np.asarray(slow[:, :L - 3]),
                               atol=TOL, rtol=TOL)


def test_fast_matches_oracle_no_mask():
    b, L, H, D = 2, 40, 4, 8
    segs, ratios = (8, 16, 32), (1, 2, 4)
    keys = jax.random.split(jax.random.PRNGKey(22), 3)
    q = jax.random.normal(keys[0], (b, L, H, D))
    k = jax.random.normal(keys[1], (b, L, H, D))
    v = jax.random.normal(keys[2], (b, L, H, D))
    out = dilated_attention_fast(q, k, v, segment_lengths=segs,
                                 dilated_ratios=ratios)
    ref = oracle_dilated(q, k, v, segs, ratios)
    np.testing.assert_allclose(np.asarray(out), ref, atol=TOL, rtol=TOL)


def test_fast_gradients_match_slow():
    b, L, H, D = 1, 32, 4, 8
    segs, ratios = (8, 16), (1, 2)
    keys = jax.random.split(jax.random.PRNGKey(23), 4)
    q = jax.random.normal(keys[0], (b, L, H, D))
    k = jax.random.normal(keys[1], (b, L, H, D))
    v = jax.random.normal(keys[2], (b, L, H, D))
    tangent = jax.random.normal(keys[3], (b, L, H, D))

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, segment_lengths=segs,
                          dilated_ratios=ratios) * tangent)

    gf = jax.grad(lambda *a: loss(dilated_attention_fast, *a),
                  argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(lambda *a: loss(dilated_attention, *a),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=TOL, rtol=TOL)
