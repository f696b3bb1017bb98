"""Span-resident comb layout (models/longnet.py::span_comb_R).

The encoder permutes the token stream into the mega kernel's comb_R
order once per span and runs every layer pre-combed — valid because
all inter-attention ops (LN, FFN, residuals, projections, masking) are
per-token. These tests pin (a) ops-level ``pre_combed=True`` parity
against the natural-order mega op and (b) encoder-level parity against
the XLA oracle path, gradients included. Mirrors the layout semantics
of the reference's per-branch gather/scatter
(``torchscale/component/dilated_attention.py:82-144``), which pays the
relayout every layer instead.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import LongNetConfig
from modaltune_tpu.models import longnet as L
from modaltune_tpu.ops.dilated_fused import comb
from modaltune_tpu.ops.dilated_mega import mega_dilated_attention
from tests.conftest import on_tpu

INTERPRET = not on_tpu()
TOL = 2e-5 if INTERPRET else 5e-3


def _tok_comb(t, R):
    """comb_R permutation of the token axis of a (B, S, H, D) array."""
    B, S = t.shape[:2]
    rest = t.shape[2:]
    return jnp.moveaxis(t.reshape((B, S // R, R) + rest), 2, 1
                        ).reshape((B, S) + rest)


def _tok_uncomb(t, R):
    B, S = t.shape[:2]
    rest = t.shape[2:]
    return jnp.moveaxis(t.reshape((B, R, S // R) + rest), 1, 2
                        ).reshape((B, S) + rest)


def test_pre_combed_matches_natural_mega():
    B, S, H, D = 2, 256, 4, 48
    segs, rats = (64, 128, 256), (1, 2, 4)
    R = 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.float32)
               for kk in ks[:3])
    mask = jnp.arange(S)[None, :] < jnp.array([S, S - 37])[:, None]

    def nat(q, k, v):
        return mega_dilated_attention(
            q, k, v, segment_lengths=segs, dilated_ratios=rats,
            mask=mask, interpret=INTERPRET)

    def pre(q, k, v):
        mc = comb(mask.astype(jnp.float32), R) > 0.5
        o = mega_dilated_attention(
            _tok_comb(q, R), _tok_comb(k, R), _tok_comb(v, R),
            segment_lengths=segs, dilated_ratios=rats, mask=mc,
            interpret=INTERPRET, pre_combed=True)
        return _tok_uncomb(o, R)

    np.testing.assert_allclose(np.asarray(nat(q, k, v)),
                               np.asarray(pre(q, k, v)), atol=TOL)
    w = jax.random.normal(ks[3], (B, S, H, D))
    g1 = jax.grad(lambda *a: jnp.sum(nat(*a) * w), argnums=(0, 1, 2))(
        q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(pre(*a) * w), argnums=(0, 1, 2))(
        q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=TOL)


def _encoder_cfg():
    return LongNetConfig(num_layers=2, embed_dim=64, ffn_dim=128,
                         num_heads=4, segment_lengths=(64, 128),
                         dilated_ratios=(1, 4), dropout=0.0,
                         drop_path_rate=0.0, remat=True,
                         remat_policy="flash", fused_attention=True,
                         mega_attention=True)


@pytest.mark.slow  # encoder-level; ops-level pre_combed bitwise parity stays fast
def test_encoder_comb_resident_matches_oracle(monkeypatch):
    """Same params: comb-resident span (interpret-forced on CPU) vs the
    natural-order path, forward + input gradients."""
    cfg = _encoder_cfg()
    S = 256
    enc = L.LongNetEncoder(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, S, 64))
    mask = jnp.arange(S)[None, :] < jnp.array([S, S - 60])[:, None]
    params = enc.init(jax.random.PRNGKey(1), x, mask)

    def loss(p, xx):
        return jnp.sum(enc.apply(p, xx, mask).astype(jnp.float32) ** 2)

    monkeypatch.setenv("MODALTUNE_PALLAS_INTERPRET",
                       "1" if INTERPRET else "")
    assert L.span_comb_R(cfg, S) == 4
    y_comb = enc.apply(params, x, mask)
    g_comb = jax.grad(loss, argnums=1)(params, x)

    monkeypatch.setenv("MODALTUNE_PALLAS_INTERPRET", "")
    monkeypatch.setattr(L, "span_comb_R", lambda *_: None)
    y_nat = enc.apply(params, x, mask)
    g_nat = jax.grad(loss, argnums=1)(params, x)

    np.testing.assert_allclose(np.asarray(y_comb), np.asarray(y_nat),
                               atol=5 * TOL)
    np.testing.assert_allclose(np.asarray(g_comb), np.asarray(g_nat),
                               atol=5e-4 if INTERPRET else 2e-2)


def test_span_comb_gate():
    cfg = _encoder_cfg()
    if not on_tpu():
        os.environ.pop("MODALTUNE_PALLAS_INTERPRET", None)
        assert L.span_comb_R(cfg, 256) is None  # CPU, no interpret
    import dataclasses
    off = dataclasses.replace(cfg, mega_attention=False)
    lora = dataclasses.replace(cfg, lora_adapter=True)
    sp = dataclasses.replace(cfg, seq_axes=("data", "seq"))
    os.environ["MODALTUNE_PALLAS_INTERPRET"] = "1"
    try:
        assert L.span_comb_R(cfg, 256) == 4
        assert L.span_comb_R(off, 256) is None
        assert L.span_comb_R(lora, 256) is None
        assert L.span_comb_R(sp, 256) is None
        assert L.span_comb_R(cfg, 250) is None  # ineligible S
    finally:
        os.environ.pop("MODALTUNE_PALLAS_INTERPRET", None)
