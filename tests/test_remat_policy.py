"""The "flash" remat policy (save checkpoint_name-tagged kernel
outputs, models/longnet.py::remat_policy) must be numerics-neutral: it
only changes WHICH values the backward reads back vs recomputes. On CPU
the policy is inert (the XLA fallback has no tagged values — full
recompute either way); on TPU it exercises the Pallas custom-VJP path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import LongNetConfig
from modaltune_tpu.models.longnet import LongNetEncoder, remat_policy

from conftest import requires_tpu

TOL = 2e-2 if jax.default_backend() == "tpu" else 1e-5


def test_remat_policy_names():
    assert remat_policy("full") is None
    assert remat_policy("none") is None
    assert callable(remat_policy("flash"))
    assert callable(remat_policy("flash_ffn"))
    with pytest.raises(ValueError):
        remat_policy("bogus")


def _grads(policy: str, seed: int = 0):
    cfg = LongNetConfig(num_layers=2, embed_dim=64, ffn_dim=128,
                        num_heads=4, segment_lengths=(32, 64),
                        dilated_ratios=(1, 2), dropout=0.0,
                        drop_path_rate=0.0, remat=True,
                        remat_policy=policy)
    enc = LongNetEncoder(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(seed), (1, 96, 64))
    params = enc.init(jax.random.PRNGKey(1), x)

    def loss(p, xx):
        return jnp.sum(enc.apply(p, xx).astype(jnp.float32) ** 2)

    lv, gx = jax.jit(jax.value_and_grad(loss, argnums=1))(params, x)
    return float(lv), np.asarray(gx)


@pytest.mark.slow
def test_policy_is_numerics_neutral_cpu_or_tpu():
    l1, g1 = _grads("flash")
    l2, g2 = _grads("full")
    assert np.isfinite(g1).all()
    np.testing.assert_allclose(l1, l2, rtol=TOL)
    np.testing.assert_allclose(g1, g2, atol=TOL, rtol=TOL)


@pytest.mark.slow
def test_flash_ffn_policy_is_numerics_neutral():
    """flash_ffn only widens the saved-residual set (fc1 out, q/k/v
    projections) — the gradients must match the full-recompute policy
    bit-for-bit up to reduction-order tolerance."""
    l1, g1 = _grads("flash_ffn")
    l2, g2 = _grads("full")
    assert np.isfinite(g1).all()
    np.testing.assert_allclose(l1, l2, rtol=TOL)
    np.testing.assert_allclose(g1, g2, atol=TOL, rtol=TOL)


@requires_tpu
def test_policy_saves_kernel_outputs_on_tpu():
    """With the flash policy the backward re-reads the saved kernel
    outputs: the lowered HLO contains one fewer fwd-kernel call per
    layer than the full-recompute policy."""
    def lowered_custom_calls(policy):
        cfg = LongNetConfig(num_layers=2, embed_dim=256, ffn_dim=512,
                            num_heads=4, segment_lengths=(512,),
                            dilated_ratios=(1,), dropout=0.0,
                            drop_path_rate=0.0, remat=True,
                            remat_policy=policy)
        enc = LongNetEncoder(cfg, dtype=jnp.bfloat16)
        x = jnp.ones((1, 1024, 256), jnp.bfloat16)
        shapes = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), x))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                              shapes)

        def loss(p, xx):
            return jnp.sum(enc.apply(p, xx).astype(jnp.float32))

        txt = jax.jit(jax.grad(loss, argnums=1)).lower(params, x).as_text()
        return txt.count("tpu_custom_call")

    assert lowered_custom_calls("flash") < lowered_custom_calls("full")
