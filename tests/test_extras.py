"""Tests for the config-off parity components: LoRA dilated attention,
MoE routing (+ expert-parallel all_to_all on the CPU mesh), xPos, T5
relative position bias."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import LongNetConfig
from modaltune_tpu.models.extras import (LoraDilatedSelfAttention,
                                         MoeFeedForward,
                                         RelativePositionBias, apply_xpos,
                                         top1_gating)
from modaltune_tpu.models.longnet import DilatedSelfAttention


def _ln_cfg():
    return LongNetConfig(num_layers=1, embed_dim=32, ffn_dim=64,
                         num_heads=4, segment_lengths=(8, 16),
                         dilated_ratios=(1, 2), dropout=0.0,
                         drop_path_rate=0.0)


def test_lora_identity_at_init():
    """LoRA B matrices init to zero, so outputs equal the base attention
    when base projections share weights."""
    cfg = _ln_cfg()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32))
    gene = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32))
    task = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32))
    lora = LoraDilatedSelfAttention(cfg)
    params = lora.init(jax.random.PRNGKey(3), x, gene, task)
    out = lora.apply(params, x, gene, task)
    # construct the plain attention with the same base weights
    plain = DilatedSelfAttention(cfg)
    p = params["params"]
    base_params = {"params": {
        "q_proj": p["q_proj"], "k_proj": p["k_proj"],
        "v_proj": p["v_proj"], "out_proj": p["out_proj"],
        "inner_attn_ln": p["inner_attn_ln"]}}
    out_plain = plain.apply(base_params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_plain),
                               atol=1e-5, rtol=1e-5)
    # and gene/task LoRA params exist for training
    assert "q_lora_A_gene" in p and "v_lora_B_task" in p


def test_top1_gating_conservation():
    rng = jax.random.PRNGKey(0)
    s, e, cap = 32, 4, 16
    logits = jax.random.normal(rng, (s, e))
    combine, dispatch, aux = top1_gating(logits, cap)
    d = np.asarray(dispatch, np.float32)
    # each token dispatched at most once
    assert np.all(d.sum(axis=(1, 2)) <= 1.0 + 1e-6)
    # no expert queue overflows capacity
    assert np.all(d.sum(axis=(0, 2)) <= cap + 1e-6)
    # each (expert, slot) holds at most one token
    assert np.all(d.sum(axis=0) <= 1.0 + 1e-6)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_ffn_single_device():
    moe = MoeFeedForward(dim=16, ffn_dim=32, num_experts=4,
                         capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    params = moe.init(jax.random.PRNGKey(1), x)
    out, aux = moe.apply(params, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_moe_expert_parallel_all_to_all():
    """Expert-parallel MoE under shard_map over an 'expert' mesh axis
    (the lax.all_to_all analogue of the reference's _AllToAll)."""
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n = 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("expert",))
    # generous capacity so no token is dropped: then expert-parallel
    # output must equal the single-device computation exactly
    moe = MoeFeedForward(dim=16, ffn_dim=32, num_experts=8,
                         capacity_factor=8.0, axis_name="expert")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
    full = MoeFeedForward(dim=16, ffn_dim=32, num_experts=8,
                          capacity_factor=8.0)
    params = full.init(jax.random.PRNGKey(1), x)["params"]

    def run(params, x):
        out, aux = moe.apply({"params": params}, x)
        return out

    # tokens sharded along the sequence axis; experts sharded in params
    fn = shard_map(run, mesh=mesh,
                   in_specs=({"gate": {"kernel": P()},
                              "w1": P("expert"), "b1": P("expert"),
                              "w2": P("expert"), "b2": P("expert")},
                             P(None, "expert")),
                   out_specs=P(None, "expert"), check_vma=False)
    out = fn(params, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
    ref = full.apply({"params": params}, x)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_xpos_shapes_and_inverse_scaling():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    up = apply_xpos(x, downscale=False)
    down = apply_xpos(x, downscale=True)
    assert up.shape == x.shape == down.shape
    assert not np.allclose(np.asarray(up), np.asarray(down))


def test_relative_position_bias():
    m = RelativePositionBias(num_buckets=8, max_distance=16, num_heads=2)
    params = m.init(jax.random.PRNGKey(0), 6, 6)
    bias = m.apply(params, 6, 6)
    assert bias.shape == (2, 6, 6)
    b = np.asarray(bias)
    # same relative offset -> same bias (Toeplitz structure)
    np.testing.assert_allclose(b[0, 0, 1], b[0, 1, 2])
    np.testing.assert_allclose(b[0, 2, 0], b[0, 3, 1])
