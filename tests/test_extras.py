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


# ---------------------------------------------------------------------------
# Top-2 gating (xmoe/routing.py:258-448)
# ---------------------------------------------------------------------------


def _np_top2_oracle(logits, capacity):
    """Literal numpy transcription of the reference top2gating with
    second_expert_policy deterministic and post-drop normalization."""
    s, e = logits.shape
    gates = np.exp(logits - logits.max(-1, keepdims=True))
    gates = gates / gates.sum(-1, keepdims=True)
    idx1 = gates.argmax(-1)
    mask1 = np.eye(e)[idx1]
    noisy = np.where(mask1 > 0, -np.inf, logits)
    idx2 = noisy.argmax(-1)
    mask2 = np.eye(e)[idx2]
    loc1 = np.cumsum(mask1, 0) * mask1 - mask1
    loc2 = np.cumsum(mask2, 0) * mask2 - mask2 + mask1.sum(0)
    aux = np.mean(gates.mean(0) * mask1.mean(0)) * e * e
    mask1 = mask1 * (loc1 < capacity)
    mask2 = mask2 * (loc2 < capacity)
    g1 = (gates * mask1).sum(-1)
    g2 = (gates * mask2).sum(-1)
    denom = np.maximum(g1 + g2, np.finfo(np.float32).eps)
    g1, g2 = g1 / denom, g2 / denom
    pos1 = (loc1 * mask1).sum(-1).astype(int)
    pos2 = (loc2 * mask2).sum(-1).astype(int)
    combine = np.zeros((s, e, capacity))
    for i in range(s):
        if mask1[i].any():
            combine[i, idx1[i], pos1[i]] += g1[i]
        if mask2[i].any():
            combine[i, idx2[i], pos2[i]] += g2[i]
    return combine, aux


def test_top2_gating_matches_numpy_oracle():
    from modaltune_tpu.models.extras import top2_gating
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(37, 4).astype(np.float32) * 2)
    cap = 2 * ((37 + 3) // 4)
    combine, dispatch, aux = top2_gating(logits, cap)
    want, want_aux = _np_top2_oracle(np.asarray(logits), cap)
    np.testing.assert_allclose(np.asarray(combine), want, atol=1e-5)
    np.testing.assert_allclose(float(aux), want_aux, atol=1e-6)
    # every kept token dispatches to <= 2 experts, weights sum to 1
    w = np.asarray(combine).sum((1, 2))
    kept = w > 0
    np.testing.assert_allclose(w[kept], 1.0, atol=1e-5)
    assert np.asarray(dispatch).sum(axis=(1, 2)).max() <= 2


def test_moe_top2_forward():
    from modaltune_tpu.models.extras import MoeFeedForward
    m = MoeFeedForward(dim=16, ffn_dim=32, num_experts=4,
                       gate_type="top2")
    x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 16),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out, aux = m.apply({"params": params}, x)
    assert out.shape == x.shape and np.isfinite(float(aux))
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# LoRA encoder wiring (LongNetConfig.lora_adapter)
# ---------------------------------------------------------------------------


@pytest.mark.slow  # full-encoder LoRA wiring+grads; LoRA unit tests stay fast
def test_lora_encoder_config_wiring():
    """`lora_adapter=True` builds LoraDilatedSelfAttention layers inside
    the encoder (slide_encoder.py:101 / LongNet.py:85-177 equivalent);
    with zero-init B matrices the forward equals the base projections'
    output, and LoRA params receive gradients."""
    import dataclasses
    from modaltune_tpu.configs import LongNetConfig
    from modaltune_tpu.models.longnet import LongNetEncoder
    cfg = LongNetConfig(num_layers=2, embed_dim=32, ffn_dim=64,
                        num_heads=4, segment_lengths=(16,),
                        dilated_ratios=(1,), dropout=0.0,
                        drop_path_rate=0.0, remat=False,
                        lora_adapter=True)
    enc = LongNetEncoder(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32),
                    jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora_keys = [jax.tree_util.keystr(k) for k, _ in flat
                 if "lora" in jax.tree_util.keystr(k)]
    assert any("lora_A_gene" in k for k in lora_keys), lora_keys[:5]
    assert any("lora_B_task" in k for k in lora_keys)

    out = enc.apply({"params": params}, x)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        return jnp.sum(enc.apply({"params": p}, x) ** 2)
    grads = jax.grad(loss)(params)
    # at init B == 0, so dL/dA == 0 exactly; B receives signal
    gb = [g for k, g in jax.tree_util.tree_leaves_with_path(grads)
          if "lora_B_img" in jax.tree_util.keystr(k)]
    assert gb and any(float(jnp.abs(g).sum()) > 0 for g in gb)
