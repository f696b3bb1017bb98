"""Sequence-parallel fused dilated attention (ops/dilated_sp.py).

The gather_kv-equivalent composition (reference
``torchscale/component/dilated_attention.py:61-80``): token axis
sharded over a ``seq`` mesh axis, K/V all-gathered per layer inside a
shard_map island, device-local mega kernel restricted to the shard's
query rows. Runs on the 8-virtual-device CPU mesh in interpret mode;
the oracle is the dense XLA implementation ``ops.dilated``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from modaltune_tpu.ops import dilated_attention
from modaltune_tpu.ops.dilated_mega import mega_dilated_attention
from modaltune_tpu.ops.dilated_sp import (sp_island_attention,
                                          sp_mega_eligible)
from modaltune_tpu.parallel.mesh import make_mesh

B, S, H, D = 2, 256, 4, 16
SEGS, RATS = (64, 128, 256), (1, 2, 4)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(B, S, H, D), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(rng.rand(B, S) > 0.15)
    return q, k, v, mask


@pytest.mark.slow  # qrange parity also covered fast by test_island_matches_oracle
def test_qrange_kernel_matches_full():
    """The q-restricted mega kernel tiles back to the full result —
    including shard boundaries that fall inside fori-path segments."""
    q, k, v, mask = _inputs()
    kw = dict(segment_lengths=SEGS, dilated_ratios=RATS, mask=mask,
              interpret=True)
    full = mega_dilated_attention(q, k, v, **kw)
    for n in (4, 8):  # n=8: Sl=32 < w=64 -> boundary mid-segment
        Sl = S // n
        parts = [mega_dilated_attention(
            q, k, v, q_token_range=(i * Sl, (i + 1) * Sl), **kw
        )[:, i * Sl:(i + 1) * Sl] for i in range(n)]
        got = jnp.concatenate(parts, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   atol=1e-5, rtol=1e-5)


def test_eligibility():
    assert sp_mega_eligible(S, 4, H, D, SEGS, RATS)
    assert sp_mega_eligible(S, 2, H, D, SEGS, RATS)
    assert not sp_mega_eligible(S, 3, H, D, SEGS, RATS)   # S % 3
    assert not sp_mega_eligible(S + 1, 2, H, D, SEGS, RATS)
    assert not sp_mega_eligible(S, 1, H, D, SEGS, RATS)   # no seq axis


@pytest.mark.parametrize("n_seq", [2, 4])
def test_island_matches_oracle(n_seq):
    """sp island inside jit under jax.set_mesh == the dense oracle,
    forward and gradients (dq through slice-pad, dk/dv through the
    psum_scatter transpose of the all_gather)."""
    if len(jax.devices()) < 2 * n_seq:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_seq=n_seq)
    q, k, v, mask = _inputs()

    def island_loss(q, k, v):
        out = sp_island_attention(q, k, v, mask,
                                  segment_lengths=SEGS,
                                  dilated_ratios=RATS,
                                  batch_axis="data", seq_axis="seq")
        assert out is not None, "island declined eligible shapes"
        return jnp.sum(jnp.sin(out)), out

    def oracle_loss(q, k, v):
        out = dilated_attention(q, k, v, segment_lengths=SEGS,
                                dilated_ratios=RATS, mask=mask)
        return jnp.sum(jnp.sin(out)), out

    spec = NamedSharding(mesh, P("data", "seq"))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
    with jax.set_mesh(mesh):
        (loss, out), grads = jax.jit(jax.value_and_grad(
            island_loss, argnums=(0, 1, 2), has_aux=True))(qs, ks, vs)
    (rloss, rout), rgrads = jax.jit(jax.value_and_grad(
        oracle_loss, argnums=(0, 1, 2), has_aux=True))(q, k, v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(rout),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(float(loss), float(rloss), rtol=1e-5)
    for g, rg, name in zip(grads, rgrads, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(rg),
                                   atol=3e-5, rtol=3e-5,
                                   err_msg=f"d{name}")


def test_island_declines_without_mesh():
    """Outside a set_mesh context the island returns None (caller falls
    back to the single-device dispatch)."""
    q, k, v, mask = _inputs()
    out = sp_island_attention(q, k, v, mask, segment_lengths=SEGS,
                              dilated_ratios=RATS,
                              batch_axis="data", seq_axis="seq")
    assert out is None


@pytest.mark.slow  # full spmd step; island kernel logic covered fast by test_island_matches_oracle
def test_spmd_train_step_fused_island():
    """End-to-end: make_spmd_train_step on a dp x sp mesh with a model
    whose LongNetConfig.seq_axes routes attention through the island;
    loss matches the same model without seq_axes on one device."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from modaltune_tpu.configs import (AdapterConfig, GeneEncoderConfig,
                                       ModalTuneConfig,
                                       SlideEncoderConfig, TrainConfig)
    from modaltune_tpu.data import GenePacker, synthetic_pathways
    from modaltune_tpu.models import ModalTuneModel
    from modaltune_tpu.parallel.mesh import make_spmd_train_step
    from modaltune_tpu.train import TrainState, make_optimizer

    def build(seq_axes):
        backbone = SlideEncoderConfig(
            in_chans=32, embed_dim=64, depth=2, max_wsi_size=16384,
            dropout=0.0, drop_path_rate=0.0, seq_axes=seq_axes)
        cfg = ModalTuneConfig(
            backbone=backbone,
            adapter=AdapterConfig(num_heads=4,
                                  interaction_indexes=((0, 1),),
                                  drop_path_rate=0.0),
            gene=GeneEncoderConfig(latent_dim=16, depth=1,
                                   final_groups=4, output_dim=64,
                                   dropout=0.0))
        return cfg

    # bag 255 + cls = 256 tokens; the tiny schedule (all branches clamp
    # to 256, R=16) is sp-eligible: S/R=16 rows/slab, Sl=128 % 16 == 0
    L = 255
    rng = np.random.RandomState(3)
    groups = synthetic_pathways(n_genes=40, n_groups=6, max_size=10,
                                seed=1)
    packer = GenePacker.build(groups, [f"g{i}" for i in range(40)])
    batch = dict(
        bag=jnp.asarray(rng.randn(2, L, 32), jnp.float32),
        coords=jnp.asarray(rng.randint(0, 64, (2, L, 2)) * 256.0,
                           jnp.float32),
        mask=jnp.asarray(np.arange(L)[None, :] < np.array([[L], [200]])),
        genes=jnp.asarray(np.stack([
            packer.pack(rng.randn(40).astype(np.float32))
            for _ in range(2)])))
    text = jnp.asarray(rng.randn(2, 3, 256), jnp.float32)
    tcfg = TrainConfig(lr=1e-3, num_epochs=2, warmup_epochs=1)

    def run(seq_axes, mesh=None):
        cfg = build(seq_axes)
        model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                               max_group_len=packer.max_group_len)
        params = jax.jit(lambda r: model.init(
            r, batch["bag"][:1], batch["coords"][:1],
            batch["genes"][:1], task_token=jnp.eye(3)[:1],
            bag_mask=batch["mask"][:1])["params"])(jax.random.PRNGKey(0))
        tx = make_optimizer(tcfg, steps_per_epoch=2)
        state = TrainState.create(params, tx)
        if mesh is None:
            from modaltune_tpu.train.train_step import make_train_step
            step = make_train_step(model, tcfg, donate=False)
            state, loss = step(state, batch, text, jax.random.PRNGKey(7))
        else:
            step = make_spmd_train_step(model, tcfg, mesh, with_seq=True)
            state, loss = step(state, batch, text, jax.random.PRNGKey(7))
        return float(loss)

    mesh = make_mesh(n_data=2, n_seq=2)
    loss_sp = run(("data", "seq"), mesh=mesh)
    loss_ref = run(None, mesh=None)
    np.testing.assert_allclose(loss_sp, loss_ref, atol=2e-5, rtol=2e-5)
