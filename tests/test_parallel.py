"""Multi-device tests on the 8-way virtual CPU mesh: data-parallel
shard_map step matches single-device math; GSPMD sequence-parallel step
compiles and runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import TrainConfig, tiny_test_config
from modaltune_tpu.data import BucketedLoader, SyntheticSlideDataset
from modaltune_tpu.models import ModalTuneModel
from modaltune_tpu.parallel.mesh import (make_dp_train_step, make_mesh,
                                         make_spmd_train_step)
from modaltune_tpu.train import (TextProjector, TrainState, make_optimizer,
                                 make_train_step, project_text)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >=4 devices")


def _setup(n_slides, seed=0, drop=False):
    cfg = tiny_test_config()
    if drop is False:
        # deterministic configs: tiny_test_config already has dropout 0
        pass
    ds = SyntheticSlideDataset(n_cases=n_slides,
                               in_chans=cfg.backbone.in_chans,
                               bag_range=(50, 60), seed=seed)
    model = ModalTuneModel(cfg, n_gene_groups=ds.packer.n_groups,
                           max_group_len=ds.packer.max_group_len)
    loader = BucketedLoader(ds, buckets=(64,), batch_size=n_slides,
                            shuffle=False, prefetch=0)
    batch = next(iter(loader))
    inputs = dict(bag=jnp.asarray(batch.bag),
                  coords=jnp.asarray(batch.coords),
                  mask=jnp.asarray(batch.mask),
                  genes=jnp.asarray(batch.genes))
    params = model.init(jax.random.PRNGKey(0), inputs["bag"][:1],
                        inputs["coords"][:1], inputs["genes"][:1],
                        task_token=jnp.eye(3)[:1],
                        bag_mask=inputs["mask"][:1])["params"]
    projector = TextProjector()
    pp = projector.init(jax.random.PRNGKey(9),
                        jnp.zeros((1, 4, 512)))["params"]
    text = project_text(projector, pp, jnp.asarray(batch.text))
    return cfg, model, params, inputs, text


@pytest.mark.slow
def test_dp_matches_single_device():
    n = 4
    cfg, model, params, inputs, text = _setup(n_slides=n)
    tcfg = TrainConfig(lr=1e-3, num_epochs=2, warmup_epochs=1)
    tx = make_optimizer(tcfg, steps_per_epoch=1)

    mesh = make_mesh(n_data=n, n_seq=1)
    dp_step = make_dp_train_step(model, tcfg, mesh)
    state_dp = TrainState.create(params, tx)
    rng = jax.random.PRNGKey(5)
    state_dp, loss_dp = dp_step(state_dp, inputs, text, rng)

    # single-device: same batch at once; kd_loss averages over slides, and
    # dropout is off in the tiny config, so results must agree
    single = make_train_step(model, tcfg, donate=False)
    state_1 = TrainState.create(params, tx)
    state_1, loss_1 = single(state_1, inputs, text, rng)

    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=2e-5,
                               atol=2e-5)
    # Adam normalizes updates by sqrt(v): for near-zero gradients the
    # first-step update amplifies reduction-order noise, so compare
    # post-update params with an absolute tolerance well below lr but
    # above that amplification.
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.trainable),
                    jax.tree_util.tree_leaves(state_1.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=0)


@pytest.mark.slow
def test_spmd_seq_parallel_runs():
    n_data, n_seq = 2, 2
    cfg, model, params, inputs, text = _setup(n_slides=n_data)
    tcfg = TrainConfig(lr=1e-3, num_epochs=2, warmup_epochs=1)
    tx = make_optimizer(tcfg, steps_per_epoch=1)
    mesh = make_mesh(n_data=n_data, n_seq=n_seq)
    step = make_spmd_train_step(model, tcfg, mesh, with_seq=True)
    state = TrainState.create(params, tx)
    state, loss = step(state, inputs, text, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # one more step to confirm the compiled program is reusable
    state, loss2 = step(state, inputs, text, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss2))
    assert float(loss2) < float(loss)
    # exactly ONE trace across repeated steps (no per-call re-jit)
    assert step.jitted._cache_size() == 1


@pytest.mark.slow
def test_mesh_aware_eval_and_embed_match_single_device():
    """Eval/embed steps under a data mesh shard the batch per device
    and agree with the single-device results.

    Deliberately hardened: batch = 2 rows/device (a replicated
    ``text_targets`` crashes with a broadcast shape error there instead
    of silently mis-pairing) and the model is briefly trained first so
    the normalized-logit softmax is non-degenerate — near init it is
    almost uniform and a cross-slide target mix-up stays inside any
    reasonable tolerance."""
    import numpy as np
    from modaltune_tpu.train.state import TrainState, make_optimizer
    from modaltune_tpu.train.train_step import (make_embed_step,
                                                make_eval_step)
    n_dev = min(4, len(jax.devices()))
    n = 2 * n_dev
    cfg, model, params, inputs, text = _setup(n)
    tcfg = TrainConfig(lr=1e-2, num_epochs=2, warmup_epochs=1)
    tx = make_optimizer(tcfg, steps_per_epoch=1)
    state = TrainState.create(params, tx)
    train = make_train_step(model, tcfg, donate=False)
    for i in range(5):
        state, _ = train(state, inputs, text, jax.random.PRNGKey(i))
    mesh = make_mesh(n_data=n_dev, n_seq=1)

    ones = jnp.ones(n, jnp.float32)
    single_eval = make_eval_step(model, tcfg)
    mesh_eval = make_eval_step(model, tcfg, mesh=mesh)
    l1, loss1 = single_eval(state, inputs, text, ones)
    l2, loss2 = mesh_eval(state, inputs, text, ones)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)

    # padded wrap rows must not contribute: masking the last 3 rows on
    # the mesh equals the single-device loss over the real rows alone
    rv = np.ones(n, np.float32)
    rv[-3:] = 0.0
    _, loss_pad = mesh_eval(state, inputs, text, jnp.asarray(rv))
    real = n - 3
    inputs_real = {k: (None if v is None else v[:real])
                   for k, v in inputs.items()}
    _, loss_real = single_eval(state, inputs_real, text[:real],
                               jnp.ones(real, jnp.float32))
    np.testing.assert_allclose(float(loss_pad), float(loss_real),
                               rtol=2e-4)

    single_emb = make_embed_step(model, tcfg)
    mesh_emb = make_embed_step(model, tcfg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(single_emb(state, inputs)),
                               np.asarray(mesh_emb(state, inputs)),
                               atol=2e-5, rtol=2e-5)
