"""End-to-end smoke: tiny ModalTune on synthetic bags — loss decreases,
frozen params stay frozen, schedule matches the warmup->cosine contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import TrainConfig, tiny_test_config
from modaltune_tpu.data import BucketedLoader, SyntheticSlideDataset
from modaltune_tpu.models import ModalTuneModel
from modaltune_tpu.train import (TextProjector, TrainState, make_optimizer,
                                 make_train_step, project_text,
                                 split_params,
                                 warmup_cosine_epoch_schedule)


def build(seed=0):
    cfg = tiny_test_config()
    ds = SyntheticSlideDataset(n_cases=4, in_chans=cfg.backbone.in_chans,
                               bag_range=(40, 90), seed=seed)
    model = ModalTuneModel(cfg, n_gene_groups=ds.packer.n_groups,
                           max_group_len=ds.packer.max_group_len)
    loader = BucketedLoader(ds, buckets=(64, 128), batch_size=1, seed=seed,
                            prefetch=0)
    batch = next(iter(loader))
    inputs = dict(bag=jnp.asarray(batch.bag),
                  coords=jnp.asarray(batch.coords),
                  mask=jnp.asarray(batch.mask),
                  genes=jnp.asarray(batch.genes))
    params = model.init(jax.random.PRNGKey(seed), inputs["bag"],
                        inputs["coords"], inputs["genes"],
                        task_token=jnp.eye(3)[:1],
                        bag_mask=inputs["mask"])["params"]
    return cfg, ds, model, loader, params


@pytest.mark.slow
def test_train_step_learns():
    cfg, ds, model, loader, params = build()
    tcfg = TrainConfig(lr=3e-3, num_epochs=4, warmup_epochs=1)
    tx = make_optimizer(tcfg, steps_per_epoch=4)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, tcfg, donate=False)

    projector = TextProjector()
    proj_params = projector.init(jax.random.PRNGKey(99),
                                 jnp.zeros((1, 4, 512)))["params"]

    frozen_before = jax.tree.map(lambda x: np.asarray(x), state.frozen)
    losses = []
    rng = jax.random.PRNGKey(0)
    for epoch in range(3):
        for batch in loader:
            b = dict(bag=jnp.asarray(batch.bag),
                     coords=jnp.asarray(batch.coords),
                     mask=jnp.asarray(batch.mask),
                     genes=jnp.asarray(batch.genes))
            text = project_text(projector, proj_params,
                                jnp.asarray(batch.text))
            rng, sub = jax.random.split(rng)
            state, loss = step_fn(state, b, text, sub)
            losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # frozen subtree untouched
    for a, b_ in zip(jax.tree_util.tree_leaves(frozen_before),
                     jax.tree_util.tree_leaves(state.frozen)):
        np.testing.assert_array_equal(a, np.asarray(b_))


def test_lr_schedule_contract():
    tcfg = TrainConfig(lr=1e-4, num_epochs=20, warmup_epochs=10,
                       warmup_factor=20.0)
    sched = warmup_cosine_epoch_schedule(tcfg, steps_per_epoch=10)
    # epoch 0 starts at lr/20
    np.testing.assert_allclose(float(sched(0)), 1e-4 / 20, rtol=1e-6)
    # warmup end reaches lr
    np.testing.assert_allclose(float(sched(10 * 10)), 1e-4, rtol=1e-6)
    # monotone during warmup
    vals = [float(sched(i * 10)) for i in range(11)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))
    # cosine decays to ~0 at the end
    assert float(sched(20 * 10 - 1)) < 1e-5


def test_param_split_roundtrip():
    cfg, ds, model, loader, params = build()
    frozen, trainable = split_params(params)
    assert set(frozen) == {"backbone"}
    assert "backbone" not in trainable
