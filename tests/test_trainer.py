"""Trainer lifecycle test: full run on synthetic data — metrics logged,
best weights saved, deploy readout produced, checkpoint resume works."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import TrainConfig, tiny_test_config
from modaltune_tpu.data import SyntheticSlideDataset
from modaltune_tpu.models import ModalTuneModel
from modaltune_tpu.train.trainer import ModalTuneTrainer


def _make(tmp_path, n_cases=8, num_epochs=2):
    cfg = tiny_test_config()
    packer = SyntheticSlideDataset(n_cases=1).packer
    datasets = {
        name: SyntheticSlideDataset(n_cases=n_cases,
                                    in_chans=cfg.backbone.in_chans,
                                    bag_range=(40, 80), packer=packer,
                                    seed=i)
        for i, name in enumerate(("train", "val", "test"))}
    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len)
    tcfg = TrainConfig(lr=1e-3, num_epochs=num_epochs, warmup_epochs=1,
                       seed=0)
    trainer = ModalTuneTrainer(model, tcfg, datasets, str(tmp_path),
                               buckets=(96,), model_cfg=cfg)
    ds = datasets["train"]
    ex = ds.get(0, np.random.RandomState(0))
    bag = jnp.asarray(ex.bag[None, :40])
    params = model.init(jax.random.PRNGKey(0), bag,
                        jnp.asarray(ex.coords[None, :40]),
                        jnp.asarray(ex.genes[None]),
                        task_token=jnp.eye(3)[:1])["params"]
    return trainer, params, cfg


@pytest.mark.slow  # lifecycle covered fast by test_cli resume/eval-only paths
def test_full_run_and_deploy(tmp_path):
    trainer, params, cfg = _make(tmp_path)
    best = trainer.run(params)
    out = Path(tmp_path)
    assert (out / "config.json").exists()
    assert (out / "run_metrics.jsonl").exists()
    assert (out / "best_model_weights.npz").exists()
    assert (out / "summary.json").exists()
    rows = [json.loads(l) for l in
            open(out / "run_metrics.jsonl")]
    assert any("train_loss" in r for r in rows)
    assert any("val_cls_bal_acc" in r for r in rows)
    assert -1.0 <= best <= 1.0

    results = trainer.deploy()
    assert (out / "deploy_results.json").exists()
    assert "General" in results and "c_index" in results["General"]
    assert (out / "data" / "x_feats_test.npy").exists()


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    trainer, params, cfg = _make(tmp_path, num_epochs=1)
    trainer.init_state(params)
    trainer.train_one_epoch()
    step_before = int(trainer.state.step)
    trainer.save_checkpoint("ckpt")

    trainer2, params2, _ = _make(tmp_path / "second", num_epochs=1)
    trainer2.init_state(params2)
    # restore from the first trainer's dir
    trainer2.out_dir = trainer.out_dir
    assert trainer2.restore_checkpoint("ckpt")
    assert int(trainer2.state.step) == step_before
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.trainable),
                    jax.tree_util.tree_leaves(trainer2.state.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_updates_every_k():
    """TrainConfig.grad_accum honors the reference's parsed-but-unused
    --gc flag (train_modaltune.py:619) via optax.MultiSteps: params
    change only every k-th step and match the mean-gradient update."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from modaltune_tpu.configs import TrainConfig
    from modaltune_tpu.train.state import TrainState, make_optimizer

    cfg = TrainConfig(lr=1e-2, num_epochs=2, warmup_epochs=1,
                      grad_accum=2, weight_decay=0.0)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    params = {"w": jnp.ones(3)}
    state = TrainState.create(params, tx)
    g1 = {"w": jnp.asarray([1.0, 0.0, 0.0])}
    state1 = state.apply_gradients(g1)
    np.testing.assert_array_equal(np.asarray(state1.trainable["w"]),
                                  np.ones(3))  # accumulating, no step
    g2 = {"w": jnp.asarray([0.0, 1.0, 0.0])}
    state2 = state1.apply_gradients(g2)
    assert not np.allclose(np.asarray(state2.trainable["w"]), np.ones(3))
    # symmetric mean gradient -> equal movement on dims 0 and 1
    w = np.asarray(state2.trainable["w"])
    assert abs((w[0] - 1.0) - (w[1] - 1.0)) < 1e-7
    assert w[2] == 1.0
