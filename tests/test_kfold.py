"""K-fold split helpers: partition coverage, disjointness, subset view —
plus a real fold-loop lifecycle run (``base_trainer.py:545-571``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modaltune_tpu.configs import TrainConfig, tiny_test_config
from modaltune_tpu.data import SyntheticSlideDataset, kfold_splits
from modaltune_tpu.models import ModalTuneModel
from modaltune_tpu.train.trainer import ModalTuneTrainer, run_kfold


def test_kfold_partition():
    ds = SyntheticSlideDataset(n_cases=17, in_chans=8, bag_range=(5, 10))
    folds = kfold_splits(ds, n_folds=5, seed=0)
    assert len(folds) == 5
    all_val = []
    for tr, va in folds:
        assert len(tr) + len(va) == 17
        assert set(tr.case_ids).isdisjoint(va.case_ids)
        all_val.extend(va.case_ids)
    # every case appears in exactly one validation fold
    assert sorted(all_val) == sorted(ds.case_ids)


def test_subset_view_semantics():
    ds = SyntheticSlideDataset(n_cases=6, in_chans=8, bag_range=(5, 10))
    (tr, va) = kfold_splits(ds, n_folds=3, seed=1)[0]
    rng = np.random.RandomState(0)
    ex = va.get(0, rng)
    assert ex.case_id == va.case_ids[0]
    assert len(va.metadata()) == len(va)
    assert va.metadata()[0]["case_id"] == va.case_ids[0]


@pytest.mark.slow
def test_kfold_lifecycle(tmp_path):
    """run_kfold actually trains each fold: per-fold run dirs with
    metrics + best weights, and a finite metric per fold."""
    cfg = tiny_test_config()
    packer = SyntheticSlideDataset(n_cases=1).packer
    ds = SyntheticSlideDataset(n_cases=8, in_chans=cfg.backbone.in_chans,
                               bag_range=(40, 80), packer=packer, seed=0)
    folds = kfold_splits(ds, n_folds=2, seed=0)
    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len)
    ex = ds.get(0, np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(ex.bag[None, :40]),
                        jnp.asarray(ex.coords[None, :40]),
                        jnp.asarray(ex.genes[None]),
                        task_token=jnp.eye(3)[:1])["params"]
    tcfg = TrainConfig(lr=1e-3, num_epochs=1, warmup_epochs=1, seed=0)

    def make_trainer(fold):
        tr, va = folds[fold]
        return ModalTuneTrainer(model, tcfg,
                                {"train": tr, "val": va},
                                str(tmp_path / f"fold_{fold}"),
                                buckets=(96,), model_cfg=cfg)

    metrics = run_kfold(make_trainer, lambda fold: params, n_folds=2)
    assert len(metrics) == 2
    for k, m in enumerate(metrics):
        assert np.isfinite(m)
        fold_dir = tmp_path / f"fold_{k}"
        assert (fold_dir / "run_metrics.jsonl").exists()
        assert (fold_dir / "best_model_weights.npz").exists()
