"""Shared construction for the two-process multi-host trainer test.

The spawned worker (tests/_mh_worker.py) builds the DDP trainer with
``build_trainer(process_shard=(pid, 2))`` and the parent test
(tests/test_multihost.py) builds the *identical* single-process trainer
— same seeds, same datasets, same init params — to assert that the
globally-gathered multi-host evaluation (the reference's rank-0
``gather_distributed_outputs``, ``utils/base_trainer.py:379-421``)
produces the same metrics as a single-process run on the same data.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from modaltune_tpu.configs import TrainConfig, tiny_test_config
from modaltune_tpu.data import SyntheticSlideDataset
from modaltune_tpu.models import ModalTuneModel
from modaltune_tpu.train.trainer import ModalTuneTrainer


def build_trainer(process_shard=None, out_prefix="mh_trainer_"):
    """-> (trainer, init_params), fully deterministic across calls."""
    cfg = tiny_test_config()
    packer = SyntheticSlideDataset(n_cases=1).packer
    datasets = {
        name: SyntheticSlideDataset(
            n_cases=5, in_chans=cfg.backbone.in_chans,
            bag_range=(40, 80), packer=packer, seed=i)
        for i, name in enumerate(("train", "val", "test"))}
    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len)
    tcfg = TrainConfig(lr=1e-3, num_epochs=1, warmup_epochs=1, seed=0)
    out_dir = tempfile.mkdtemp(prefix=out_prefix)
    trainer = ModalTuneTrainer(model, tcfg, datasets, out_dir,
                               buckets=(96,),
                               process_shard=process_shard)
    ex = datasets["train"].get(0, np.random.RandomState(0))
    init_params = model.init(jax.random.PRNGKey(0),
                             jnp.asarray(ex.bag[None, :40]),
                             jnp.asarray(ex.coords[None, :40]),
                             jnp.asarray(ex.genes[None]),
                             task_token=jnp.eye(3)[:1])["params"]
    return trainer, init_params
