"""Supervised trainer for the ABMIL / TransMIL baselines.

BASELINE.json target configs #1-#2 ("ABMIL linear probe", "TransMIL
(cat) late fusion") and the reference CLI default ``--mil_name abmil``
(``train_modaltune.py:615``) describe supervised bag classifiers over
cached patch features — the paper's main baselines. The reference repo
ships no training driver for them; this reuses the genomics baseline's
epoch loop (``train/gene_trainer.py``) with bag/mask (+genes for the
"(cat)" fusion variants) as model inputs over the same bucketed,
masked batches the adapter models train on.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..configs import TrainConfig
from .gene_trainer import GeneBaselineTrainer


class MilBaselineTrainer(GeneBaselineTrainer):
    """Epoch loop + best-val selection for AbmilModel / TransMilModel
    (classifier or survival mode; feature mode is read out by the main
    trainer's readout heads instead)."""

    def __init__(self, model, cfg: TrainConfig, datasets: Dict,
                 out_dir: str, batch_size: int = 8, buckets=None):
        super().__init__(model, cfg, datasets, out_dir,
                         batch_size=batch_size, buckets=buckets)

    def _model_inputs(self, batch) -> tuple:
        ins = (jnp.asarray(batch.bag), jnp.asarray(batch.mask))
        if getattr(self.model, "use_genes", False):
            ins = ins + (jnp.asarray(batch.genes),)
        return ins
