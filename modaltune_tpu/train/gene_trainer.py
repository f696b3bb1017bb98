"""Supervised trainer for the genomics-only baselines.

The reference registers ``gene_mixer_group`` with "classifier" /
"survival" output modes (``gene_encoder.py:97-223``,
``aggregators.py:43-58``) — those baselines produce the S-MLP /
Gene-Mixer rows in BASELINE.md — but ships no training driver for them
(they were trained outside the repo). This trainer completes that
surface: plain supervised cross-entropy (classifier) or discrete-time
survival NLL (survival) over the packed pathway blocks, with the same
epoch-loop / best-model-selection shape as ``utils/base_trainer.py``.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import TrainConfig
from ..data.datasets import BucketedLoader
from ..eval.readout import (classification_metrics, concordance_index,
                            filter_labelset)
from ..utils.logging import MetricsLogger
from ..utils.params_io import load_params_npz, save_params_npz
from .losses import cross_entropy_loss, survival_nll_loss
from .state import TrainState, make_optimizer


def duration_bins(durations: np.ndarray, events: np.ndarray,
                  n_bins: int) -> np.ndarray:
    """Quantile bin edges over *uncensored* train durations (the
    standard discretization for the cumprod-hazard survival head).
    Returns the interior edges (n_bins - 1,)."""
    obs = durations[events.astype(bool)]
    if obs.size == 0:
        obs = durations
    qs = np.linspace(0, 1, n_bins + 1)[1:-1]
    return np.quantile(obs, qs)


def to_bins(durations: np.ndarray, edges: np.ndarray) -> np.ndarray:
    return np.searchsorted(edges, durations, side="left").astype(np.int32)


class GeneBaselineTrainer:
    """Epoch loop + best-val selection for a supervised baseline model.

    Generic over the model's inputs via ``_model_inputs``: the genomics
    baseline feeds the packed gene blocks; ``MilBaselineTrainer``
    (train/mil_trainer.py) reuses the same loop for bag-based MIL
    models."""

    def __init__(self, model, cfg: TrainConfig, datasets: Dict,
                 out_dir: str, batch_size: int = 8, buckets=None):
        assert model.mode in ("classifier", "survival"), model.mode
        self.model = model
        self.cfg = cfg
        self.datasets = datasets
        self.out_dir = Path(out_dir)
        self.logger = MetricsLogger(str(self.out_dir))
        loader_kw = {} if buckets is None else {"buckets": buckets}
        self.loaders = {
            k: BucketedLoader(datasets[k], batch_size=batch_size,
                              shuffle=(k == "train"), seed=cfg.seed,
                              **loader_kw)
            for k in ("train", "val", "test") if k in datasets}
        self.best_metric = float("-inf")
        self.state: Optional[TrainState] = None
        self._edges: Optional[np.ndarray] = None
        if model.mode == "survival":
            meta = datasets["train"].metadata()
            t = np.array([m["durations"] for m in meta], float)
            e = np.array([m["vital_status"] for m in meta], int)
            self._edges = duration_bins(t, e, model.n_classes)

    # ------------------------------------------------------------------
    def _targets(self, batch):
        if self.model.mode == "classifier":
            return jnp.asarray(batch.label), None
        return (jnp.asarray(to_bins(batch.duration, self._edges)),
                jnp.asarray(batch.event))

    def _model_inputs(self, batch) -> tuple:
        """Positional device inputs for ``model.apply`` — override for
        models that consume more than the gene blocks."""
        return (jnp.asarray(batch.genes),)

    def init_state(self, params: dict) -> TrainState:
        tx = make_optimizer(self.cfg,
                            steps_per_epoch=max(1, len(self.loaders[
                                "train"])))
        self.state = TrainState.create(params, tx)
        mode = self.model.mode

        def train_step(state, inputs, y, events, rng):
            def loss_fn(trainable):
                out = self.model.apply(
                    {"params": trainable}, *inputs, deterministic=False,
                    rngs={"dropout": rng})
                if mode == "classifier":
                    return cross_entropy_loss(out, y)
                hazards, s, _ = out
                return survival_nll_loss(hazards, s, y, events)

            loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
            return state.apply_gradients(grads), loss

        def eval_step(state, inputs):
            return self.model.apply({"params": state.trainable}, *inputs,
                                    deterministic=True)

        self._train_step = jax.jit(train_step)
        self._eval_step = jax.jit(eval_step)
        self._rng = jax.random.PRNGKey(self.cfg.seed)
        return self.state

    # ------------------------------------------------------------------
    def train_one_epoch(self) -> float:
        total, n = 0.0, 0
        for batch in self.loaders["train"]:
            y, events = self._targets(batch)
            self._rng, sub = jax.random.split(self._rng)
            self.state, loss = self._train_step(
                self.state, self._model_inputs(batch), y, events, sub)
            total += float(loss)
            n += 1
        return total / max(n, 1)

    def evaluate(self, stage: str) -> Dict[str, float]:
        ys, preds, probs, risks, ts, es = [], [], [], [], [], []
        for batch in self.loaders[stage]:
            out = self._eval_step(self.state, self._model_inputs(batch))
            if self.model.mode == "classifier":
                logits = np.asarray(out, np.float32)
                preds.append(logits.argmax(-1))
                probs.append(jax.nn.softmax(logits, axis=-1))
                ys.append(batch.label)
            else:
                _, s, _ = out
                # risk = -sum(S): lower expected survival = higher risk
                risks.append(-np.asarray(s, np.float32).sum(-1))
                ts.append(batch.duration)
                es.append(batch.event)
        if self.model.mode == "classifier":
            y = np.concatenate(ys)
            p = np.concatenate(preds)
            pr = np.concatenate(probs)
            keep = y >= 0
            m = classification_metrics(y[keep], p[keep],
                                       y_probs=pr[keep])
            m.pop("confusion_matrix", None)
            m.pop("roc_curve", None)
            return {f"{stage}_{k}": v for k, v in m.items()}
        c = concordance_index(np.concatenate(ts), np.concatenate(risks),
                              np.concatenate(es))
        return {f"{stage}_c_index": float(c)}

    # ------------------------------------------------------------------
    def run(self, params: dict) -> float:
        self.init_state(params)
        key = "val_bal_acc" if self.model.mode == "classifier" \
            else "val_c_index"
        for epoch in range(self.cfg.num_epochs):
            t0 = time.time()
            train_loss = self.train_one_epoch()
            row = {"epoch": epoch, "train_loss": train_loss,
                   "epoch_sec": round(time.time() - t0, 1)}
            if "val" in self.loaders and \
                    epoch % self.cfg.eval_interval == 0:
                row.update(self.evaluate("val"))
                if row.get(key, -1.0) > self.best_metric:
                    self.best_metric = row[key]
                    save_params_npz(
                        str(self.out_dir / "best_model_weights.npz"),
                        self.state.trainable)
            self.logger.log(row, step=epoch)
        best = self.out_dir / "best_model_weights.npz"
        if best.exists():
            self.state = self.state.replace(
                trainable=jax.tree.map(jnp.asarray,
                                       load_params_npz(str(best))))
        if "test" in self.loaders:
            self.logger.log(self.evaluate("test"),
                            step=self.cfg.num_epochs)
        self.logger.dump_summary()
        return self.best_metric
