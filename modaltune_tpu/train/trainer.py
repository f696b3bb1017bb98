"""Experiment lifecycle: the ModalTune trainer.

Rebuild of ``utils/base_trainer.py`` (Trainer: seeding, run dirs, config
dump, epoch loop, best-model selection, k-fold) combined with
``train_modaltune.py`` (``MILTextGeneTrainer_multitask``: KD training,
in-loop LogReg/CoxPH readout, embedding export, deploy). Differences by
design:

* the epoch's 6-iteration debug cap (``train_modaltune.py:196-197``) is
  off unless ``TrainConfig.reference_quirks`` is set;
* wandb -> local JSONL metrics (utils/logging.py);
* checkpointing saves **both** best/interval weights (like
  ``base_trainer.py:320-340``) *and* full optimizer state for true
  resume via orbax — the reference can only restart from weights
  (SURVEY.md §5 checkpoint/resume gap);
* distributed: an optional device mesh makes the train step
  data-parallel via shard_map (replaces DDP init at
  ``base_trainer.py:160-211``).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ModalTuneConfig, TrainConfig
from ..data.datasets import Batch, BucketedLoader
from ..eval.readout import (CoxPH, classification_metrics, filter_labelset,
                            fit_logreg, perform_testing)
from ..utils.logging import MetricsLogger, dump_config
from ..utils.params_io import load_params_npz, save_params_npz
from .losses import TextProjector, project_text
from .state import TrainState, count_params, make_optimizer
from .train_step import make_embed_step, make_eval_step, make_train_step


def set_seed(seed: int) -> np.random.RandomState:
    np.random.seed(seed)
    return np.random.RandomState(seed)


def _device_batch(batch: Batch) -> dict:
    out = dict(bag=jnp.asarray(batch.bag), coords=jnp.asarray(batch.coords),
               mask=jnp.asarray(batch.mask), genes=jnp.asarray(batch.genes))
    out["clinical"] = None if batch.clinical is None else \
        jnp.asarray(batch.clinical)
    return out


def _row_valid(batch: Batch) -> jnp.ndarray:
    """(B,) 1/0 mask of real vs wrap-around padded rows (pad_to_batch
    mode keeps mesh shapes static; the padded rows must not count toward
    eval losses or metrics)."""
    b = len(batch.case_ids)
    rv = np.ones(b, np.float32)
    if batch.pad_rows:
        rv[b - batch.pad_rows:] = 0.0
    return jnp.asarray(rv)


class _NullLogger:
    """Metrics sink for non-zero processes in multi-host runs."""

    def log(self, row, step=None):
        pass

    def dump_summary(self):
        pass


class ModalTuneTrainer:
    """Single-site multi-task KD trainer.

    Args:
      model: a ModalTuneModel (or TITAN variant) flax module.
      cfg: TrainConfig.
      datasets: dict with 'train'/'val'/'test' FeatureBagDataset-likes.
      out_dir: run directory (config dump, metrics, checkpoints).
      buckets: bag-length buckets for static-shape batching.
    """

    def __init__(self, model, cfg: TrainConfig, datasets: Dict,
                 out_dir: str, buckets: Sequence[int] = (4095, 8191,
                                                         16383, 25599),
                 batch_size: int = 1, model_cfg: Optional[
                     ModalTuneConfig] = None, mesh=None,
                 process_shard=None):
        self.model = model
        self.cfg = cfg
        self.datasets = datasets
        self.out_dir = Path(out_dir)
        self.buckets = tuple(buckets)
        self.batch_size = batch_size
        self.mesh = mesh
        self.rng = set_seed(cfg.seed)
        # multi-host: only process 0 writes run artifacts (configs,
        # metrics, weight files) — the reference's rank-0 guard
        # (base_trainer.py:438-440); orbax checkpoints stay collective.
        self.is_main = process_shard is None or process_shard[0] == 0
        self.logger = MetricsLogger(str(self.out_dir)) if self.is_main \
            else _NullLogger()
        if self.is_main:
            dump_config(str(self.out_dir), {
                "train": dataclasses.asdict(cfg),
                "model": dataclasses.asdict(model_cfg) if model_cfg else {},
                "buckets": list(buckets),
            })

        # multi-host DP: each process iterates a disjoint case-modulo
        # shard (parallel/multihost.py) while dataset metadata stays
        # global; eval embeddings are re-assembled by the allgather in
        # extract_embeddings
        self.process_shard = process_shard
        self.train_loader = BucketedLoader(
            datasets["train"], buckets=self.buckets,
            batch_size=batch_size, shuffle=True, seed=cfg.seed,
            # async H2D overlap; under a mesh the sharded step owns
            # placement, so leave batches on host there
            device_prefetch=(mesh is None),
            process_shard=process_shard,
            pad_to_batch=(mesh is not None))
        self.eval_loaders = {
            k: BucketedLoader(datasets[k], buckets=self.buckets,
                              batch_size=batch_size, shuffle=False,
                              seed=cfg.seed, process_shard=process_shard,
                              pad_to_batch=(mesh is not None))
            for k in ("train", "val", "test") if k in datasets}

        # frozen random text projector (train_modaltune.py:113-116)
        self.projector = TextProjector()
        self.proj_params = self.projector.init(
            jax.random.PRNGKey(cfg.seed + 12345),
            jnp.zeros((1, 4, 512)))["params"]

        self.state: Optional[TrainState] = None
        self.current_epoch = 0
        self.best_metric = float("-inf")
        self._lr_head = None
        self._cph = None
        self._steps_cap = None

    # ------------------------------------------------------------------
    def init_state(self, params: dict,
                   frozen_dtype=None) -> TrainState:
        steps = max(1, len(self.train_loader))
        if self.cfg.reference_quirks:
            steps = min(steps, 6)
        tx = make_optimizer(self.cfg, steps_per_epoch=steps)
        self.state = TrainState.create(params, tx,
                                       frozen_dtype=frozen_dtype)
        frozen_n = count_params(self.state.frozen)
        train_n = count_params(self.state.trainable)
        print(f"Initialized model: trainable={train_n:,} "
              f"frozen={frozen_n:,}")
        self._steps_cap = None
        if self.process_shard is not None and self.process_shard[1] > 1:
            # multi-host DDP: local per-bucket grad step + one global
            # grad-mean/update program — replicas stay bit-identical
            # (the reference's DDP wrap, base_trainer.py:205-211)
            from ..parallel.multihost import DdpGradSync, global_steps_min
            from .train_step import make_grad_step
            ddp = DdpGradSync(tx)
            gstep = make_grad_step(self.model, self.cfg)
            pid = self.process_shard[0]

            def ddp_step(state, batch, text_targets, rng):
                rng = jax.random.fold_in(rng, pid)  # decorrelate dropout
                loss, grads = gstep(DdpGradSync.local_view(state), batch,
                                    text_targets, rng)
                tr, opt, st, mloss = ddp.step(
                    grads, loss, state.trainable, state.opt_state,
                    state.step)
                return state.replace(trainable=tr, opt_state=opt,
                                     step=st), mloss

            self._train_step = ddp_step
            # every process must run the same number of synchronized
            # steps (uneven shards -> DDP Join equivalent)
            self._steps_cap = global_steps_min(len(self.train_loader))
        elif self.mesh is not None:
            from ..parallel.mesh import make_dp_train_step
            self._train_step = make_dp_train_step(self.model, self.cfg,
                                                  self.mesh)
        else:
            self._train_step = make_train_step(self.model, self.cfg)
        self._eval_step = make_eval_step(self.model, self.cfg,
                                         mesh=self.mesh)
        self._embed_step = make_embed_step(self.model, self.cfg,
                                           mesh=self.mesh)
        self._step_rng = jax.random.PRNGKey(self.cfg.seed)
        return self.state

    def _text_targets(self, batch: Batch):
        return project_text(self.projector, self.proj_params,
                            jnp.asarray(batch.text))

    # ------------------------------------------------------------------
    def _epoch_cap(self) -> float:
        """The reference caps single-site epochs at 6 iterations in quirks
        mode (train_modaltune.py:196-197); pan-cancer never does."""
        return 6 if self.cfg.reference_quirks else \
            (self.cfg.steps_per_epoch_cap or np.inf)

    def train_one_epoch(self) -> float:
        total, n = 0.0, 0
        cap = self._epoch_cap()
        if self._steps_cap is not None:
            cap = min(cap, self._steps_cap)
        for batch in self.train_loader:
            if n >= cap:
                break
            self._step_rng, sub = jax.random.split(self._step_rng)
            self.state, loss = self._train_step(
                self.state, _device_batch(batch),
                self._text_targets(batch), sub)
            total += float(loss)
            n += 1
        return total / max(n, 1)

    def _local_state(self) -> TrainState:
        """State view safe for local (per-process) jitted programs: under
        multi-host DDP, trainable/opt leaves are global replicated arrays
        — take this process's addressable shard (zero-copy)."""
        if self.process_shard is not None and self.process_shard[1] > 1:
            from ..parallel.multihost import DdpGradSync
            return DdpGradSync.local_view(self.state)
        return self.state

    def extract_embeddings(self, loader, task0_only: bool = False):
        """-> (embeddings (N, T, D) fp32, metadata rows). The in-loop
        readout uses task-0 embeddings only, like
        ``LogisticRegression_train`` (train_modaltune.py:329-376)."""
        embs, ids = [], []
        by_case = {m["case_id"]: m for m in loader.dataset.metadata()}
        state = self._local_state()
        for batch in loader:
            out = self._embed_step(state, _device_batch(batch))
            real = len(batch.case_ids) - batch.pad_rows
            embs.append(np.asarray(out, np.float32)[:real])
            ids.extend(batch.case_ids[:real])
        # the empty placeholder must carry the real (num_tasks, out_dim)
        # trailing shape: under the multi-host gather a (0, 3, 1) stub
        # would disagree with other processes' (n, T, D) rows and break
        # the padded allgather whenever a split has fewer cases than
        # processes
        out_dim = self.model.cfg.adapter.output_dim
        x = np.concatenate(embs) if embs else \
            np.zeros((0, self.cfg.num_tasks, out_dim), np.float32)
        if self.process_shard is not None:
            # re-assemble the per-process shards (uneven-count gather:
            # the DDP Join + gather_object equivalent,
            # base_trainer.py:379-421), restored to the dataset's
            # canonical case order so downstream head fits and deploy
            # artifacts are bit-identical to a single-process run
            from ..parallel.multihost import allgather_embeddings
            x, ids = allgather_embeddings(x, ids)
            pos = {c: i for i, c in enumerate(loader.dataset.case_ids)}
            perm = np.argsort(np.asarray([pos[c] for c in ids]))
            x = x[perm]
            ids = [ids[i] for i in perm]
        meta = [by_case[c] for c in ids]
        if task0_only:
            x = x[:, :1]
        return x, meta

    def fit_readout_heads(self):
        """Fit LogReg + CoxPH on train task-0 embeddings."""
        x, meta = self.extract_embeddings(self.eval_loaders["train"])
        x0 = x[:, 0]
        y = np.array([m.get("primary_class", -1) for m in meta], int)
        self._lr_head = fit_logreg(x0, y)
        t = np.array([m.get("durations", np.nan) for m in meta], float)
        e = np.array([m.get("vital_status", 0) for m in meta], int)
        self._cph = CoxPH(penalizer=0.1).fit(x0, t, e)

    def _gather_eval(self, x0, ids, loss_num: float, loss_den: int,
                     dataset):
        """Assemble GLOBAL eval outputs under multi-host DP.

        The reference gathers every rank's eval logits/labels to rank 0
        before computing metrics (``gather_distributed_outputs``,
        base_trainer.py:379-421, used by ``evaluate`` at
        train_modaltune.py:388-458) — without this, the best-model
        selection key would be scored on a 1/P shard of the validation
        set. Allgathers embeddings + case ids (uneven counts absorbed),
        sums the loss numerator/denominator across processes, and
        restores the dataset's canonical case order so every process —
        and a single-process run on the same data — computes identical
        metrics. Passthrough when not multi-host."""
        if self.process_shard is None or self.process_shard[1] <= 1:
            return x0, ids, loss_num, loss_den
        from ..parallel.multihost import allgather_embeddings, process_sum
        x0, ids = allgather_embeddings(x0, list(ids))
        sums = process_sum(np.asarray([loss_num, float(loss_den)]))
        pos = {c: i for i, c in enumerate(dataset.case_ids)}
        perm = np.argsort(np.asarray([pos[c] for c in ids]))
        return x0[perm], [ids[i] for i in perm], float(sums[0]), \
            int(round(float(sums[1])))

    def _eval_outputs(self, stage: str):
        """Run the eval step over a split -> (x0 (N, D) task-0
        embeddings, metadata rows, mean loss), globally gathered under
        multi-host (see :meth:`_gather_eval`)."""
        loader = self.eval_loaders[stage]
        by_case = {m["case_id"]: m for m in loader.dataset.metadata()}
        loss_num, loss_den, x0, ids = 0.0, 0, [], []
        state = self._local_state()
        for batch in loader:
            logits, loss = self._eval_step(state,
                                           _device_batch(batch),
                                           self._text_targets(batch),
                                           _row_valid(batch))
            real = len(batch.case_ids) - batch.pad_rows
            # per-batch losses already exclude padded rows; weight by
            # real count so uneven final batches don't skew the mean
            loss_num += float(loss) * real
            loss_den += real
            x0.append(np.asarray(logits[:real, 0], np.float32))
            ids.extend(batch.case_ids[:real])
        out_dim = self.model.cfg.adapter.output_dim
        x0 = np.concatenate(x0) if x0 else np.zeros((0, out_dim),
                                                    np.float32)
        x0, ids, loss_num, loss_den = self._gather_eval(
            x0, ids, loss_num, loss_den, loader.dataset)
        meta = [by_case[c] for c in ids]
        return x0, meta, loss_num / max(loss_den, 1)

    def evaluate(self, stage: str) -> Dict[str, float]:
        """Loss + readout metrics on a split (``evaluate``,
        train_modaltune.py:388-458). Under multi-host every process
        scores the FULL split (reference rank-0 gather equivalent)."""
        x0, meta, mean_loss = self._eval_outputs(stage)
        y = np.array([m.get("primary_class", -1) for m in meta], int)
        t = np.array([m.get("durations", np.nan) for m in meta], float)
        e = np.array([m.get("vital_status", 0) for m in meta], int)

        out = {f"{stage}_cls_loss": mean_loss}
        if self._lr_head is not None:
            xf, yf = filter_labelset(x0, y)
            if len(yf):
                m = classification_metrics(
                    yf, self._lr_head.predict(xf),
                    y_probs=self._lr_head.predict_proba(xf))
                cm = m.pop("confusion_matrix", None)
                roc = m.pop("roc_curve", None)
                out.update({f"{stage}_cls_{k}": v for k, v in m.items()})
                # artifact writes are main-process-only (the reference's
                # rank-0 guard, base_trainer.py:438-440) — on a shared
                # filesystem every process writing is a race
                import json as _json
                if cm is not None and self.is_main:
                    with open(self.out_dir /
                              f"confusion_{stage}.json", "w") as f:
                        _json.dump(cm, f)
                if roc and self.is_main:
                    with open(self.out_dir / f"roc_{stage}.json",
                              "w") as f:
                        _json.dump(roc, f)
        if self._cph is not None:
            out[f"{stage}_c_index"] = self._cph.score(x0, t, e)
        return out

    # ------------------------------------------------------------------
    def save_weights(self, name: str) -> None:
        if self.is_main:
            save_params_npz(str(self.out_dir / name), self.state.params)

    def load_weights(self, path: str, strict: bool = True) -> None:
        """Load a weights npz; with ``strict`` the loaded tree must match
        the current model's param tree exactly (keys and shapes) — the
        deploy-time ``load_state_dict`` strictness
        (``train_modaltune.py:546-548``), guarding against a model built
        from drifted flags."""
        params = jax.tree.map(jnp.asarray, load_params_npz(path))
        if strict:
            from ..utils.params_io import flatten_params
            cur = flatten_params(jax.tree.map(np.asarray,
                                              self.state.params))
            new = flatten_params(jax.tree.map(np.asarray, params))
            missing = sorted(set(cur) - set(new))
            unexpected = sorted(set(new) - set(cur))
            bad_shape = sorted(k for k in set(cur) & set(new)
                               if cur[k].shape != new[k].shape)
            if missing or unexpected or bad_shape:
                raise ValueError(
                    f"weights at {path} do not match the model: "
                    f"missing={missing[:5]} unexpected={unexpected[:5]} "
                    f"shape-mismatch={bad_shape[:5]} "
                    f"({len(missing)}/{len(unexpected)}/{len(bad_shape)} "
                    f"total)")
        frozen = {k: v for k, v in params.items() if k == "backbone"}
        trainable = {k: v for k, v in params.items() if k != "backbone"}
        self.state = self.state.replace(frozen=frozen, trainable=trainable)

    def save_checkpoint(self, name: str = "ckpt",
                        resume_epoch: Optional[int] = None) -> None:
        """Full-state checkpoint (params + optimizer) for resume.

        ``resume_epoch`` records the epoch training should *continue
        from* (run() passes epoch+1 after finishing an epoch)."""
        import orbax.checkpoint as ocp
        path = (self.out_dir / name).resolve()
        ckptr = ocp.StandardCheckpointer()
        epoch = self.current_epoch if resume_epoch is None else resume_epoch
        ckptr.save(path, dict(trainable=self.state.trainable,
                              opt_state=self.state.opt_state,
                              step=self.state.step,
                              epoch=epoch,
                              best=self.best_metric), force=True)
        ckptr.wait_until_finished()

    def restore_checkpoint(self, name: str = "ckpt") -> bool:
        import orbax.checkpoint as ocp
        path = (self.out_dir / name).resolve()
        if not path.exists():
            return False
        ckptr = ocp.StandardCheckpointer()
        target = dict(trainable=self.state.trainable,
                      opt_state=self.state.opt_state,
                      step=self.state.step,
                      epoch=self.current_epoch, best=self.best_metric)
        restored = ckptr.restore(path, target)
        self.state = self.state.replace(trainable=restored["trainable"],
                                        opt_state=restored["opt_state"],
                                        step=restored["step"])
        self.current_epoch = int(restored["epoch"])
        self.best_metric = float(restored["best"])
        return True

    # ------------------------------------------------------------------
    def run(self, params: dict, frozen_dtype=None) -> float:
        """Full training run -> best val key metric (balanced accuracy,
        like ``base_trainer.py:423-543``). With ``cfg.save_interval`` set,
        writes a full-state checkpoint every N epochs and auto-resumes
        from it at start (superset of the reference's
        ``model_weights_epoch_N.pt`` interval saves,
        ``base_trainer.py:320-340``, which cannot restore the optimizer)."""
        self.init_state(params, frozen_dtype=frozen_dtype)
        if self.cfg.save_interval and self.restore_checkpoint():
            print(f"Resumed from checkpoint at epoch {self.current_epoch} "
                  f"(best={self.best_metric:.4f})")
        for epoch in range(self.current_epoch, self.cfg.num_epochs):
            self.current_epoch = epoch
            t0 = time.time()
            train_loss = self.train_one_epoch()
            row = {"epoch": epoch, "train_loss": train_loss,
                   "epoch_sec": round(time.time() - t0, 1)}
            if epoch % self.cfg.eval_interval == 0 and "val" in \
                    self.eval_loaders:
                self.fit_readout_heads()
                row.update(self.evaluate("val"))
                key = row.get("val_cls_bal_acc", -1.0)
                if key > self.best_metric:
                    self.best_metric = key
                    self.save_weights("best_model_weights.npz")
            self.logger.log(row, step=epoch)
            if self.cfg.save_interval and \
                    (epoch + 1) % self.cfg.save_interval == 0:
                self.save_checkpoint(resume_epoch=epoch + 1)
        # test with best weights, heads refit on train
        if (self.out_dir / "best_model_weights.npz").exists():
            self.load_weights(str(self.out_dir / "best_model_weights.npz"))
        if "test" in self.eval_loaders:
            self.fit_readout_heads()
            test_row = self.evaluate("test")
            self.logger.log(test_row, step=self.cfg.num_epochs)
        self.logger.dump_summary()
        return self.best_metric

    def deploy(self, weights_path: Optional[str] = None,
               penalizer: float = 0.1) -> Dict[str, dict]:
        """Embedding export + per-task LogReg/CoxPH readout
        (``deploy_mil``, train_modaltune.py:520-554). Saves embeddings
        and label frames under ``out_dir/data`` like ``get_features``."""
        if weights_path:
            self.load_weights(weights_path)
        data_dir = self.out_dir / "data"
        if self.is_main:
            data_dir.mkdir(parents=True, exist_ok=True)
        splits = {}
        for name in ("train", "val", "test"):
            if name not in self.eval_loaders:
                continue
            x, meta = self.extract_embeddings(self.eval_loaders[name])
            splits[name] = (x, meta)
            # embeddings are globally gathered (every process holds the
            # full split) but only the main process writes artifacts —
            # shared-filesystem write races otherwise
            if self.is_main:
                np.save(data_dir / f"x_feats_{name}.npy", x)
                with open(data_dir / f"meta_{name}.json", "w") as f:
                    json.dump(meta, f, default=str)
        results = perform_testing(splits["train"][0], splits["train"][1],
                                  splits["test"][0], splits["test"][1],
                                  penalizer=penalizer)
        if self.is_main:
            with open(self.out_dir / "deploy_results.json", "w") as f:
                json.dump(results, f, indent=2)
        return results


def run_kfold(make_trainer, params_fn, n_folds: int = 5) -> List[float]:
    """K-fold harness (``base_trainer.py:545-571``): caller provides a
    factory producing a trainer per fold and an init-params fn."""
    metrics = []
    for fold in range(n_folds):
        trainer = make_trainer(fold)
        metrics.append(trainer.run(params_fn(fold)))
    return metrics
