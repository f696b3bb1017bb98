#!/usr/bin/env python
"""Train ModalTune-TPU — CLI entry point.

Equivalent of the reference's ``train_modaltune.py`` /
``train_modaltune_pancancer.py`` drivers (argparse surface mirrors
``utils/defaut_args.py`` + the per-script extensions): loads split
JSONs, gene CSV, text embeddings and optional clinical features, builds
the model from the aggregator registry, runs the trainer (or eval-only
deploy with ``--eval_only``), and handles ``--multi_seed`` triplets.

Example (synthetic smoke):
  python tools/train.py --synthetic 1 --num_epochs 2 --output_path /tmp/run

Real data:
  python tools/train.py \
    --train_json dataset/json_splits/tcga_brca/train_brca_cls_feat.json \
    --val_json ... --test_json ... \
    --genomics_csv_path data/tcga_brca_genes.csv \
    --text_location data/brca_textemb.npz \
    --pathway_csv dataset/gene_pathway_processed_v2.csv \
    --mil_name longnetvit_gene_adapter \
    --backbone_weights gigapath_backbone.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # setup (defaut_args.py)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--multi_seed", default=0, type=int,
                   help="1 = run seeds s, s+1, s+2")
    # training
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--weight_decay", default=0.01, type=float)
    p.add_argument("--beta1", default=0.9, type=float)
    p.add_argument("--beta2", default=0.999, type=float)
    p.add_argument("--num_epochs", default=20, type=int)
    p.add_argument("--eval_interval", default=1, type=int)
    p.add_argument("--labelset", default="primary_class", type=str)
    # data
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--train_json", default="./train.json", type=str)
    p.add_argument("--val_json", default="./val.json", type=str)
    p.add_argument("--test_json", default="./test.json", type=str)
    p.add_argument("--genomics_csv_path", default="", type=str)
    p.add_argument("--text_location", default="", type=str)
    p.add_argument("--clinical_location", default="", type=str)
    p.add_argument("--pathway_csv", default="", type=str)
    p.add_argument("--threshold", default=25000, type=int)
    p.add_argument("--buckets", default="4095,8191,16383,25599", type=str)
    # model
    p.add_argument("--mil_name", default="longnetvit_gene_adapter",
                   choices=["longnetvit_gene_adapter",
                            "longnetvit_gene_clinical_adapter",
                            "titan_gene_adapter",
                            "titan_gene_clinical_adapter",
                            "gene_mixer_group", "abmil", "transmil"])
    p.add_argument("--fusion", default="none", choices=["none", "cat"],
                   help="'cat' adds the gene-mixer late-fusion branch to "
                        "the abmil/transmil baselines (the paper's "
                        "'(cat)' rows)")
    p.add_argument("--num_tasks", default=3, type=int)
    p.add_argument("--num_classes", default=2, type=int,
                   help="classifier/survival head width for the "
                        "genomics-only baseline (gene_mixer_group)")
    p.add_argument("--mode", default="classifier",
                   choices=["classifier", "survival"],
                   help="output head for gene_mixer_group (the adapter "
                        "models always run in 'feature' mode, like "
                        "train_modaltune.py:80)")
    p.add_argument("--backbone_weights", default="", type=str,
                   help="converted backbone .npz (tools/convert_gigapath)")
    p.add_argument("--pancancer", default=0, type=int)
    p.add_argument("--bf16", default=1, type=int)
    # output / eval
    p.add_argument("--output_path", default="./results", type=str)
    p.add_argument("--save_embeddings", action="store_true", default=False)
    p.add_argument("--eval_only", default=0, type=int)
    p.add_argument("--eval_weights", default="", type=str)
    p.add_argument("--reference_quirks", default=0, type=int,
                   help="reproduce the 6-iteration epoch cap")
    p.add_argument("--num_folds", default=0, type=int,
                   help=">1 runs case-level k-fold cross-validation over "
                        "the train split")
    # synthetic smoke mode (no external data needed)
    p.add_argument("--synthetic", default=0, type=int)
    p.add_argument("--learnable", default=0, type=int,
                   help="synthetic labels derived from the gene vector "
                        "(learnability smoke: val bal-acc must rise "
                        "above chance)")
    p.add_argument("--tiny", default=0, type=int,
                   help="tiny test model + small synthetic bags (CI "
                        "smoke; implies --synthetic geometry, like the "
                        "reference's LongNet_test config)")
    p.add_argument("--gc", "--grad_accum", dest="grad_accum", default=1,
                   type=int,
                   help="gradient accumulation steps (the reference "
                        "parses --gc but never uses it; here honored)")
    p.add_argument("--fused_attention", default=1, type=int,
                   help="0 disables the fused Pallas dilated-attention "
                        "path (falls back to the XLA pipeline)")
    p.add_argument("--distributed", default=0, type=int,
                   help="bootstrap jax.distributed from SLURM/torchrun "
                        "env for multi-host data parallelism")
    p.add_argument("--dp", default="auto", type=str,
                   help="single-process multi-chip data parallelism: "
                        "'auto' uses every local device when >1, '0'/'1' "
                        "disables, N uses N devices (batch size is "
                        "rounded up to a multiple of the mesh size)")
    p.add_argument("--save_interval", default=0, type=int,
                   help="full-state (params+optimizer) checkpoint every "
                        "N epochs, with auto-resume at start; 0 = off")
    return p


def load_real_datasets(args):
    from modaltune_tpu.data import (FeatureBagDataset, GenePacker,
                                    load_gene_csv, load_split_json,
                                    pathway_gene_groups)
    from modaltune_tpu.utils.constants import SITE_LABEL
    matrix, case_ids, gene_names = load_gene_csv(args.genomics_csv_path)
    groups = pathway_gene_groups(args.pathway_csv)
    packer = GenePacker.build(groups, gene_names)

    from modaltune_tpu.data import load_embedding_dict
    text = load_embedding_dict(args.text_location)
    clinical = load_embedding_dict(args.clinical_location) \
        if args.clinical_location else None
    datasets = {}
    for name, path in (("train", args.train_json), ("val", args.val_json),
                       ("test", args.test_json)):
        rows = load_split_json(path)
        if isinstance(rows, dict):
            rows = rows["data"]
        datasets[name] = FeatureBagDataset(
            rows, matrix, case_ids, packer, text, clinical=clinical,
            labelset=args.labelset, threshold=args.threshold,
            site_label=SITE_LABEL if args.pancancer else None)
    return datasets, packer


def load_synthetic_datasets(args, in_chans: int = 1536,
                            bag_range=(256, 1024)):
    from modaltune_tpu.data import SyntheticSlideDataset
    packer = SyntheticSlideDataset(n_cases=1).packer
    clin = 5 if "clinical" in args.mil_name else 0
    learnable = bool(getattr(args, "learnable", 0))
    n_cases = 24 if learnable else 8
    datasets = {
        name: SyntheticSlideDataset(
            n_cases=n_cases, in_chans=in_chans, bag_range=bag_range,
            packer=packer, clinical_dim=clin, threshold=args.threshold,
            seed=i, n_sites=4 if args.pancancer else 1,
            learnable=learnable)
        for i, name in enumerate(("train", "val", "test"))}
    return datasets, packer


def run_gene_baseline(args, datasets, packer):
    """Genomics-only baseline: gene_mixer_group with classifier /
    survival heads (BASELINE.md's Gene-Mixer rows)."""
    import jax
    import jax.numpy as jnp
    from modaltune_tpu.configs import GeneEncoderConfig, TrainConfig
    from modaltune_tpu.models import create_aggregator
    from modaltune_tpu.train.gene_trainer import GeneBaselineTrainer

    model = create_aggregator(
        "gene_mixer_group", cfg=GeneEncoderConfig(),
        n_gene_groups=packer.n_groups,
        max_group_len=packer.max_group_len,
        n_classes=args.num_classes, mode=args.mode)
    tcfg = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                       beta1=args.beta1, beta2=args.beta2,
                       num_epochs=args.num_epochs, seed=args.seed,
                       eval_interval=args.eval_interval)
    out_dir = Path(args.output_path) / f"seed_{args.seed}"
    trainer = GeneBaselineTrainer(model, tcfg, datasets, str(out_dir),
                                  batch_size=max(args.batch_size, 8))
    rng = np.random.RandomState(0)
    ex = datasets["train"].get(0, rng)
    params = jax.jit(lambda r: model.init(
        r, jnp.asarray(ex.genes[None]))["params"])(
        jax.random.PRNGKey(args.seed))
    best = trainer.run(params)
    print(f"seed {args.seed}: best val metric = {best:.4f}")
    return best


def run_mil_baseline(args, datasets, packer):
    """Supervised ABMIL / TransMIL baselines over cached feature bags
    (BASELINE.json target configs #1-#2; reference CLI default
    ``--mil_name abmil``, train_modaltune.py:615)."""
    import jax
    import jax.numpy as jnp
    from modaltune_tpu.configs import GeneEncoderConfig, TrainConfig
    from modaltune_tpu.models import create_aggregator
    from modaltune_tpu.train.mil_trainer import MilBaselineTrainer

    kwargs = dict(n_classes=args.num_classes, mode=args.mode)
    if args.fusion == "cat":
        kwargs.update(gene_cfg=GeneEncoderConfig(),
                      n_gene_groups=packer.n_groups,
                      max_group_len=packer.max_group_len)
    model = create_aggregator(args.mil_name, **kwargs)
    tcfg = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                       beta1=args.beta1, beta2=args.beta2,
                       num_epochs=args.num_epochs, seed=args.seed,
                       eval_interval=args.eval_interval)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    out_dir = Path(args.output_path) / f"seed_{args.seed}"
    trainer = MilBaselineTrainer(model, tcfg, datasets, str(out_dir),
                                 batch_size=max(args.batch_size, 4),
                                 buckets=buckets)
    rng = np.random.RandomState(0)
    ex = datasets["train"].get(0, rng)
    l0 = min(ex.bag.shape[0], 256)
    init_args = [jnp.asarray(ex.bag[None, :l0]),
                 jnp.asarray(np.ones((1, l0), bool))]
    if args.fusion == "cat":
        init_args.append(jnp.asarray(ex.genes[None]))
    params = jax.jit(lambda r: model.init(r, *init_args)["params"])(
        jax.random.PRNGKey(args.seed))
    best = trainer.run(params)
    print(f"seed {args.seed}: best val metric = {best:.4f}")
    return best


def run_one_seed(args):
    import jax
    import jax.numpy as jnp
    from modaltune_tpu.configs import (TrainConfig, TitanModalTuneConfig,
                                       gigapath_modaltune_config,
                                       tiny_test_config)
    from modaltune_tpu.models import create_aggregator
    from modaltune_tpu.train.pancancer_trainer import PanCancerTrainer
    from modaltune_tpu.train.trainer import ModalTuneTrainer
    from modaltune_tpu.utils.params_io import load_params_npz

    if args.tiny:
        tiny_chans = tiny_test_config().backbone.in_chans
        if not args.synthetic and Path(args.train_json).exists():
            # tiny MODEL on REAL artifacts: lets the reference's exact
            # on-disk formats (.pt feature/text/clinical dicts, split
            # JSONs, gene CSV) run train->eval->deploy end-to-end at
            # CI-sized geometry (tests/test_dropin_e2e.py)
            datasets, packer = load_real_datasets(args)
        else:
            datasets, packer = load_synthetic_datasets(
                args, in_chans=tiny_chans, bag_range=(40, 80))
        if args.buckets == "4095,8191,16383,25599":
            args.buckets = "96"
    elif args.synthetic:
        datasets, packer = load_synthetic_datasets(args)
    else:
        datasets, packer = load_real_datasets(args)

    if args.mil_name == "gene_mixer_group":
        return run_gene_baseline(args, datasets, packer)
    if args.mil_name in ("abmil", "transmil"):
        return run_mil_baseline(args, datasets, packer)

    if args.mil_name.startswith("titan"):
        # TITAN consumes grid-scattered cells, not raw patch bags
        from modaltune_tpu.data import TitanGridDataset
        datasets = {k: TitanGridDataset(v) for k, v in datasets.items()}

    clinical = "clinical" in args.mil_name
    if args.mil_name.startswith("titan"):
        model_cfg = TitanModalTuneConfig()
    elif args.tiny:
        model_cfg = tiny_test_config(clinical=clinical)
    else:
        model_cfg = gigapath_modaltune_config(clinical=clinical)
    # eval-only deploys rebuild the model from the config.json saved next
    # to the weights, so drifted CLI flags can't silently build a model
    # that mismatches the checkpoint (train_modaltune.py:563-586 reloads
    # the run config the same way; only data paths come from the CLI)
    if args.eval_only and args.eval_weights:
        from modaltune_tpu.configs import model_config_from_dict
        cfg_path = Path(args.eval_weights).parent / "config.json"
        if cfg_path.exists():
            with open(cfg_path) as f:
                saved = json.load(f)
            if saved.get("model"):
                model_cfg = model_config_from_dict(saved["model"])
                print(f"eval_only: model config reloaded from {cfg_path}")
            if saved.get("buckets"):
                args.buckets = ",".join(str(b) for b in saved["buckets"])
        else:
            print(f"eval_only: WARNING no config.json next to "
                  f"{args.eval_weights}; building from CLI flags")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if not args.fused_attention and hasattr(model_cfg, "backbone") and \
            hasattr(model_cfg.backbone, "fused_attention"):
        import dataclasses as _dc
        model_cfg = _dc.replace(
            model_cfg, backbone=_dc.replace(model_cfg.backbone,
                                            fused_attention=False))
    model = create_aggregator(args.mil_name, cfg=model_cfg,
                              n_gene_groups=packer.n_groups,
                              max_group_len=packer.max_group_len,
                              dtype=dtype)

    tcfg = TrainConfig(lr=args.lr, weight_decay=args.weight_decay,
                       beta1=args.beta1, beta2=args.beta2,
                       num_epochs=args.num_epochs, seed=args.seed,
                       eval_interval=args.eval_interval,
                       num_tasks=args.num_tasks,
                       threshold=args.threshold,
                       grad_accum=args.grad_accum,
                       reference_quirks=bool(args.reference_quirks),
                       save_interval=args.save_interval)
    buckets = tuple(int(b) for b in args.buckets.split(","))
    out_dir = Path(args.output_path) / f"seed_{args.seed}"
    cls = PanCancerTrainer if args.pancancer else ModalTuneTrainer
    # multi-host DP: SLURM/torchrun env (or --distributed) bootstraps the
    # jax distributed runtime; each process trains on a disjoint
    # case-modulo shard with cross-process gradient sync (DdpGradSync)
    # and eval embeddings are re-gathered
    # (parallel/multihost.py — base_trainer.py:160-211 equivalent)
    shard = None
    if args.distributed:
        from modaltune_tpu.parallel.multihost import init_distributed
        pid, nproc = init_distributed()
        if nproc > 1:
            shard = (pid, nproc)
    # single-process multi-chip DP (base_trainer.py:160-211's DDP over
    # local GPUs): shard_map over a data-axis mesh, no hand-wiring needed
    mesh, batch_size = None, args.batch_size
    if shard is None and args.dp not in ("0", "1"):
        n_data = jax.device_count() if args.dp == "auto" else \
            min(int(args.dp), jax.device_count())
        if n_data > 1:
            from modaltune_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(n_data=n_data)
            print(f"--dp: data-parallel over {n_data} devices")
            if batch_size % n_data:
                batch_size = n_data * ((batch_size + n_data - 1) // n_data)
                print(f"--dp: batch_size rounded up to {batch_size} "
                      f"(multiple of the {n_data}-device data mesh)")
    trainer = cls(model, tcfg, datasets, str(out_dir), buckets=buckets,
                  batch_size=batch_size, process_shard=shard, mesh=mesh,
                  model_cfg=model_cfg)

    # init params on a small example
    rng = np.random.RandomState(0)
    ex = datasets["train"].get(0, rng)
    l0 = min(ex.bag.shape[0], 256)
    params = jax.jit(lambda r: model.init(
        r, jnp.asarray(ex.bag[None, :l0]),
        jnp.asarray(ex.coords[None, :l0]), jnp.asarray(ex.genes[None]),
        task_token=jnp.eye(args.num_tasks)[:1],
        clinical=(jnp.asarray(ex.clinical[None])
                  if ex.clinical is not None else None))["params"])(
        jax.random.PRNGKey(args.seed))
    if args.backbone_weights:
        loaded = load_params_npz(args.backbone_weights)
        params = dict(params)
        params["backbone"] = loaded.get("backbone", loaded)
        print(f"loaded backbone weights from {args.backbone_weights}")

    if args.eval_only:
        trainer.init_state(params, frozen_dtype=dtype)
        return trainer.deploy(weights_path=args.eval_weights or None)

    if args.num_folds > 1:
        from modaltune_tpu.data import kfold_splits
        fold_metrics = []
        for k, (tr, va) in enumerate(kfold_splits(datasets["train"],
                                                  args.num_folds,
                                                  seed=args.seed)):
            fold_sets = dict(datasets)
            fold_sets["train"], fold_sets["val"] = tr, va
            fold_trainer = cls(model, tcfg, fold_sets,
                               str(out_dir / f"fold_{k}"),
                               buckets=buckets,
                               batch_size=args.batch_size,
                               model_cfg=model_cfg)
            fold_metrics.append(fold_trainer.run(params,
                                                 frozen_dtype=dtype))
        print(f"k-fold metrics: {fold_metrics} "
              f"mean={np.mean(fold_metrics):.4f}")
        return float(np.mean(fold_metrics))

    best = trainer.run(params, frozen_dtype=dtype)
    print(f"seed {args.seed}: best val metric = {best:.4f}")
    if args.save_embeddings:
        trainer.deploy(weights_path=str(out_dir /
                                        "best_model_weights.npz"))
    return best


def main():
    args = build_parser().parse_args()
    seeds = [args.seed, args.seed + 1, args.seed + 2] if args.multi_seed \
        else [args.seed]
    results = []
    for seed in seeds:
        args.seed = seed
        results.append(run_one_seed(args))
    if len(results) > 1 and all(isinstance(r, float) for r in results):
        print(f"multi-seed mean={np.mean(results):.4f} "
              f"std={np.std(results):.4f}")


if __name__ == "__main__":
    main()
