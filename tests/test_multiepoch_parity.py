"""Multi-epoch cross-framework training equivalence (VERDICT r4 #2).

Runs the REFERENCE PyTorch trainer semantics (``train_modaltune.py``:
``train_one_epoch`` at :181-250 — per-slide 3-task forwards, L2-
normalized logits, KLDiv(sum) x T^2 x 10, AdamW over requires_grad
params, the epoch-stepped x20-over-10-epochs warmup -> cosine schedule
of :64-65,151-154,242) side by side with the rebuild's jitted train
step from CONVERTED IDENTICAL INIT on the same synthetic learnable
dataset, for 14 epochs (10 warmup + 4 cosine — both schedule regimes),
then extracts embeddings from both (``get_features``,
train_modaltune.py:252-327: raw unnormalized logits) and scores both
through the same LogReg+CoxPH readout protocol
(``test_utils_modaltune.py:133-171`` / eval/readout.perform_testing).

Asserts:
  * the per-epoch LR applied by the torch loop equals the rebuild's
    ``warmup_cosine_epoch_schedule`` at every epoch;
  * per-epoch mean train losses track across all 14 epochs;
  * both losses actually decrease (the dataset is learnable by design:
    class-conditional text targets + class-shifted gene/bag signal);
  * final val balanced accuracy and C-index from the shared readout
    agree within a band, with the reference's own score as the anchor
    (replacing the loose absolute thresholds of the learnability smoke).

The pip ``warmup_scheduler.GradualWarmupScheduler`` the reference
imports is not installable here; the torch loop drives its LR from the
same closed form the package documents (lr/20 at epoch 0, linear to lr
at epoch WARMUP_EP, cosine anneal over the remaining epochs) — which is
exactly what the rebuild's schedule implements, so the comparison pins
the two frameworks to one verified-identical schedule.

Run directly for a verbose report: ``python tests/test_multiepoch_parity.py``
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")

BAG = 511           # + cls = 512: every clamped dilated branch segments
                    # exactly (segment lengths are 1024/5792/... -> all
                    # clamp to 512), so reference zero-pad semantics and
                    # the rebuild's masking agree bit-for-bit
IN_CHANS = 64
EMBED = 384         # tiny-but-real: 12 heads x 32, depth 3, 2 spans
DEPTH = 3
GRID = 64
N_GENES = 60
N_GROUPS = 12
OUT_DIM = 256
N_TRAIN, N_VAL = 6, 12   # 6 train cases == the reference's 6-iteration
                         # epoch cap (train_modaltune.py:196-197), so
                         # "one epoch" means the same thing on both sides
EPOCHS, WARM_EP, WARM_FACTOR = 14, 10, 20.0
LR, WD, TEMP = 5e-4, 0.01, 1.0


def _epoch_lr(e: int) -> float:
    """The reference schedule, closed form (train_modaltune.py:64-65,
    139-154: optimizer starts at lr/20, GradualWarmupScheduler x20 over
    10 epochs, CosineAnnealingLR(num_epochs-10) after, stepped once per
    epoch at :242)."""
    base = LR / WARM_FACTOR
    if e < WARM_EP:
        return base * (1.0 + (WARM_FACTOR - 1.0) * e / WARM_EP)
    ce = min(e - WARM_EP, EPOCHS - WARM_EP)
    return LR * 0.5 * (1.0 + np.cos(np.pi * ce / (EPOCHS - WARM_EP)))


def _make_cases(rng: np.random.RandomState, n: int, groups: dict,
                protos: np.ndarray):
    """Synthetic learnable cohort. Class c flips: a +/-1.5 shift on gene
    block 0, a +/-0.4 bag shift along a fixed channel direction, the
    class's text-target prototype, and survival time (class 1 lives
    longer) — so KD training toward the class prototype makes
    embeddings linearly separable and survival-ordered."""
    u = np.random.RandomState(99).randn(IN_CHANS).astype(np.float32)
    u /= np.linalg.norm(u)
    block0 = [int(g[1:]) for g in groups[0]]
    cases = []
    for i in range(n):
        c = i % 2
        sign = 2 * c - 1
        bag = rng.randn(BAG, IN_CHANS).astype(np.float32) + \
            0.4 * sign * u
        coords = (rng.randint(0, GRID, (BAG, 2)) * 256).astype(np.float32)
        genes = rng.randn(N_GENES).astype(np.float32)
        genes[block0] += 1.5 * sign
        dur = float(60.0 + 40.0 * c + 5.0 * rng.randn())
        cases.append(dict(bag=bag, coords=coords, genes=genes, cls=c,
                          text3=protos[c],
                          meta={"primary_class": c, "durations": dur,
                                "vital_status": 1}))
    return cases


def run_parity(verbose: bool = False):
    from torch_ref import load_reference
    load_reference()
    from models.aggregators.aggregators import Aggregator

    import jax
    import jax.numpy as jnp
    from convert_modaltune import convert_modaltune_state_dict
    from modaltune_tpu.configs import (AdapterConfig, GeneEncoderConfig,
                                       ModalTuneConfig,
                                       SlideEncoderConfig, TrainConfig)
    from modaltune_tpu.data.pathways import GenePacker
    from modaltune_tpu.eval.readout import perform_testing
    from modaltune_tpu.models import ModalTuneModel
    from modaltune_tpu.models.longnet import default_spans
    from modaltune_tpu.train.state import (TrainState, make_optimizer,
                                           split_params,
                                           warmup_cosine_epoch_schedule)
    from modaltune_tpu.train.train_step import (make_embed_step,
                                                make_train_step)

    rng = np.random.RandomState(11)
    gene_names = [f"g{i}" for i in range(N_GENES)]
    groups = {i: [f"g{j}" for j in
                  rng.choice(N_GENES, rng.randint(3, 8), replace=False)]
              for i in range(N_GROUPS)}

    # two class prototypes: rows [0,1,3] of the per-case text embedding
    # (the reference's selection at train_modaltune.py:233), normalized
    # like the projector output at :228-229
    protos = np.random.RandomState(5).randn(2, 3, OUT_DIM)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    protos = protos.astype(np.float32)

    train_cases = _make_cases(rng, N_TRAIN, groups, protos)
    val_cases = _make_cases(rng, N_VAL, groups, protos)

    torch.manual_seed(3)
    ref = Aggregator.create(
        "longnetvit_gene_adapter",
        num_heads=12, gene_group_defination=groups,
        geneclass_name="gene_mixer_group", output_dim=OUT_DIM,
        init_values=0.0, interaction_indexes=[[0, 1], [2, 2]],
        with_cffn=True, cffn_ratio=0.25, add_prompt_feature=True,
        use_extra_extractor=True, freeze_vit=True, use_prompt_sa=True,
        prompt_dropout=0.0, prompt_agg="avg", token_agg="sum",
        pretrained=False, multi_task=3,
        in_chans=IN_CHANS, embed_dim=EMBED, depth=DEPTH,
        slide_ngrids=GRID, global_pool=False, dropout=0.0,
        drop_path_rate=0.0, mlp_ratio=4)
    sd0 = {k: v.detach().clone().numpy()
           for k, v in ref.state_dict().items()}

    def to_torch(case):
        genes = {i: torch.from_numpy(
            case["genes"][[int(g[1:]) for g in groups[i]]])[None]
            for i in range(N_GROUPS)}
        return (torch.from_numpy(case["bag"][None]),
                torch.from_numpy(case["coords"][None]), genes,
                torch.from_numpy(case["text3"]))

    # ---- reference loop (train_one_epoch semantics) ----
    ref.train()
    # deterministic-training control: the reference HARDCODES gene-
    # encoder dropout 0.25 (set_genomic_config,
    # model_configs/other_configs.py:17 — the top-level dropout kwarg
    # never reaches it), which would make the torch trajectory a
    # stochastic process no cross-framework run can track. Every other
    # dropout is configured 0.0 above, so eval()-freezing the dropout
    # modules is exactly "same model, noise off" on both sides (the
    # rebuild side runs GeneEncoderConfig(dropout=0.0)).
    for m in ref.modules():
        if isinstance(m, (torch.nn.Dropout, torch.nn.AlphaDropout)):
            m.eval()
    opt = torch.optim.AdamW(
        [{"params": [p for p in ref.parameters() if p.requires_grad],
          "lr": LR / WARM_FACTOR}],
        weight_decay=WD, betas=(0.9, 0.999))
    loss_fn = torch.nn.KLDivLoss(reduction="sum")  # train_modaltune.py:91
    order_rng = np.random.RandomState(123)
    orders = [order_rng.permutation(N_TRAIN) for _ in range(EPOCHS)]
    ref_epoch_loss = []
    for e in range(EPOCHS):
        for g in opt.param_groups:        # scheduler.step() stand-in
            g["lr"] = _epoch_lr(e)
        total = 0.0
        opt.zero_grad()
        for i in orders[e]:
            bag, coords, genes, text3 = to_torch(train_cases[i])
            logits = torch.cat([
                ref(bag, coords, genes, task_token=torch.eye(3)[t])
                for t in range(3)], dim=0)
            logits = logits / logits.norm(dim=-1, keepdim=True)
            loss = loss_fn(
                torch.nn.functional.log_softmax(logits / TEMP, dim=1),
                torch.nn.functional.softmax(text3 / TEMP, dim=1),
            ) * (TEMP ** 2) * 10
            loss.backward()
            opt.step()
            opt.zero_grad()
            total += float(loss.detach())
        ref_epoch_loss.append(total / N_TRAIN)
        if verbose:
            print(f"[ref] epoch {e:2d} lr {_epoch_lr(e):.3e} "
                  f"loss {ref_epoch_loss[-1]:.5f}", flush=True)

    ref.eval()
    with torch.no_grad():
        def t_embed(cases):
            out = []
            for case in cases:
                bag, coords, genes, _ = to_torch(case)
                out.append(torch.cat([
                    ref(bag, coords, genes, task_token=torch.eye(3)[t])
                    for t in range(3)], dim=0).numpy())
            return np.stack(out)                    # (N, 3, 256) raw
        ref_xtr, ref_xva = t_embed(train_cases), t_embed(val_cases)

    # ---- rebuild: converted identical init, same data/order/schedule --
    cfg = ModalTuneConfig(
        backbone=SlideEncoderConfig(in_chans=IN_CHANS, embed_dim=EMBED,
                                    depth=DEPTH, dropout=0.0,
                                    drop_path_rate=0.0),
        adapter=AdapterConfig(num_heads=12,
                              interaction_indexes=((0, 1), (2, 2)),
                              drop_path_rate=0.0),
        gene=GeneEncoderConfig(output_dim=EMBED, dropout=0.0))
    spans = default_spans(cfg.backbone.longnet(),
                          cfg.adapter.interaction_indexes)
    tree = convert_modaltune_state_dict(sd0, spans=spans)
    packer = GenePacker.build(groups, gene_names)
    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len)

    tcfg = TrainConfig(lr=LR, weight_decay=WD, num_epochs=EPOCHS,
                       warmup_epochs=WARM_EP, warmup_factor=WARM_FACTOR,
                       temperature=TEMP, num_tasks=3)
    sched = warmup_cosine_epoch_schedule(tcfg, steps_per_epoch=N_TRAIN)
    for e in range(EPOCHS):   # schedule equivalence, every epoch
        np.testing.assert_allclose(float(sched(e * N_TRAIN)),
                                   _epoch_lr(e), rtol=1e-6)
        np.testing.assert_allclose(float(sched(e * N_TRAIN + N_TRAIN - 1)),
                                   _epoch_lr(e), rtol=1e-6)

    tx = make_optimizer(tcfg, steps_per_epoch=N_TRAIN)
    state = TrainState.create(params=jax.tree.map(jnp.asarray, tree),
                              tx=tx)
    step = make_train_step(model, tcfg, donate=False)

    def to_batch(case):
        return {"bag": jnp.asarray(case["bag"][None]),
                "coords": jnp.asarray(case["coords"][None]),
                "mask": jnp.ones((1, BAG), bool),
                "genes": jnp.asarray(packer.pack(case["genes"])[None]),
                "clinical": None}

    key = jax.random.PRNGKey(0)
    jax_epoch_loss = []
    for e in range(EPOCHS):
        total = 0.0
        for i in orders[e]:
            case = train_cases[i]
            state, loss = step(state, to_batch(case),
                               jnp.asarray(case["text3"])[None], key)
            total += float(loss)
        jax_epoch_loss.append(total / N_TRAIN)
        if verbose:
            print(f"[jax] epoch {e:2d} loss {jax_epoch_loss[-1]:.5f}",
                  flush=True)

    embed = make_embed_step(model, tcfg)

    def j_embed(cases):
        return np.stack([np.asarray(embed(state, to_batch(c))[0])
                         for c in cases])
    jax_xtr, jax_xva = j_embed(train_cases), j_embed(val_cases)

    # ---- shared readout protocol on both frameworks' embeddings ----
    meta_tr = [c["meta"] for c in train_cases]
    meta_va = [c["meta"] for c in val_cases]
    ref_res = perform_testing(ref_xtr, meta_tr, ref_xva, meta_va)
    jax_res = perform_testing(jax_xtr, meta_tr, jax_xva, meta_va)

    return dict(ref_loss=ref_epoch_loss, jax_loss=jax_epoch_loss,
                ref_metrics=ref_res, jax_metrics=jax_res)


@pytest.mark.slow
def test_multiepoch_training_parity():
    out = run_parity()
    ref_l = np.array(out["ref_loss"])
    jax_l = np.array(out["jax_loss"])

    # per-epoch train-loss trajectories track across warmup AND cosine
    np.testing.assert_allclose(jax_l, ref_l, rtol=0.05, atol=1e-3)
    # both actually learn (the trajectory is not flat noise)
    assert ref_l[-1] < 0.8 * ref_l[0]
    assert jax_l[-1] < 0.8 * jax_l[0]

    # readout metrics: reference-anchored bands per task
    for task in ("General", "Diagnosis", "Survival"):
        r, j = out["ref_metrics"][task], out["jax_metrics"][task]
        assert abs(r["c_index"] - j["c_index"]) <= 0.10, (task, r, j)
        if "bal_acc" in r:
            assert abs(r["bal_acc"] - j["bal_acc"]) <= 0.17, (task, r, j)
    # and the anchor itself is meaningful: the reference run must have
    # learned the diagnosis task well above chance on this cohort
    assert out["ref_metrics"]["Diagnosis"]["bal_acc"] >= 0.75


if __name__ == "__main__":
    # direct runs don't get conftest's CPU pin; keep the TPU free
    import jax
    jax.config.update("jax_platforms", "cpu")
    res = run_parity(verbose=True)
    import json
    slim = {k: ({t: {m: v for m, v in d.items()
                     if not isinstance(v, (list, dict))}
                 for t, d in res[k].items()}
                if k.endswith("metrics") else res[k])
            for k in res}
    print(json.dumps(slim, indent=1, default=float))
