"""Numerical parity vs the reference PyTorch forward (CPU).

SURVEY.md M2: "verify logit parity vs a CPU PyTorch reference forward
on a fixed bag". The reference model is built from /root/reference with
the flash shim replaced by a dense torch implementation (tests/torch_ref
.py); weights are converted with tools/convert_gigapath.py and the same
bag is pushed through the JAX rebuild.

Shapes are chosen so no dilated segment needs padding (the reference
lets zero-padded tokens join the softmax, ``dilated_attention.py:
96-101``; the rebuild deliberately masks them — a documented semantic
improvement that would otherwise show up as a diff at padded segments):
seq_len = bag + cls = 2048 divides every effective segment length.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

torch = pytest.importorskip("torch")

BAG = 2047          # + cls = 2048: every branch segments exactly
GRID = 64           # small pos-embed grid (the reference's default 1000
                    # grid allocates a 3 GB buffer; sincos values only
                    # depend on the (i, j) cell, which we keep in-grid)
IN_CHANS = 64
DEPTH = 3
EMBED = 768


@pytest.fixture(scope="module")
def ref_env():
    from torch_ref import load_reference
    return load_reference()


@pytest.fixture(scope="module")
def bag():
    rng = np.random.RandomState(0)
    x = rng.randn(1, BAG, IN_CHANS).astype(np.float32)
    ij = rng.randint(0, GRID, (1, BAG, 2))
    coords = (ij * 256).astype(np.float32)
    return x, coords


def test_segment_schedule_matches(ref_env):
    """Our closed-form schedule == the reference's eval()'d string."""
    from modaltune_tpu.configs import optimal_segment_lengths
    ref = ref_env.slide.LongNetViT.get_optimal_segment_length(
        None, 262144, 256)
    ref_vals = [int(v) for v in
                ref.replace("np.int64(", "").replace(")", "")
                .strip("[]").split(",")]
    assert tuple(ref_vals) == tuple(optimal_segment_lengths(262144, 256))


def test_backbone_logit_parity(ref_env, bag):
    """fp32 cls-embedding parity: reference LongNetViT forward vs the
    converted JAX rebuild (slide_encoder.py:213-290 path)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.convert_gigapath import convert_backbone_spanned
    from modaltune_tpu.configs import SlideEncoderConfig
    from modaltune_tpu.models.slide_encoder import LongNetViT

    torch.manual_seed(0)
    ref = ref_env.slide.LongNetViT(
        in_chans=IN_CHANS, embed_dim=EMBED, depth=DEPTH,
        slide_ngrids=GRID, global_pool=False).eval()
    x, coords = bag
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(coords))[0]
    want = want.numpy()

    spans = ((0, DEPTH),)
    params = convert_backbone_spanned(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        spans=spans)
    cfg = SlideEncoderConfig(in_chans=IN_CHANS, embed_dim=EMBED,
                             depth=DEPTH, dropout=0.0,
                             drop_path_rate=0.0)
    model = LongNetViT(cfg, spans=spans)
    got = model.apply({"params": params}, x, coords,
                      deterministic=True)
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_dense_flash_shim_lse(ref_env):
    """The dense stand-in matches the reference's own bmm fallback
    semantics (multihead_attention.py:79-108) including the LSE."""
    from torch_ref import dense_flash_attn_func
    torch.manual_seed(1)
    q = torch.randn(2, 32, 4, 16)
    k = torch.randn(2, 32, 4, 16)
    v = torch.randn(2, 32, 4, 16)
    o, lse = dense_flash_attn_func(q, k, v)
    s = torch.einsum("blhd,bshd->bhls", q, k) * 16 ** -0.5
    p = torch.softmax(s, -1)
    want = torch.einsum("bhls,bshd->blhd", p, v)
    assert torch.allclose(o, want, atol=1e-6)
    assert torch.allclose(lse, torch.logsumexp(s, -1), atol=1e-6)


@pytest.mark.slow
def test_adapter_logit_parity(ref_env, bag):
    """Full ModalTune forward parity: reference LongNetGeneAdapter
    (longvit_adapter.py:205-347) vs the converted JAX ModalTuneModel,
    per task token. Exercises every conversion trap SURVEY.md lists:
    cross-attention in_proj layouts, Conv1d mixer kernels, SNN stacks,
    LN eps, the double-residual fusion quirks."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.path.insert(0,
                    str(Path(__file__).resolve().parent.parent / "tools"))
    from convert_modaltune import convert_modaltune_state_dict
    from modaltune_tpu.configs import (AdapterConfig, GeneEncoderConfig,
                                       ModalTuneConfig,
                                       SlideEncoderConfig)
    from modaltune_tpu.data.pathways import GenePacker
    from modaltune_tpu.models import ModalTuneModel
    from modaltune_tpu.models.longnet import default_spans
    import jax.numpy as jnp

    from models.aggregators.aggregators import Aggregator

    rng = np.random.RandomState(7)
    n_genes = 100
    gene_names = [f"g{i}" for i in range(n_genes)]
    groups = {i: [f"g{j}" for j in
                  rng.choice(n_genes, rng.randint(3, 10), replace=False)]
              for i in range(20)}

    torch.manual_seed(0)
    ref = Aggregator.create(
        "longnetvit_gene_adapter",
        num_heads=12, gene_group_defination=groups,
        geneclass_name="gene_mixer_group", output_dim=256,
        init_values=0.0, interaction_indexes=[[0, 1], [2, 2]],
        with_cffn=True, cffn_ratio=0.25, add_prompt_feature=True,
        use_extra_extractor=True, freeze_vit=True, use_prompt_sa=True,
        prompt_dropout=0.0, prompt_agg="avg", token_agg="sum",
        pretrained=False, multi_task=3,
        in_chans=IN_CHANS, embed_dim=EMBED, depth=DEPTH,
        slide_ngrids=GRID, global_pool=False, dropout=0.25,
        drop_path_rate=0.1, mlp_ratio=4).eval()

    x, coords = bag
    gene_vec = rng.randn(n_genes).astype(np.float32)
    ref_genes = {i: torch.from_numpy(
        gene_vec[[int(g[1:]) for g in groups[i]]])[None] for i in
        range(20)}
    outs = []
    with torch.no_grad():
        for t in range(3):
            tok = torch.zeros(3)
            tok[t] = 1.0
            o = ref(torch.from_numpy(x), torch.from_numpy(coords),
                    ref_genes, task_token=tok)
            outs.append(o.numpy() if isinstance(o, torch.Tensor)
                        else np.asarray(o))
    want = np.concatenate([np.asarray(o).reshape(1, -1) for o in outs])

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
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = convert_modaltune_state_dict(sd, spans=spans)

    packer = GenePacker.build(groups, gene_names)
    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len)
    genes = jnp.asarray(packer.pack(gene_vec)[None])
    rep = lambda a: jnp.broadcast_to(jnp.asarray(a),
                                     (3,) + a.shape[1:])
    got = model.apply({"params": jax.tree.map(jnp.asarray, tree)},
                      rep(x), rep(coords),
                      rep(np.asarray(genes)),
                      task_token=jnp.eye(3), deterministic=True)
    got = np.asarray(got, np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=3e-3)


@pytest.mark.slow
def test_train_step_trajectory_parity(ref_env, bag):
    """End-to-end training-dynamics parity (VERDICT r2 next #9): N
    AdamW steps of the reference trainer semantics
    (``train_modaltune.py:181-250``: 3 sequential task forwards,
    L2-normalized logits, KLDiv(sum) x T^2 x 10, lr/WARMUP_FACTOR in
    the first warmup epoch, ``train_modaltune.py:139-154``) vs the
    rebuild's jitted ``make_train_step`` from the same converted
    weights, same bag/text. Loss trajectories must track step by step."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.path.insert(0,
                    str(Path(__file__).resolve().parent.parent / "tools"))
    from convert_modaltune import convert_modaltune_state_dict
    from modaltune_tpu.configs import (AdapterConfig, GeneEncoderConfig,
                                       ModalTuneConfig,
                                       SlideEncoderConfig, TrainConfig)
    from modaltune_tpu.data.pathways import GenePacker
    from modaltune_tpu.models import ModalTuneModel
    from modaltune_tpu.models.longnet import default_spans
    from modaltune_tpu.train.state import (TrainState, make_optimizer,
                                           split_params, count_params)
    from modaltune_tpu.train.train_step import make_train_step
    import jax.numpy as jnp

    from models.aggregators.aggregators import Aggregator

    rng = np.random.RandomState(11)
    n_genes = 60
    gene_names = [f"g{i}" for i in range(n_genes)]
    groups = {i: [f"g{j}" for j in
                  rng.choice(n_genes, rng.randint(3, 8), replace=False)]
              for i in range(12)}

    torch.manual_seed(3)
    ref = Aggregator.create(
        "longnetvit_gene_adapter",
        num_heads=12, gene_group_defination=groups,
        geneclass_name="gene_mixer_group", output_dim=256,
        init_values=0.0, interaction_indexes=[[0, 1], [2, 2]],
        with_cffn=True, cffn_ratio=0.25, add_prompt_feature=True,
        use_extra_extractor=True, freeze_vit=True, use_prompt_sa=True,
        prompt_dropout=0.0, prompt_agg="avg", token_agg="sum",
        pretrained=False, multi_task=3,
        in_chans=IN_CHANS, embed_dim=EMBED, depth=DEPTH,
        slide_ngrids=GRID, global_pool=False, dropout=0.0,
        drop_path_rate=0.0, mlp_ratio=4)
    ref.train()

    x, coords = bag
    gene_vec = rng.randn(n_genes).astype(np.float32)
    ref_genes = {i: torch.from_numpy(
        gene_vec[[int(g[1:]) for g in groups[i]]])[None] for i in
        range(12)}
    # pre-projected, L2-normalized text targets (the projector output;
    # row [0,1,3] selection as in train_modaltune.py:233)
    text4 = rng.randn(4, 256).astype(np.float32)
    text4 /= np.linalg.norm(text4, axis=-1, keepdims=True)
    text3 = text4[[0, 1, 3]]

    # snapshot initial weights before AdamW mutates them in place
    sd0 = {k: v.detach().clone().numpy()
           for k, v in ref.state_dict().items()}

    LR, WD, T, N_STEPS = 1e-4, 0.01, 1.0, 3
    opt = torch.optim.AdamW(
        [{"params": [p for p in ref.parameters() if p.requires_grad],
          "lr": LR / 20.0}],
        weight_decay=WD, betas=(0.9, 0.999))
    loss_fn = torch.nn.KLDivLoss(reduction="sum")
    t_text = torch.from_numpy(text3)
    ref_losses = []
    for _ in range(N_STEPS):
        logits = torch.cat([
            ref(torch.from_numpy(x), torch.from_numpy(coords),
                ref_genes, task_token=torch.eye(3)[t])
            for t in range(3)], dim=0)
        logits = logits / logits.norm(dim=-1, keepdim=True)
        loss = loss_fn(
            torch.nn.functional.log_softmax(logits / T, dim=1),
            torch.nn.functional.softmax(t_text / T, dim=1),
        ) * (T ** 2) * 10
        loss.backward()
        opt.step()
        opt.zero_grad()
        ref_losses.append(float(loss.detach()))

    # --- rebuild: same weights, one batched jitted step ---
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
    params = jax.tree.map(jnp.asarray, tree)
    frozen, trainable = split_params(params)
    n_ref_trainable = sum(p.numel() for p in ref.parameters()
                          if p.requires_grad)
    # the stacked gene einsum pads every group's first-layer weight to
    # max_group_len; padded entries are inert (zero input -> zero grad,
    # zero init -> AdamW weight decay keeps them at 0) but they count
    n_pad = (packer.n_groups * packer.max_group_len
             - sum(len(g) for g in groups.values())) * 256
    assert count_params(trainable) == n_ref_trainable + n_pad

    tcfg = TrainConfig(lr=LR, weight_decay=WD, num_epochs=20,
                       warmup_epochs=10, warmup_factor=20.0,
                       temperature=T, num_tasks=3)
    tx = make_optimizer(tcfg, steps_per_epoch=N_STEPS + 1)
    state = TrainState.create(params=params, tx=tx)
    step = make_train_step(model, tcfg, donate=False)
    batch = {"bag": jnp.asarray(x), "coords": jnp.asarray(coords),
             "mask": jnp.ones((1, BAG), bool),
             "genes": jnp.asarray(packer.pack(gene_vec)[None]),
             "clinical": None}
    text_j = jnp.asarray(text3)[None]
    jax_losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(N_STEPS):
        state, loss = step(state, batch, text_j, key)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, ref_losses,
                               atol=2e-3, rtol=2e-2)
    assert ref_losses[-1] < ref_losses[0]
    assert jax_losses[-1] < jax_losses[0]


def test_longnet_arch_table_matches_reference(ref_env):
    """Every named entry of the rebuilt arch table matches the
    reference's ``LongNetConfig.py`` dicts field-for-field."""
    import torchscale.model.LongNetConfig as ref_tab
    from modaltune_tpu.configs.configs import (_LONGNET_ARCHS,
                                               longnet_config_by_name)
    for name, (layers, dim, ffn, heads) in _LONGNET_ARCHS.items():
        ref = getattr(ref_tab, name)
        assert ref["encoder_layers"] == layers, name
        assert ref["encoder_embed_dim"] == dim, name
        assert ref["encoder_ffn_embed_dim"] == ffn, name
        assert ref["encoder_attention_heads"] == heads, name
        cfg = longnet_config_by_name(name)
        assert cfg.num_layers == layers and cfg.embed_dim == dim
