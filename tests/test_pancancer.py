"""Pan-cancer tests: stratified CoxPH, site-wise readout, and the
PanCancerTrainer lifecycle on multi-site synthetic data."""

import numpy as np
import pytest

from modaltune_tpu.eval.pancancer import perform_testing_pancancer
from modaltune_tpu.eval.readout import CoxPH
from modaltune_tpu.utils.constants import PROJECT_ID_MAP, SITE_LABEL


def test_coxph_strata_resets_risk_sets():
    rng = np.random.RandomState(0)
    n = 200
    x = rng.randn(n, 3)
    strata = np.repeat([0, 1], n // 2)
    # different baseline hazards per stratum, same beta
    beta = np.array([1.0, 0.0, -0.5])
    scale = np.where(strata == 0, 1.0, 25.0)
    t = -np.log(rng.rand(n)) / np.exp(x @ beta) * scale
    e = np.ones(n, int)
    cph_s = CoxPH(penalizer=0.01).fit(x, t, e, strata=strata)
    assert cph_s.beta[0] > 0.3 and cph_s.beta[2] < -0.1
    # unstratified fit is confounded by the baseline shift; stratified
    # beta should be closer to truth
    cph_u = CoxPH(penalizer=0.01).fit(x, t, e)
    assert abs(cph_s.beta[0] - cph_u.beta[0]) < 1.5  # sanity


def _multisite_data(n=120, tasks=3, dim=12, seed=0):
    rng = np.random.RandomState(seed)
    projects = ["TCGA-BRCA", "TCGA-GBM", "TCGA-LUAD", "TCGA-KIRC"]
    meta, xs = [], []
    for i in range(n):
        proj = projects[i % 4]
        y = rng.randint(0, 2)
        # label and site signals on disjoint dims; site one-hot encoded
        # so one-vs-rest linear classifiers can isolate each site
        x = rng.randn(tasks, dim)
        x[:, :4] += y * 2.0
        x[:, 4 + SITE_LABEL[proj]] += 3.0
        xs.append(x)
        meta.append(dict(case_id=f"c{i}", primary_class=y,
                         durations=float(np.exp(-x[0, 0] / 4) * 20 + 1),
                         vital_status=int(rng.rand() < 0.8),
                         project_id=proj))
    return np.stack(xs), meta


def test_perform_testing_pancancer():
    x_tr, m_tr = _multisite_data(seed=0)
    x_te, m_te = _multisite_data(seed=1)
    res = perform_testing_pancancer(x_tr, m_tr, x_te, m_te)
    assert "TCGA-BRCA" in res and "TCGA-GBMLGG" in res
    assert "site_classification" in res
    gen = res["TCGA-BRCA"]["General"]
    assert "c_index" in gen and "pooled_c_index" in gen
    # sites are linearly separable by construction
    assert res["site_classification"]["General"]["acc"] > 0.8


@pytest.mark.slow
def test_pancancer_trainer_lifecycle(tmp_path):
    import jax
    import jax.numpy as jnp
    from modaltune_tpu.configs import TrainConfig, tiny_test_config
    from modaltune_tpu.data import SyntheticSlideDataset
    from modaltune_tpu.models import ModalTuneModel
    from modaltune_tpu.train.pancancer_trainer import PanCancerTrainer

    cfg = tiny_test_config()
    packer = SyntheticSlideDataset(n_cases=1).packer
    projects = ["TCGA-BRCA", "TCGA-GBM", "TCGA-LUAD", "TCGA-KIRC"]

    def make_ds(seed):
        ds = SyntheticSlideDataset(n_cases=12,
                                   in_chans=cfg.backbone.in_chans,
                                   bag_range=(40, 80), packer=packer,
                                   seed=seed, n_sites=4)
        # attach real project ids so SITE_LABEL applies
        meta = ds.metadata()

        class _DS:
            def __init__(self, inner):
                self.inner = inner
                self.packer = inner.packer
                self.case_ids = inner.case_ids

            def __len__(self):
                return len(self.inner)

            def metadata(self):
                rows = []
                for i, m in enumerate(self.inner.metadata()):
                    m = dict(m)
                    m["project_id"] = projects[i % 4]
                    rows.append(m)
                return rows

            def get(self, i, rng):
                return self.inner.get(i, rng)

        return _DS(ds)

    datasets = {k: make_ds(i) for i, k in
                enumerate(("train", "val", "test"))}
    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len)
    tcfg = TrainConfig(lr=1e-3, num_epochs=1, warmup_epochs=1, seed=0)
    trainer = PanCancerTrainer(model, tcfg, datasets, str(tmp_path),
                               buckets=(96,))
    ds0 = datasets["train"]
    ex = ds0.get(0, np.random.RandomState(0))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ex.bag[None]),
                        jnp.asarray(ex.coords[None]),
                        jnp.asarray(ex.genes[None]),
                        task_token=jnp.eye(3)[:1])["params"]
    trainer.run(params)
    results = trainer.deploy()
    assert "site_classification" in results


@pytest.mark.slow
def test_pancancer_evaluate_under_dp_matches_no_mesh(tmp_path):
    """PanCancerTrainer.evaluate under a data mesh (``--dp``) must match
    the no-mesh metrics: padded wrap rows excluded from the loss and the
    per-site metric pools, batch sharded per device. Regression for the
    pad-rows double-count in per-site metrics."""
    import jax
    import jax.numpy as jnp
    from modaltune_tpu.configs import TrainConfig, tiny_test_config
    from modaltune_tpu.data import SyntheticSlideDataset
    from modaltune_tpu.models import ModalTuneModel
    from modaltune_tpu.parallel.mesh import make_mesh
    from modaltune_tpu.train.pancancer_trainer import PanCancerTrainer

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")

    cfg = tiny_test_config()
    packer = SyntheticSlideDataset(n_cases=1).packer
    projects = ["TCGA-BRCA", "TCGA-GBM", "TCGA-LUAD", "TCGA-KIRC"]

    def make_ds(seed, n_cases):
        ds = SyntheticSlideDataset(n_cases=n_cases,
                                   in_chans=cfg.backbone.in_chans,
                                   bag_range=(40, 80), packer=packer,
                                   seed=seed, n_sites=4)

        class _DS:
            def __init__(self, inner):
                self.inner = inner
                self.packer = inner.packer
                self.case_ids = inner.case_ids

            def __len__(self):
                return len(self.inner)

            def metadata(self):
                rows = []
                for i, m in enumerate(self.inner.metadata()):
                    m = dict(m)
                    m["project_id"] = projects[i % 4]
                    rows.append(m)
                return rows

            def get(self, i, rng):
                return self.inner.get(i, rng)

        return _DS(ds)

    model = ModalTuneModel(cfg, n_gene_groups=packer.n_groups,
                           max_group_len=packer.max_group_len)
    ex = make_ds(0, 1).get(0, np.random.RandomState(0))
    import jax.random as jr
    params = model.init(jr.PRNGKey(0), jnp.asarray(ex.bag[None]),
                        jnp.asarray(ex.coords[None]),
                        jnp.asarray(ex.genes[None]),
                        task_token=jnp.eye(3)[:1])["params"]
    tcfg = TrainConfig(lr=1e-2, num_epochs=2, warmup_epochs=1, seed=0)

    def build(mesh, out):
        # 14 train cases at batch 4: the mesh loader pads the last batch
        # with 2 wrap rows — the regression's trigger
        datasets = {"train": make_ds(1, 14), "val": make_ds(2, 10),
                    "test": make_ds(3, 10)}
        tr = PanCancerTrainer(model, tcfg, datasets, str(out),
                              buckets=(96,), batch_size=4, mesh=mesh)
        tr.init_state(params)
        return tr

    t_plain = build(None, tmp_path / "plain")
    t_mesh = build(make_mesh(n_data=4, n_seq=1), tmp_path / "mesh")
    # brief training on the PLAIN trainer only, then copy weights so
    # both evaluate identical non-degenerate params
    t_plain.train_one_epoch()
    t_mesh.state = t_mesh.state.replace(
        trainable=t_plain.state.trainable, frozen=t_plain.state.frozen)

    t_plain.fit_readout_heads()
    t_mesh.fit_readout_heads()
    m_plain = t_plain.evaluate("val")
    m_mesh = t_mesh.evaluate("val")
    assert set(m_plain) == set(m_mesh)
    for k in m_plain:
        np.testing.assert_allclose(m_mesh[k], m_plain[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
