"""K-fold split helpers: partition coverage, disjointness, subset view."""

import numpy as np

from modaltune_tpu.data import SyntheticSlideDataset, kfold_splits


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
