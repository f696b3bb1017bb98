"""BucketedLoader: bucket-grouped batching semantics.

The reference trains at batch_size=1 (``train_modaltune.py:78``); the
rebuild's loader additionally supports throughput-mode batching, where a
batch must be formed from SAME-bucKET examples only — mixing a 2k bag
into a 25k-bucket batch would waste 12x its FLOPs on padding.
"""

import numpy as np

from modaltune_tpu.data import BucketedLoader, SyntheticSlideDataset
from modaltune_tpu.data.datasets import choose_bucket

BUCKETS = (64, 128, 256)


def _dataset(n=23, seed=0):
    return SyntheticSlideDataset(n_cases=n, in_chans=8,
                                 bag_range=(20, 250), seed=seed)


def test_batches_are_bucket_homogeneous_under_shuffle():
    ds = _dataset()
    loader = BucketedLoader(ds, buckets=BUCKETS, batch_size=4,
                            shuffle=True, seed=3, prefetch=0)
    seen = []
    for batch in loader:
        assert batch.bag.shape[1] in BUCKETS
        # every member's true length maps to the batch's bucket — no row
        # is padded to a larger member's bucket
        lengths = batch.mask.sum(axis=1)
        for l in lengths:
            assert choose_bucket(int(l), BUCKETS) == batch.bag.shape[1]
        seen.extend(batch.case_ids)
    # full epoch coverage, each case exactly once
    assert sorted(seen) == sorted(ds.case_ids)


def test_pad_to_batch_flushes_same_bucket_wraps():
    ds = _dataset(n=11)
    loader = BucketedLoader(ds, buckets=BUCKETS, batch_size=4,
                            shuffle=True, seed=1, prefetch=0,
                            pad_to_batch=True)
    real = []
    for batch in loader:
        assert len(batch.case_ids) == 4  # always divisible shapes
        lengths = batch.mask.sum(axis=1)
        for l in lengths:
            assert choose_bucket(int(l), BUCKETS) == batch.bag.shape[1]
        real.extend(batch.case_ids[:len(batch.case_ids) - batch.pad_rows])
    assert sorted(real) == sorted(ds.case_ids)


def test_batch_size_one_keeps_dataset_order():
    ds = _dataset(n=7)
    loader = BucketedLoader(ds, buckets=BUCKETS, batch_size=1,
                            shuffle=False, prefetch=0)
    ids = [b.case_ids[0] for b in loader]
    assert ids == ds.case_ids
    assert all(len(b.case_ids) == 1 for b in loader)
