"""Two-process CPU worker for the multi-host DP test (spawned by
tests/test_multihost.py). argv: port process_id."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

port, pid = int(sys.argv[1]), int(sys.argv[2])

from modaltune_tpu.parallel.multihost import (allgather_embeddings,
                                              init_distributed,
                                              process_datalist)

rank, world = init_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2, process_id=pid)
assert (rank, world) == (pid, 2), (rank, world)

import numpy as np

# uneven per-process eval outputs (the reference needs DDP Join for this)
n_local = 3 if pid == 0 else 2
x = np.full((n_local, 4), float(pid), np.float32) + \
    np.arange(n_local, dtype=np.float32)[:, None]
ids = [f"case{pid}_{i}" for i in range(n_local)]
out, all_ids = allgather_embeddings(x, ids)
assert out.shape == (5, 4), out.shape
want_ids = ["case0_0", "case0_1", "case0_2", "case1_0", "case1_1"]
assert all_ids == want_ids, all_ids
assert np.allclose(out[0], 0.0) and np.allclose(out[3], 1.0)

items = [f"s{i}" for i in range(7)]
mine = process_datalist(items)
other = process_datalist(items, process_id=1 - pid, num_processes=2)
assert not set(mine) & set(other)
assert len(mine) + len(other) == 7

print(f"WORKER{pid} OK", flush=True)
