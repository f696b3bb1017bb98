"""Multi-host (multi-process) data parallelism.

TPU-native replacement for the reference's multi-node DDP bootstrap and
rank-0 aggregation (``utils/base_trainer.py:160-203`` env/SLURM process
group init; ``379-421`` ``dist.gather_object`` eval gather; the
``Join`` uneven-input context at ``train_modaltune.py:215``):

* :func:`init_distributed` — ``jax.distributed.initialize`` with the
  same environment bootstrap order the reference uses: explicit
  arguments, then torchrun-style ``RANK``/``WORLD_SIZE``/
  ``MASTER_ADDR``, then SLURM variables, else single-process no-op.
* :func:`process_datalist` — deterministic per-process slice of a case
  list (the ``DistributedSampler`` equivalent; case-modulo so every
  process sees a disjoint, near-equal shard).
* :func:`allgather_embeddings` — eval-embedding gather across
  processes with uneven per-process counts (pad-to-max + count vector,
  the ``Join``/gather_object equivalent) via
  ``jax.experimental.multihost_utils``; a no-op passthrough in
  single-process runs.
* :func:`global_batch_to_devices` — place a per-process batch shard on
  the process's addressable slice of a global-mesh sharding
  (``jax.make_array_from_process_local_data``).

On a TPU pod each process drives its local chips and the ``data`` mesh
axis spans all processes; gradients ride ICI via the same
``pmean``/GSPMD machinery as single-host (mesh.py) — nothing in the
train step changes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime; returns
    ``(process_id, num_processes)``.

    Bootstrap order mirrors ``base_trainer.init_distributed``
    (``base_trainer.py:160-203``): explicit args > torchrun-style env
    (``RANK``/``WORLD_SIZE``/``MASTER_ADDR``/``MASTER_PORT``) > SLURM
    (``SLURM_PROCID``/``SLURM_NTASKS``/``SLURM_STEP_NODELIST``) >
    single-process (no distributed init at all).
    """
    env = os.environ
    if num_processes is None:
        if "WORLD_SIZE" in env:
            num_processes = int(env["WORLD_SIZE"])
            process_id = int(env.get("RANK", 0))
            coordinator_address = coordinator_address or (
                f"{env.get('MASTER_ADDR', '127.0.0.1')}:"
                f"{env.get('MASTER_PORT', '12355')}")
        elif "SLURM_NTASKS" in env and int(env["SLURM_NTASKS"]) > 1:
            num_processes = int(env["SLURM_NTASKS"])
            process_id = int(env["SLURM_PROCID"])
            node = env["SLURM_STEP_NODELIST"].split(",")[0].split("[")[0]
            coordinator_address = coordinator_address or f"{node}:12355"
    if not num_processes or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return jax.process_index(), jax.process_count()


def process_datalist(items: Sequence, process_id: Optional[int] = None,
                     num_processes: Optional[int] = None) -> List:
    """Deterministic per-process shard of a case/slide list (the
    ``DistributedSampler`` equivalent): item ``i`` belongs to process
    ``i % num_processes``. Disjoint, stable across epochs, and uneven
    by at most one item — :func:`allgather_embeddings` absorbs the
    unevenness at eval."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [it for i, it in enumerate(items) if i % n == pid]


def allgather_embeddings(x: np.ndarray,
                         case_ids: Optional[Sequence[str]] = None):
    """Gather per-process eval embeddings to every process.

    x: ``(n_local, ...)`` with ``n_local`` varying per process (uneven
    inputs — the reference handles this with DDP ``Join`` + rank-0
    ``gather_object``, ``base_trainer.py:379-421``). Returns the
    concatenated ``(n_total, ...)`` array (all processes get it, which
    strictly exceeds the reference's rank-0-only gather) and, when
    ``case_ids`` is given, the matching flat id list.
    """
    if jax.process_count() == 1:
        return (np.asarray(x), list(case_ids)) if case_ids is not None \
            else np.asarray(x)
    from jax.experimental import multihost_utils as mhu
    x = np.asarray(x)
    counts = mhu.process_allgather(
        jnp.asarray([x.shape[0]], jnp.int32))  # (P, 1)
    counts = np.asarray(counts).reshape(-1)
    n_max = int(counts.max())
    pad = np.zeros((n_max - x.shape[0],) + x.shape[1:], x.dtype)
    padded = np.concatenate([x, pad], axis=0) if pad.shape[0] else x
    gathered = np.asarray(mhu.process_allgather(jnp.asarray(padded)))
    parts = [gathered[p, :counts[p]] for p in range(len(counts))]
    out = np.concatenate(parts, axis=0)
    if case_ids is None:
        return out
    # ids travel as fixed-width uint8 rows
    ids = [str(c) for c in case_ids]
    width_local = max([len(c) for c in ids], default=0)
    width = int(np.asarray(mhu.process_allgather(
        jnp.asarray([width_local], jnp.int32))).max())
    enc = np.zeros((n_max, width), np.uint8)
    for i, c in enumerate(ids):
        b = c.encode()[:width]
        enc[i, :len(b)] = np.frombuffer(b, np.uint8)
    genc = np.asarray(mhu.process_allgather(jnp.asarray(enc)))
    all_ids = []
    for p in range(len(counts)):
        for i in range(counts[p]):
            row = bytes(genc[p, i][genc[p, i] != 0])
            all_ids.append(row.decode())
    return out, all_ids


def global_mesh(n_seq: int = 1) -> Mesh:
    """Data(xSeq) mesh over every device of every process."""
    devs = np.asarray(jax.devices())
    n_data = len(devs) // n_seq
    return Mesh(devs[:n_data * n_seq].reshape(n_data, n_seq),
                ("data", "seq"))


def global_batch_to_devices(batch: Dict[str, np.ndarray], mesh: Mesh
                            ) -> Dict[str, jax.Array]:
    """Per-process local batch shard -> global data-sharded arrays.

    Each process passes its own ``(local_B, ...)`` arrays; the result is
    a global array of batch size ``local_B * num_processes`` sharded
    over the ``data`` axis (``jax.make_array_from_process_local_data``).
    """
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        v = np.asarray(v)
        spec = P("data", *([None] * (v.ndim - 1)))
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v)
    return out
