"""Multi-host (multi-process) SPMD bootstrap.

SURVEY.md §2.6/§5.8: on a single host no communication setup is needed —
``jit`` emits ICI collectives straight from shardings (parallel/mesh.py).
Across HOSTS, JAX additionally requires one ``jax.distributed.initialize()``
call per process before first backend use; afterwards ``jax.devices()``
spans every process's chips, the same (data, space) mesh covers the pod
slice, and the jitted programs scale unchanged — DCN carries only what the
shardings demand.

The reference has no distributed story at all (it picks one CUDA device by
parsing ``nvidia-smi``, /root/reference/utils.py:14-25 and
/root/reference/main.py:249-258); this module is the TPU-native equivalent
of that "device setup" step at production scale.

Configuration is via environment (no new config-surface flags):

- ``CWFA_DISTRIBUTED=auto`` — ``jax.distributed.initialize()`` with no
  arguments (TPU pod metadata autodetection).
- ``CWFA_COORDINATOR=host:port`` + ``CWFA_NUM_PROCESSES=N`` +
  ``CWFA_PROCESS_ID=K`` — explicit rendezvous (CPU/GPU fleets, tests).
- Neither set — single-process no-op.

Every CLI calls :func:`initialize_from_env` once at startup; host-side
artifact writes (checkpoints, TensorBoard, TIFF dumps) are then gated on
:func:`is_primary` by the callers so N processes do not race on one file.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = False


def initialize_from_env() -> bool:
    """Initialize multi-process JAX from CWFA_* env vars; no-op otherwise.

    Must run before the first backend touch in the process.  Returns True
    when a multi-process runtime was (already) initialized.  Idempotent per
    process — a second call never re-initializes.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    mode = os.environ.get("CWFA_DISTRIBUTED", "").strip().lower()
    coord = os.environ.get("CWFA_COORDINATOR", "").strip()
    if mode == "auto":
        jax.distributed.initialize()
    elif coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["CWFA_NUM_PROCESSES"]),
            process_id=int(os.environ["CWFA_PROCESS_ID"]))
    else:
        return False
    _INITIALIZED = True
    return True


def is_primary() -> bool:
    """True on the process that owns host-side artifact writes."""
    return jax.process_index() == 0


def host_local_indices(n: int, process_id: int | None = None,
                       process_count: int | None = None) -> list[int]:
    """Partition dataset indices [0, n) across processes, contiguous blocks
    (floor split; the first ``n % P`` processes take one extra).  Each
    process feeds only its block to :func:`global_batch_array`."""
    pid = jax.process_index() if process_id is None else process_id
    pc = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n, pc)
    start = pid * base + min(pid, extra)
    return list(range(start, start + base + (1 if pid < extra else 0)))


def global_batch_array(local: np.ndarray, sharding):
    """Assemble a globally-sharded device array from per-process host-local
    batch shards (``jax.make_array_from_process_local_data``).  On a single
    process this is exactly ``jax.device_put(local, sharding)``."""
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def to_host(x) -> np.ndarray:
    """``np.asarray`` that also works on MULTI-PROCESS global arrays.

    A batch-sharded output of an SPMD program spans processes; plain
    ``np.asarray`` raises on non-fully-addressable arrays.  This gathers
    the full value to every host (``process_allgather``; a collective —
    every process must call it, which holds in the trainer because all
    processes run the same loop).  Single-process (including the virtual
    multi-device mesh) it is exactly ``np.asarray``."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def assemble_global(x, sharding):
    """Place a host-replicated array under ``sharding`` in a way that works
    on one process AND many: every process holds the identical full ``x``
    (the dataset lives on shared storage — the reference's layout,
    /root/reference/main.py:135-233), and each transfers exactly the index
    slices its own devices own.  Single-process this is ``device_put``;
    multi-process it assembles the global array from per-device shards
    (``jax.make_array_from_single_device_arrays``), never transferring
    non-addressable data."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    shards = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(
        x.shape, sharding, shards)
