"""Multi-host (multi-process) execution: jax.distributed bring-up.

The reference is single-core C with no distributed machinery (SURVEY 2.3);
the TPU framework's multi-host story is the standard JAX one: every host
runs the same program, ``initialize()`` wires the processes into one
runtime, and the ('data', 'seg') mesh of parallel/sharded.py then spans
all hosts' devices -- batch images shard over hosts (DCN), subband/segment
lanes over the chips within a host (ICI).  The codec's only collective is
the ordered gather of per-lane payload buffers that XLA inserts for the
sharded step outputs; decode needs no collective at all
(parallel/sharded.decode_batch_sharded).

On a single process (this environment: one tunnel-attached chip) all of
this is a no-op; the code path is exercised by tests/test_parallel.py on a
virtual CPU mesh and by the driver's multichip dryrun.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Initialize jax.distributed for multi-host runs; returns True when a
    multi-process runtime was brought up, False for single-process.

    Arguments default from the standard environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    cloud-TPU metadata that jax.distributed.initialize auto-detects).
    Calling it twice, or in a single-process setting with no coordinator
    configured, is safe.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to initialize

    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return True


def global_mesh(data: int | None = None):
    """('data', 'seg') mesh over every device of every process.

    Call after initialize(); per-host device counts must match (standard
    TPU pod slices do).  The data axis spans hosts first so that batch
    sharding rides DCN and the seg axis stays within a host's ICI domain.
    """
    from .sharded import make_mesh
    return make_mesh(data=data)
