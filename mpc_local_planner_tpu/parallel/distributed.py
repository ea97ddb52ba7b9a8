"""Multi-host (multi-process) bring-up for TPU slices.

Role (SURVEY.md §8 step 6): scale the scenario-ensemble solver across hosts.
Each host runs one process that owns its local TPU chips; `jax.distributed`
wires the processes into one logical runtime, after which every jitted
function sees the *global* device set and the ('dcn', 'ici') mesh spans
hosts — DCN = across processes, ICI = chips within a process. The reference
has no counterpart (single-robot ROS node); this is the TPU-native analog of
an MPI launcher, done the JAX way: collectives are inserted by XLA from
shardings, not hand-written.

Usage (one call per process, before any other JAX API touches devices):

    from mpc_local_planner_tpu.parallel import distributed
    distributed.initialize(coordinator="host0:8476", num_processes=4,
                           process_id=RANK)
    mesh = distributed.global_mesh()           # ('dcn', 'ici') across hosts
    solver = make_sharded_solver(spec, settings, mesh)

Tested with a 2-process CPU run (tests/test_distributed.py) — the same code
path a real multi-host TPU pod uses, minus the hardware.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join this process to the distributed JAX runtime.

    Arguments default to the standard cluster env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``)
    so launchers can configure purely through the environment; on cloud TPU
    VMs all three may be None and jax auto-detects the slice topology.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        v = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if process_id is None:
        v = os.environ.get("JAX_PROCESS_ID")
        process_id = int(v) if v else None
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(ici_axis_size: Optional[int] = None):
    """Build the global ('dcn', 'ici') mesh over all processes' devices.

    By default ICI spans each process's local chips (``jax.local_device_count``)
    and DCN spans processes — the physical layout of a multi-host TPU pod
    slice, so the batch all-reduce tree sums within a slice over ICI before
    crossing DCN. Requires :func:`initialize` first (or single-process use,
    where it degenerates to a 1×L mesh).
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if ici_axis_size is None:
        ici_axis_size = jax.local_device_count()
    n = len(devices)
    if n % ici_axis_size != 0:
        raise ValueError(f"{n} devices not divisible by ici={ici_axis_size}")
    arr = np.asarray(devices).reshape(n // ici_axis_size, ici_axis_size)
    return Mesh(arr, axis_names=("dcn", "ici"))


def process_local_batch(global_batch: int) -> slice:
    """This process's contiguous slice of a globally sharded scenario batch.

    With batch sharded over ('dcn', 'ici') row-major and DCN = processes,
    each process feeds the contiguous chunk
    ``[pid * B/P, (pid+1) * B/P)`` via
    ``jax.make_array_from_process_local_data``.
    """
    import jax

    p = jax.process_count()
    if global_batch % p != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {p} processes")
    per = global_batch // p
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)
