"""Multi-host initialization and DCN-aware mesh construction.

Single-host multi-chip needs nothing beyond `mesh.make_mesh`.  For pods /
multi-host jobs, `initialize()` wires `jax.distributed` from standard
launcher environment variables, and `make_hybrid_mesh` lays the mesh out so
the `data` axis crosses hosts (DCN) while the `model` axis stays inside a
host's ICI domain — collectives that need bandwidth (grid/pair reductions)
ride ICI, only embarrassingly-parallel batch sharding crosses DCN.

Untestable on this single-host rig; the virtual-device tests cover the mesh
math, and the `jax.distributed` call is the standard one-liner.
"""

from __future__ import annotations

import os
from typing import Optional


import jax

from . import mesh as mesh_lib


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; no-ops when
    single-process and nothing is configured)."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(
            num_processes if num_processes is not None
            else os.environ.get("NUM_PROCESSES", 1)),
        process_id=int(
            process_id if process_id is not None
            else os.environ.get("PROCESS_ID", 0)),
    )


def make_hybrid_mesh(model_parallel: int = 1):
    """Mesh with `model` inside each host's ICI domain and `data` spanning
    hosts: devices are ordered host-major by jax.devices(), so reshaping to
    (n_devices // model_parallel, model_parallel) keeps each model group on
    one host as long as model_parallel divides the per-host device count."""
    devices = jax.devices()
    per_host = max(1, len(devices) // max(1, jax.process_count()))
    if model_parallel > per_host or per_host % model_parallel != 0:
        raise ValueError(
            f"model_parallel={model_parallel} must divide per-host device "
            f"count {per_host} so model collectives stay on ICI")
    return mesh_lib.make_mesh(
        (len(devices) // model_parallel, model_parallel), devices=devices)
