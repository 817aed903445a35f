"""Multi-host distributed initialization — the DCN story.

SURVEY.md §2.2 names `jax.distributed` as the multi-host transport:
each host runs one process, `initialize()` wires them into a single
JAX runtime, and `global_mesh()` lays out a (data, lane) mesh whose
data axis spans all hosts' devices. The compression collectives
(ordered all-gather in parallel/sharded.py, psum progress reduction in
parallel/progress.py) then ride ICI within a host and DCN across
hosts with no further code changes — shard_map compiles the same
program; XLA routes the collectives.

Single-process (CI, one chip, the virtual CPU mesh) is the default:
everything works without calling initialize().

Role analog: the reference scales across machines only by running
independent 7z processes; MtCoder/MtDec stop at one machine
(C/MtCoder.c). The mesh model subsumes that: block spans shard over
the global device list exactly as they shard over local devices.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join the multi-host runtime. Arguments default from the standard
    environment (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID,
    or the TPU metadata on Cloud TPU pods). Returns True when running
    multi-process, False when single-process (no-op)."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    process_id = process_id if process_id is not None else \
        (int(os.environ["JAX_PROCESS_ID"])
         if "JAX_PROCESS_ID" in os.environ else None)
    if coordinator is None and num_processes is None:
        # single-process mode (or TPU-pod auto-detect via libtpu)
        try:
            if os.environ.get("TPU_WORKER_HOSTNAMES"):
                jax.distributed.initialize()
                _initialized = True
                return jax.process_count() > 1
        except Exception:
            pass
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def global_mesh(lanes: int = 1):
    """Mesh over ALL processes' devices (jax.devices() is global after
    initialize()); identical to parallel.mesh.make_mesh single-host."""
    from .mesh import make_mesh
    return make_mesh(len(jax.devices()), lanes=lanes)


def process_info() -> dict:
    return {"process_id": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}
