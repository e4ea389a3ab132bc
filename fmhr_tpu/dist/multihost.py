"""Multi-host (multi-process) execution for the sharded training steps.

The reference is single-GPU; this is the pod-scale story of the rebuild
(SURVEY.md §2.3/§5). The recipe is the standard JAX one:

1. every process calls `initialize_from_env()` (jax.distributed) first;
2. each process loads ONLY its own views from disk (`local_view_slice`);
3. `host_local_to_global` assembles the global view-sharded arrays from
   the per-host shards;
4. the jitted step from `make_sharded_ham_step` runs unchanged — GSPMD
   inserts the cross-host collectives (gradient psum over DCN/ICI).

On a TPU pod slice, `initialize_from_env()` needs no arguments (the TPU
runtime provides topology); on CPU/GPU clusters set the standard env
vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) or
pass them explicitly. Multi-process CPU (used by the tests) additionally
needs the gloo collectives implementation, selected automatically here.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_from_env(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed; returns True if multi-process.

    No-op (returns False) when single-process: nothing configured and no
    TPU pod environment. Safe to call unconditionally at CLI start.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # TPU pods auto-configure via the runtime; only initialize there.
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False

    # NB: must not touch the backend (jax.devices etc.) before
    # jax.distributed.initialize — inspect the configured platform only.
    platform = (getattr(jax.config, "jax_platforms", None)
                or os.environ.get("JAX_PLATFORMS", ""))
    if str(platform).startswith("cpu"):
        # CPU collectives need an explicit cross-process implementation.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax: flag absent -> rely on defaults
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def global_render_mesh(n_row_shards: int = 1) -> Mesh:
    """("views", "rows") mesh over ALL processes' devices.

    jax.devices() is global after jax.distributed.initialize; device
    order groups each process's devices together, so the views axis maps
    contiguously onto processes and each host feeds its own view range.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % n_row_shards == 0, (n, n_row_shards)
    return Mesh(devices.reshape(n // n_row_shards, n_row_shards),
                axis_names=("views", "rows"))


def local_view_slice(n_views: int) -> slice:
    """The half-open view range THIS process should load from disk.

    Views are distributed contiguously and evenly over processes (view
    sharding over the global mesh places view i on device i * D / N, and
    the mesh orders devices by process).
    """
    pc, pid = jax.process_count(), jax.process_index()
    assert n_views % pc == 0, (
        f"n_views={n_views} must divide evenly over {pc} processes")
    per = n_views // pc
    return slice(pid * per, (pid + 1) * per)


def host_local_to_global(mesh: Mesh, local_arr, sharding_or_spec):
    """Assemble a global view-sharded array from per-host view shards.

    local_arr: this process's view slice ([n_views/process_count, ...]).
    Every process must call this with its own shard (collective-free:
    builds the global array from single-device shards).
    """
    import jax.numpy as jnp

    if isinstance(sharding_or_spec, NamedSharding):
        sharding = sharding_or_spec
    else:
        sharding = NamedSharding(mesh, sharding_or_spec)
    local_arr = jnp.asarray(local_arr)
    pc = jax.process_count()
    if pc == 1:
        return jax.device_put(local_arr, sharding)
    global_shape = (local_arr.shape[0] * pc,) + local_arr.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_arr), global_shape)


def shard_batch_multihost(mesh: Mesh, batch: dict, shardings: dict) -> dict:
    """Per-host batch dict -> global sharded batch dict.

    batch values hold only this host's views; shardings comes from
    `make_sharded_ham_step`.
    """
    return {k: host_local_to_global(mesh, v, shardings[k])
            for k, v in batch.items()}
