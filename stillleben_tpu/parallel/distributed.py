"""Multi-host orchestration: `jax.distributed` init + ICI x DCN mesh building.

The reference has no distributed layer at all (its only scale-out facility is
the in-process JobQueue thread pool, reference src/job_queue.cpp:30-144;
SURVEY.md §2.9/§5 require the TPU-native replacement to add one). Here:

- :func:`initialize` wraps ``jax.distributed.initialize`` for multi-process
  (multi-host) runs — one python process per host, each driving its local
  TPU chips; afterwards ``jax.devices()`` is global across the slice.
- :func:`make_hybrid_mesh` builds a 2-D ``(dcn, ici)`` device mesh where the
  outer axis crosses hosts/slices (data-center network) and the inner axis
  stays within a slice (inter-chip interconnect). Shard the embarrassingly
  parallel scene axis over BOTH axes for datagen; keep any communicating
  axis (e.g. a future model axis) on ``ici`` so collectives ride the fast
  interconnect.
- :func:`shard_keys` places a per-scene PRNG key batch over the mesh so each
  chip generates only its local scenes (outputs inherit the sharding, so
  rendered batches stay distributed; no gather unless the host asks).

Single-process multi-device (one host, N chips — or the CPU-mesh test
environment) works without calling :func:`initialize`.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["initialize", "make_hybrid_mesh", "shard_keys", "local_batch_slice"]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialize multi-process JAX (one call per host, before first use of
    ``jax.devices()``). Arguments default from the standard environment
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` or
    the cluster autodetection jax.distributed already does on TPU pods).

    Returns True if distributed mode was initialized, False for the
    single-process fallback (no coordinator configured)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # Pod autodetect: only when MORE THAN ONE worker hostname is listed.
    # Single-entry values (e.g. "localhost", which TPU runtime shims set
    # even on one-host attachments) are single-process — initializing
    # jax.distributed there fails or hangs waiting for peers.
    workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w
    ]
    if coordinator_address is None and len(workers) <= 1:
        return False  # single host, nothing to coordinate
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        # too late to coordinate (a backend is live); treat as the
        # single-process fallback rather than raising mid-pipeline
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def make_hybrid_mesh(
    dcn_axis: str = "hosts", ici_axis: str = "scenes", devices=None
) -> jax.sharding.Mesh:
    """2-D ``(dcn, ici)`` mesh: outer axis spans processes (DCN), inner axis
    spans each process's local chips (ICI). With one process this degenerates
    to ``(1, n_devices)`` — same program, no special-casing.

    Uses ``mesh_utils.create_hybrid_device_mesh`` when running multi-process
    (it orders devices so the inner axis is ICI-contiguous); otherwise a
    plain reshape of the local device list."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n_proc = getattr(jax, "process_count", lambda: 1)()
    if n_proc > 1:
        from jax.experimental import mesh_utils

        per_proc = len(devices) // n_proc
        dmesh = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_proc),
            dcn_mesh_shape=(n_proc, 1),
            devices=devices,
        )
        return jax.sharding.Mesh(dmesh, (dcn_axis, ici_axis))
    dmesh = np.array(devices).reshape(1, len(devices))
    return jax.sharding.Mesh(dmesh, (dcn_axis, ici_axis))


def shard_keys(keys: jax.Array, mesh: jax.sharding.Mesh) -> jax.Array:
    """Place a (B, ...) PRNG key batch over ALL mesh axes (scene axis is
    embarrassingly parallel — sharding it across DCN *and* ICI is free)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(mesh.axis_names)  # B split over the flattened device grid
    return jax.device_put(keys, NamedSharding(mesh, spec))


def local_batch_slice(batch_size: int, mesh: jax.sharding.Mesh) -> slice:
    """The [start, stop) rows of the global scene batch this process owns
    (for host-side feeding/saving without a cross-host gather)."""
    n = mesh.devices.size
    per_dev = -(-batch_size // n)
    locals_ = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    if not locals_:
        return slice(0, 0)
    ids = sorted(np.where(np.isin(mesh.devices.flat, locals_))[0])
    return slice(int(ids[0]) * per_dev, (int(ids[-1]) + 1) * per_dev)
