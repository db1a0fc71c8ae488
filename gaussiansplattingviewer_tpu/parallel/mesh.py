"""Device mesh construction for multi-chip / multi-host rendering.

The reference has zero distributed code (SURVEY.md §2.4: single-process,
single-GPU).  The TPU build scales by sharding image TILE ROWS across chips
over a 1-D ``tiles`` mesh axis: Gaussian parameters are replicated, each
chip bins + blends its band of tiles, and parameter gradients are
all-reduced (psum) over ICI by shard_map's reverse-mode transpose — the
standard data-parallel-over-pixels recipe from the scaling playbook.

Multi-host: jax.distributed gives a global device list; the same 1-D mesh
spans hosts, with XLA routing the gradient all-reduce over ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"
HOST_AXIS = "hosts"
CHIP_AXIS = "chips"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
):
    """Wire up multi-host JAX (jax.distributed.initialize).

    Call once per process before any jax computation.  On TPU pods the
    arguments are auto-detected from the environment and may all be None;
    for explicit topologies (including multi-process CPU validation on
    localhost) pass coordinator_address="host:port", num_processes and
    process_id.  After this returns, ``jax.devices()`` is the GLOBAL
    device list (all hosts) and ``jax.local_devices()`` this process's.

    Returns (process_id, num_processes).
    """
    kw = {}
    if coordinator_address is not None:
        kw.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if local_device_ids is not None:
        kw.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kw)
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ``tiles`` (image tile rows)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (TILE_AXIS,))


def make_host_mesh(devices=None, n_hosts: int | None = None) -> Mesh:
    """2-axis (hosts, chips) mesh over the global device list.

    Rows are HOST-MAJOR: device [h, c] is host h's c-th local chip, so the
    ``hosts`` axis maps to DCN and ``chips`` to ICI — collectives over
    ``chips`` stay on-die/ICI, only the cross-host edge of a collective
    over both axes rides DCN.  The render path shards image tile rows over
    the PRODUCT of both axes (see tile_axes): inference needs no
    collective at all, and the training gradient psum becomes a
    hierarchical ICI-reduce + DCN-reduce, the standard 2-level recipe.

    Requires initialize_distributed() first on multi-host; also usable
    single-process to model a (hosts, chips) topology over local devices
    (pass ``n_hosts`` explicitly).
    """
    if devices is None:
        devices = jax.devices()
    if n_hosts is None:
        n_hosts = max(jax.process_count(), 1)
    n = len(devices)
    if n % n_hosts:
        raise ValueError(f"{n} devices not divisible by {n_hosts} hosts")
    # jax.devices() is already process-major; reshape keeps host rows
    arr = np.array(devices).reshape(n_hosts, n // n_hosts)
    return Mesh(arr, (HOST_AXIS, CHIP_AXIS))


def tile_axes(mesh: Mesh):
    """The mesh axis name (or tuple of names) tile rows shard over: every
    axis of the mesh, so a 1-D ``tiles`` mesh and a 2-D (hosts, chips)
    mesh drive the same sharded render code."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def replicate_scene(scene, mesh: Mesh):
    """Place every scene leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: put_global(a, mesh, P()), scene
        )
    return jax.tree.map(lambda a: jax.device_put(a, sharding), scene)


def put_global(x, mesh: Mesh, spec: P):
    """Build a global array on a (possibly multi-process) mesh from a
    host-local numpy value every process holds in full.

    jax.device_put cannot target non-addressable devices; the multi-host
    idiom is make_array_from_callback, which asks each process only for
    the shards it owns.
    """
    import jax.numpy as jnp

    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: x[idx]
    )
