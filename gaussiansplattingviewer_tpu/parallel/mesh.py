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


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over ``tiles`` (image tile rows)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (TILE_AXIS,))


def replicate_scene(scene, mesh: Mesh):
    """Place every scene leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), scene)
