from gaussiansplattingviewer_tpu.parallel.mesh import (
    initialize_distributed,
    make_host_mesh,
    make_mesh,
    put_global,
    replicate_scene,
)
from gaussiansplattingviewer_tpu.parallel.sharded_render import (
    render_sharded,
    make_sharded_render_fn,
    make_sharded_train_step,
    shard_scene_splats,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "make_host_mesh",
    "put_global",
    "replicate_scene",
    "render_sharded",
    "shard_scene_splats",
    "make_sharded_render_fn",
    "make_sharded_train_step",
]
