from gaussiansplattingviewer_tpu.parallel.mesh import make_mesh, replicate_scene
from gaussiansplattingviewer_tpu.parallel.sharded_render import (
    render_sharded,
    make_sharded_render_fn,
    make_sharded_train_step,
    shard_scene_splats,
)

__all__ = [
    "make_mesh",
    "replicate_scene",
    "render_sharded",
    "shard_scene_splats",
    "make_sharded_render_fn",
    "make_sharded_train_step",
]
