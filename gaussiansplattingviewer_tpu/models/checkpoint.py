"""Scene checkpoint / resume.

The reference's only persistent state is the read-only INRIA PLY plus a
commented-out np.savez dump (main.py:1010-1020; SURVEY.md §5).  This module
gives the framework first-class checkpointing:

  * npz: single-file scene snapshot (atomic-rename write, fast);
  * orbax: async-capable checkpointing of (scene, opt_state, step) for
    training runs, using the standard JAX ecosystem machinery;
  * PLY remains the interchange format (models/ply.py) readable by the
    reference and the INRIA tools.
"""

from __future__ import annotations

import os

import numpy as np

from gaussiansplattingviewer_tpu.models.gaussians import GaussianData


def save_npz(scene: GaussianData, path: str | os.PathLike) -> None:
    """Atomic single-file snapshot."""
    scene = scene.to_host()
    tmp = str(path) + ".tmp"
    np.savez_compressed(
        tmp,
        xyz=scene.xyz,
        rot=scene.rot,
        scale=scene.scale,
        opacity=scene.opacity,
        sh=scene.sh,
    )
    # np.savez appends .npz to the name it's given
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_npz(path: str | os.PathLike) -> GaussianData:
    with np.load(path) as z:
        return GaussianData(
            xyz=z["xyz"], rot=z["rot"], scale=z["scale"],
            opacity=z["opacity"], sh=z["sh"],
        )


def save_train_state(ckpt_dir: str, step: int, scene: GaussianData,
                     opt_state=None) -> None:
    """Orbax checkpoint of the full train state (falls back to npz when
    orbax is unavailable)."""
    try:
        import orbax.checkpoint as ocp
    except Exception:
        os.makedirs(ckpt_dir, exist_ok=True)
        save_npz(scene, os.path.join(ckpt_dir, f"scene_{step}.npz"))
        return
    import jax

    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    ckptr = ocp.StandardCheckpointer()
    state = {"scene": jax.tree.map(np.asarray, scene)}
    if opt_state is not None:
        state["opt_state"] = jax.tree.map(np.asarray, opt_state)
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_train_state(ckpt_dir: str, step: int, like_scene: GaussianData,
                     like_opt_state=None):
    """Restore (scene, opt_state) saved by save_train_state."""
    try:
        import orbax.checkpoint as ocp
    except Exception:
        scene = load_npz(os.path.join(ckpt_dir, f"scene_{step}.npz"))
        return scene, like_opt_state
    import jax

    path = os.path.abspath(os.path.join(ckpt_dir, str(step)))
    ckptr = ocp.StandardCheckpointer()
    template = {"scene": jax.tree.map(np.asarray, like_scene)}
    if like_opt_state is not None:
        template["opt_state"] = jax.tree.map(np.asarray, like_opt_state)
    state = ckptr.restore(path, template)
    scene = state["scene"]
    if not isinstance(scene, GaussianData):
        scene = GaussianData(**scene) if isinstance(scene, dict) else scene
    return scene, state.get("opt_state", like_opt_state)


def latest_step(ckpt_dir: str) -> int | None:
    """Highest checkpoint step in a directory (resume helper)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        base = name.split(".")[0].replace("scene_", "")
        if base.isdigit():
            steps.append(int(base))
    return max(steps) if steps else None
