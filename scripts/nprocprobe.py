"""Probe: how many table rows does the blend actually process?

The tile early-stop (transmittance < 1e-4) makes the kernels skip the
tail of saturated tiles' lists, but the binning stage has already SORTED,
GATHERED and (in the backward) FOLDED those rows.  If the processed
fraction is low, the per-duplicate frontier costs (sort/gather/fold)
are partly spent on rows that contribute nothing — sizing the potential
of saturation-aware truncation.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import random_scene
    from gaussiansplattingviewer_tpu.ops import binning
    from gaussiansplattingviewer_tpu.ops.autotune import autotune
    from gaussiansplattingviewer_tpu.ops.pallas.tile_raster_fwd import (
        rasterize_binned_pallas_train,
    )
    from gaussiansplattingviewer_tpu.ops.projection import project
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    for label, n, extent, ms, kw in (
        ("bench-1M", 1_000_000, 4.0, 0.015, {}),
        ("garden-5.8M", 5_800_000, 6.0, 0.012,
         dict(anisotropy=1.0, opacity_mix=True)),
    ):
        cfg = RenderConfig(width=1920, height=1080)
        scene = random_scene(
            n, sh_degree=3, seed=0, extent=extent, mean_scale=ms, **kw
        ).pad_to_multiple(1024).to_device()
        cam = Camera(h=cfg.height, w=cfg.width)
        cam.fovy = 1.0
        eye = np.array([0, 0, 9.0 if n < 2e6 else 11.0])
        view = jnp.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]))
        proj = jnp.asarray(cam.get_project_matrix())
        cam_pos = jnp.asarray(eye.astype(np.float32))
        cfg = autotune(scene, [view], [proj], [cam_pos], cfg, probe=True)

        splats = jax.jit(project, static_argnames=("cfg",))(
            scene, view, proj, cam_pos, cfg
        )
        b = binning.bin_splats(splats, cfg)
        _, _, _, nproc = rasterize_binned_pallas_train(
            b.table, b.tile_starts, b.tile_counts, jnp.int32(0), cfg
        )
        counts = np.asarray(b.tile_counts)
        starts = np.asarray(b.tile_starts)[:-1]
        npr = np.asarray(nproc)
        base = starts // binning.SEGMENT_ALIGN * binning.SEGMENT_ALIGN
        # rows the kernel actually touched (processed chunks, minus the
        # aligned-window overhang before the segment start)
        chunk = binning.KERNEL_CHUNK
        end = starts + counts
        n_chunks = np.where(counts > 0, -(-(end - base) // chunk), 0)
        processed = np.minimum(npr, n_chunks) * chunk
        processed = np.minimum(processed, end - base)
        processed = np.maximum(processed - (starts - base), 0)
        live = counts.sum()
        proc = processed.sum()
        stopped = (npr < n_chunks).sum()
        print(
            f"{label}: live rows {live/1e6:.2f}M, processed "
            f"{proc/1e6:.2f}M ({proc/max(live,1)*100:.0f}%), "
            f"early-stopped tiles {stopped}/{len(counts)} "
            f"({stopped/len(counts)*100:.0f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
