"""Tracing / profiling utilities.

The reference's only observability is an imgui fps readout (main.py:949) and
stray prints (SURVEY.md §5).  Here:
  * ``trace(dir)``: context manager around jax.profiler for full XLA/TPU
    traces viewable in TensorBoard/Perfetto;
  * ``FrameTimer``: throughput counters (ms/frame, Mpix/s, splats/s) with a
    hard host-readback sync — ``jax.block_until_ready`` can return early on
    tunneled/remote TPU backends, which silently corrupts naive timings;
  * ``render_stats``: per-frame counter summary from the renderer's aux
    outputs (duplicates, overflow, truncation, mean transmittance).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def hard_sync(out) -> None:
    """Block until ``out`` is really computed (host readback of one leaf;
    immune to async dispatch queues that ignore block_until_ready)."""
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


class FrameTimer:
    """Measure steady-state frame time of a callable producing device values.

    Example:
        timer = FrameTimer(lambda: render(scene, ...), pixels=w*h)
        stats = timer.run(iters=20)   # {"ms_per_frame": ..., "mpix_s": ...}
    """

    def __init__(self, fn, pixels: int | None = None, splats: int | None = None):
        self.fn = fn
        self.pixels = pixels
        self.splats = splats

    def run(self, iters: int = 10, warmup: int = 2) -> dict:
        out = None
        for _ in range(max(warmup, 1)):
            out = self.fn()
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self.fn()
        hard_sync(out)
        dt = (time.perf_counter() - t0) / iters
        stats = {"ms_per_frame": dt * 1000.0, "fps": 1.0 / dt}
        if self.pixels:
            stats["mpix_s"] = self.pixels / dt / 1e6
        if self.splats:
            stats["msplats_s"] = self.splats / dt / 1e6
        return stats


def render_stats(aux: dict) -> dict:
    """Summarize the aux dict from render_with_aux into host scalars."""
    out = {}
    if "transmittance" in aux:
        out["mean_transmittance"] = float(np.asarray(aux["transmittance"]).mean())
    for k in ("num_duplicates", "overflow", "truncated"):
        if k in aux:
            out[k] = int(aux[k])
    return out
