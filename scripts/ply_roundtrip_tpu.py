"""Real-PLY evidence artifact (VERDICT r4 item 5): garden-scale scene
through save_ply -> NATIVE load_ply -> autotune -> Pallas render on the
TPU, asserting parity against the in-memory scene.

No pretrained INRIA checkpoint can be fetched in this environment (zero
egress), so the evidence is a round trip of the garden-scale synthetic
(5.8M anisotropic splats — the statistical stand-in bench.py documents)
through the EXACT on-disk format the reference consumes
(point_cloud/iteration_30000/point_cloud.ply, /root/reference/README.md:24,
util_gau.py:63-125): save_ply writes the official field layout with
INVERSE activations (log scale, logit opacity, raw quats, channel-major
f_rest), and load_ply's single-pass C++ loader (native/gsv_native.cpp)
re-applies the reference's activations (util_gau.py:114-121).

Writes PLY_TPU.json.  Exit 0 iff all parity gates pass.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ply_roundtrip_tpu.py
       [--n-splats N] [--width W] [--height H]
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-splats", type=int, default=5_800_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--out", default=os.path.join(_REPO, "PLY_TPU.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussiansplattingviewer_tpu.config import RenderConfig
    from gaussiansplattingviewer_tpu.models import (
        load_ply, random_scene, save_ply,
    )
    from gaussiansplattingviewer_tpu.models.ply import _load_ply_native
    from gaussiansplattingviewer_tpu.ops.autotune import autotune
    from gaussiansplattingviewer_tpu.ops.render import render
    from gaussiansplattingviewer_tpu.utils import transforms as tf
    from gaussiansplattingviewer_tpu.utils.camera import Camera

    result = {"backend": jax.default_backend(), "n_splats": args.n_splats}

    # garden-scale anisotropic scene, identical to bench.py --garden
    scene = random_scene(
        args.n_splats, sh_degree=3, seed=0, extent=6.0, mean_scale=0.012,
        anisotropy=1.0, opacity_mix=True,
    )
    path = "/tmp/ply_roundtrip/point_cloud.ply"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t0 = time.perf_counter()
    save_ply(scene, path)
    result["save_s"] = round(time.perf_counter() - t0, 2)
    result["file_bytes"] = os.path.getsize(path)

    t0 = time.perf_counter()
    assert _load_ply_native(path) is not None, "native loader unavailable"
    loaded, bbox, center = load_ply(path)  # native path active by default
    result["native_load_s"] = round(time.perf_counter() - t0, 2)

    # field-level parity: save writes inverse activations (log/logit), so
    # the round trip is fp-close, not bit-equal
    field_diffs = {}
    ok = True
    for f in ("xyz", "rot", "scale", "opacity", "sh"):
        a = np.asarray(getattr(scene, f))
        b = np.asarray(getattr(loaded, f))
        scale = np.abs(a).max() + 1e-12
        d = float(np.abs(a - b).max() / scale)
        field_diffs[f] = d
        ok &= d < 1e-5
    result["field_rel_max"] = field_diffs

    # autotune + render both on the device; the loaded scene must produce
    # the same frame (same tuner decisions, fp-close pixels)
    cfg = RenderConfig(width=args.width, height=args.height)
    cam = Camera(h=cfg.height, w=cfg.width)
    cam.fovy = 1.0
    eye = np.array([0, 0, 11.0], np.float32)
    view = np.asarray(tf.look_at(eye, np.zeros(3), [0, -1, 0]), np.float32)
    proj = np.asarray(cam.get_project_matrix(), np.float32)

    imgs = {}
    for name, sc in (("mem", scene), ("ply", loaded)):
        t0 = time.perf_counter()
        tuned = autotune(
            sc, [view], [proj], [eye], cfg, probe=True, fused=None
        )
        result[f"autotune_s_{name}"] = round(time.perf_counter() - t0, 1)
        result[f"fused_{name}"] = bool(tuned.fused_grad)
        result[f"prefix_rows_{name}"] = int(tuned.prefix_rows)
        dev = sc.pad_to_multiple(1024).to_device()
        img = render(dev, view, proj, eye, tuned, backend="pallas")
        imgs[name] = np.asarray(img)
        del dev

    d = np.abs(imgs["mem"] - imgs["ply"])
    result["img_max_abs_diff"] = float(d.max())
    result["img_p999_abs_diff"] = float(np.quantile(d, 0.999))
    # Gates: save_ply stores the official INVERSE activations (log scale,
    # logit opacity), so the reloaded fields differ by ~1e-7 relative —
    # enough to flip fragments sitting on the discrete alpha_min /
    # in_rect / tight-cull cutoffs (gau_frag.glsl:21-26).  Each flip is a
    # bounded ~alpha_min-scale pixel event, and the MAX over ~1e8
    # fragments at garden scale is an order statistic (measured 2.6e-3);
    # the smooth-path agreement is what the p999 gate pins.
    ok &= float(d.max()) < 1e-2
    ok &= float(np.quantile(d, 0.999)) < 5e-4
    ok &= bool(np.isfinite(imgs["ply"]).all())
    result["pass"] = bool(ok)

    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result, indent=1))
    print(f"wrote {args.out}  pass={ok}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
