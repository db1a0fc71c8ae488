"""Interactive web viewer: orbit or free-fly a Gaussian scene from the browser.

The TPU-native answer to the reference's GLFW/imgui window (main.py): a
zero-dependency localhost HTTP server rendering frames on demand.  The
browser page provides the reference UI's controls — drag to orbit, wheel to
zoom, render-mode and scale-modifier selectors (main.py:941-1021) — and each
interaction fetches a freshly rendered PNG.  A "fly" toggle switches to the
reference's first-person mode: drag rotates the view orientation
(util.py:140-150's quaternion mouse path, expressed as yaw/pitch) and
WASD/RF keys translate along front/right/up (main.py:441-485).

Usage:
  python -m gaussiansplattingviewer_tpu.apps.serve --gs-model <dir> --port 8000
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from gaussiansplattingviewer_tpu.config import RenderConfig, RenderMode
from gaussiansplattingviewer_tpu.apps.viewer import MODE_NAMES, load_scene
from gaussiansplattingviewer_tpu.utils import transforms as tf
from gaussiansplattingviewer_tpu.utils.camera import Camera

_PAGE = """<!doctype html>
<html><head><title>gaussiansplattingviewer_tpu</title><style>
body{background:#111;color:#ddd;font-family:monospace;margin:12px}
img{border:1px solid #333;cursor:grab;image-rendering:auto}
select,input{background:#222;color:#ddd;border:1px solid #444;margin:2px}
</style></head><body>
<div>
 mode <select id=mode>%OPTS%</select>
 scale <input id=scale type=range min=0.05 max=2 step=0.05 value=1>
 <label><input id=fly type=checkbox> fly (WASD + R/F, drag to look)</label>
 <span id=stat></span>
</div>
<img id=v width=%W% height=%H% draggable=false tabindex=0>
<script>
let yaw=0, pitch=0.3, radius=%R%, busy=false, queued=false;
let pos=null;  // free-fly camera position, set on first toggle
const img=document.getElementById('v');
const flyBox=document.getElementById('fly');
function front(){  // fly-mode view direction from yaw/pitch
  return [Math.cos(pitch)*Math.sin(yaw), Math.sin(pitch),
          Math.cos(pitch)*Math.cos(yaw)];
}
function refresh(){
  if(busy){queued=true;return;} busy=true;
  const m=document.getElementById('mode').value;
  const s=document.getElementById('scale').value;
  const t0=performance.now();
  let u=`/render?yaw=${yaw}&pitch=${pitch}&mode=${m}&scale=${s}&_=${Math.random()}`;
  if(flyBox.checked && pos)
    u+=`&fly=1&px=${pos[0]}&py=${pos[1]}&pz=${pos[2]}`;
  else u+=`&radius=${radius}`;
  const i=new Image();
  i.onload=()=>{img.src=i.src; busy=false;
    document.getElementById('stat').textContent=`${(performance.now()-t0).toFixed(0)} ms`;
    if(queued){queued=false;refresh();}};
  i.src=u;
}
flyBox.onchange=()=>{
  if(flyBox.checked && !pos){
    // seed the fly pose from the current orbit pose (camera at eye,
    // looking back at the center => flip the view direction)
    const f=front();
    pos=[radius*f[0], radius*f[1], radius*f[2]];
    yaw+=Math.PI; pitch=-pitch;
  }
  img.focus(); refresh();
};
let drag=false,lx=0,ly=0;
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY;img.focus()};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  const sgn=flyBox.checked?-1:1;  // fly: drag pans the view, not the orbit
  yaw+=sgn*(e.clientX-lx)*0.01; pitch+=sgn*(e.clientY-ly)*0.01;
  pitch=Math.max(-1.5,Math.min(1.5,pitch)); lx=e.clientX;ly=e.clientY; refresh();};
img.onwheel=e=>{e.preventDefault();
  if(flyBox.checked){const f=front(),d=-e.deltaY*0.003;
    pos=[pos[0]+f[0]*d,pos[1]+f[1]*d,pos[2]+f[2]*d];}
  else radius*=Math.exp(e.deltaY*0.001);
  refresh();};
window.onkeydown=e=>{
  if(!flyBox.checked||!pos)return;
  const f=front();
  const up=[0,-1,0];
  let r=[f[1]*up[2]-f[2]*up[1], f[2]*up[0]-f[0]*up[2], f[0]*up[1]-f[1]*up[0]];
  const rn=Math.hypot(...r)||1; r=r.map(v=>v/rn);
  const st=0.12*Math.max(radius,1)*0.25;
  const mv={w:f.map(v=>v*st), s:f.map(v=>-v*st),
            a:r.map(v=>-v*st), d:r.map(v=>v*st),
            r:[0,-st,0], f:[0,st,0]}[e.key.toLowerCase()];
  if(!mv)return;
  e.preventDefault();
  pos=[pos[0]+mv[0],pos[1]+mv[1],pos[2]+mv[2]];
  refresh();
};
document.getElementById('mode').onchange=refresh;
document.getElementById('scale').oninput=refresh;
refresh();
</script></body></html>"""


class ViewerState:
    def __init__(self, scene, center, radius, cfg, backend):
        self.scene = scene
        self.center = np.asarray(center, np.float64)
        self.radius = float(radius)
        self.cfg = cfg
        self.backend = backend
        self.lock = threading.Lock()

    def render_frame(self, yaw, pitch, radius, mode, scale, fly_pos=None):
        from gaussiansplattingviewer_tpu.ops.render import render
        from gaussiansplattingviewer_tpu.utils.image_io import _PILImage

        cfg = self.cfg.with_(
            mode=MODE_NAMES.get(mode, RenderMode.SH3),
            scale_modifier=float(scale),
        )
        front = np.array(
            [
                np.cos(pitch) * np.sin(yaw),
                np.sin(pitch),
                np.cos(pitch) * np.cos(yaw),
            ]
        )
        if fly_pos is not None:
            # free-fly: camera at fly_pos looking along its own orientation
            # (the reference's first-person mode, util.py:140-150 +
            # main.py:441-485; orientation parameterized yaw/pitch like
            # utils.camera.Camera's free-fly state)
            eye = np.asarray(fly_pos, np.float64)
            view = tf.look_at(eye, eye + front, [0, -1, 0])
        else:
            eye = self.center + radius * front
            view = tf.look_at(eye, self.center, [0, -1, 0])
        cam = Camera(h=cfg.height, w=cfg.width)
        with self.lock:
            img = np.asarray(
                render(
                    self.scene, view, cam.get_project_matrix(),
                    eye.astype(np.float32), cfg, backend=self.backend,
                )
            )
        img8 = np.clip(np.round(img * 255), 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        if _PILImage is not None:
            _PILImage.fromarray(img8, "RGB").save(buf, format="PNG")
        else:  # pure-python fallback
            import tempfile, os

            from gaussiansplattingviewer_tpu.utils.image_io import _write_png_raw

            with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
                _write_png_raw(f.name, img8)
                buf.write(open(f.name, "rb").read())
                os.unlink(f.name)
        return buf.getvalue()


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                opts = "".join(
                    f'<option value="{m}"{" selected" if m == "sh3" else ""}>{m}</option>'
                    for m in sorted(MODE_NAMES)
                )
                page = (
                    _PAGE.replace("%OPTS%", opts)
                    .replace("%W%", str(state.cfg.width))
                    .replace("%H%", str(state.cfg.height))
                    .replace("%R%", str(state.radius))
                )
                body = page.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/render":
                q = parse_qs(url.query)

                def f(k, d):
                    return float(q.get(k, [d])[0])

                fly_pos = None
                if q.get("fly", ["0"])[0] == "1":
                    fly_pos = (f("px", 0.0), f("py", 0.0), f("pz", 0.0))
                png = state.render_frame(
                    f("yaw", 0.0), f("pitch", 0.3), f("radius", state.radius),
                    q.get("mode", ["sh3"])[0], f("scale", 1.0),
                    fly_pos=fly_pos,
                )
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(png)
            elif url.path == "/info":
                body = json.dumps(
                    {"n_gaussians": int(len(state.scene)),
                     "sh_dim": int(state.scene.sh_dim)}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--gs-model", default=None)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args(argv)

    import jax

    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "tile"
    )
    scene, bbox, center = load_scene(args.gs_model)
    scene = scene.pad_to_multiple(256).to_device()
    extent = float(np.linalg.norm(np.asarray(bbox[1]) - np.asarray(bbox[0])))
    cfg = RenderConfig(width=args.width, height=args.height)
    state = ViewerState(scene, center, max(extent, 1.0), cfg, backend)

    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(state))
    print(
        f"serving {len(scene)} gaussians at http://127.0.0.1:{args.port} "
        f"(backend={backend})",
        file=sys.stderr,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
