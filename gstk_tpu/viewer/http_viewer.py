"""Zero-dependency live viewer: stdlib HTTP server + orbit-control web page.

The reference's live viewer is viser-based (``gs_toolkit/viewer/viewer.py:42``,
websocket render state machine). viser is not available in this image, so
this module provides the same capability — watch training live, orbit the
scene, fetch RGB/depth — with only the standard library:

  * ``GET /``            — single-file HTML viewer (mouse orbit/zoom/pan);
  * ``GET /render?...``  — JPEG render for a posed camera (pose params in the
    query string), served from the latest scene snapshot;
  * ``GET /stats``       — JSON training stats.

The trainer publishes scene snapshots via :meth:`ViewerServer.update_scene`
(the analog of ``Viewer.update_scene`` called from the train loop,
engine/trainer.py:262). Rendering runs in the HTTP thread against a snapshot
reference, so it never blocks the train step (no train_lock needed — JAX
arrays are immutable; contrast with the reference's lock + sys.settrace
interrupt hack, render_state_machine.py:130-223).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>gstk_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#img{display:block;margin:auto;cursor:grab}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:6px}
</style></head><body>
<div id="hud">drag: orbit &nbsp; wheel: zoom &nbsp; shift-drag: pan<br/>
<span id="stats"></span></div>
<img id="img" width="640" height="480"/>
<script>
let az=0, el=0.3, r=3.0, cx=0, cy=0, cz=0, drag=false, lx=0, ly=0, shift=false;
const img=document.getElementById('img');
function url(){return `/render?az=${az}&el=${el}&r=${r}&cx=${cx}&cy=${cy}&cz=${cz}&t=${Date.now()}`;}
let busy=false;
function refresh(){ if(busy) return; busy=true;
  const u=url(); const pre=new Image();
  pre.onload=()=>{img.src=u; busy=false;}; pre.onerror=()=>{busy=false;};
  pre.src=u; }
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY;shift=e.shiftKey;};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;
  const dx=e.clientX-lx, dy=e.clientY-ly; lx=e.clientX; ly=e.clientY;
  if(shift){cx-=dx*0.002*r; cy+=dy*0.002*r;}
  else{az-=dx*0.01; el=Math.max(-1.5,Math.min(1.5,el+dy*0.01));}
  refresh();};
img.onwheel=e=>{e.preventDefault(); r*=Math.exp(e.deltaY*0.001); refresh();};
setInterval(()=>{fetch('/stats').then(r=>r.json()).then(s=>{
  document.getElementById('stats').textContent=JSON.stringify(s);});
  refresh();}, 2000);
refresh();
</script></body></html>"""


def orbit_pose(az: float, el: float, radius: float, center) -> np.ndarray:
    """OpenGL c2w looking at ``center`` from spherical (az, el, radius)."""
    eye = np.asarray(center, np.float64) + radius * np.array(
        [
            np.cos(el) * np.sin(az),
            np.sin(el),
            np.cos(el) * np.cos(az),
        ]
    )
    forward = np.asarray(center, np.float64) - eye
    forward /= np.linalg.norm(forward)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(forward, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward  # OpenGL: camera looks along -z
    c2w[:3, 3] = eye
    return c2w


class ViewerServer:
    """Background HTTP viewer. ``render_fn(c2w, h, w) -> rgb uint8``."""

    def __init__(self, render_fn, host: str = "0.0.0.0", port: int = 7007,
                 width: int = 640, height: int = 480):
        self.render_fn = render_fn
        self.stats = {}
        self.width = width
        self.height = height
        # keyframe trajectory editor state (the functional core of the
        # reference's render panel, viewer/render_panel.py:1-1247: collect
        # keyframes, interpolate, emit a camera_path json for gs-render)
        self.keyframes = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                if parsed.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                elif parsed.path == "/stats":
                    body = json.dumps(outer.stats).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                elif parsed.path == "/render":
                    q = {k: float(v[0]) for k, v in parse_qs(parsed.query).items()
                         if k != "t"}
                    c2w = orbit_pose(
                        q.get("az", 0.0), q.get("el", 0.3), q.get("r", 3.0),
                        (q.get("cx", 0.0), q.get("cy", 0.0), q.get("cz", 0.0)),
                    )
                    rgb = outer.render_fn(c2w, outer.height, outer.width)
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(rgb).save(buf, format="JPEG", quality=85)
                    body = buf.getvalue()
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(body)
                elif parsed.path == "/keyframe/add":
                    # record the current orbit pose as a trajectory keyframe
                    q = {k: float(v[0]) for k, v in
                         parse_qs(parsed.query).items()}
                    c2w = orbit_pose(
                        q.get("az", 0.0), q.get("el", 0.3), q.get("r", 3.0),
                        (q.get("cx", 0.0), q.get("cy", 0.0), q.get("cz", 0.0)),
                    )
                    outer.keyframes.append(np.asarray(c2w, np.float32))
                    self._json({"num_keyframes": len(outer.keyframes)})
                elif parsed.path == "/keyframe/clear":
                    outer.keyframes.clear()
                    self._json({"num_keyframes": 0})
                elif parsed.path == "/keyframes":
                    self._json(
                        {"keyframes": [k.tolist() for k in outer.keyframes]}
                    )
                elif parsed.path == "/trajectory":
                    # interpolated camera_path json (consumable by
                    # `gs-render trajectory`), like the reference render
                    # panel's export button
                    from gstk_tpu.core.trajectories import (
                        interpolate_poses,
                        poses_to_camera_path,
                    )

                    q = {k: float(v[0]) for k, v in
                         parse_qs(parsed.query).items()}
                    if len(outer.keyframes) < 2:
                        self.send_response(400)
                        self.end_headers()
                        self.wfile.write(b"need >= 2 keyframes")
                        return
                    poses = interpolate_poses(
                        outer.keyframes,
                        steps_per_segment=int(q.get("steps", 30)),
                    )
                    self._json(poses_to_camera_path(
                        poses,
                        fov_deg=q.get("fov", 70.0),
                        render_height=int(q.get("h", 1080)),
                        render_width=int(q.get("w", 1920)),
                        fps=q.get("fps", 30.0),
                    ))
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                # raw keyframe upload: JSON body {"c2w": [[...3x4 or 4x4]]}
                parsed = urlparse(self.path)
                if parsed.path == "/keyframe/add":
                    n = int(self.headers.get("Content-Length", 0))
                    data = json.loads(self.rfile.read(n) or b"{}")
                    c2w = np.asarray(data["c2w"], np.float32)[:3, :4]
                    outer.keyframes.append(c2w)
                    self._json({"num_keyframes": len(outer.keyframes)})
                else:
                    self.send_response(404)
                    self.end_headers()

            def _json(self, obj):
                body = json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def start(self):
        self._thread.start()
        print(f"Viewer running at http://localhost:{self.port}")
        return self

    def update_stats(self, stats: dict):
        self.stats = dict(stats)

    def stop(self):
        self._httpd.shutdown()


class TrainingViewer:
    """Glue between the trainer and the HTTP viewer: keeps a scene snapshot
    and renders it on demand (jit-cached per size)."""

    def __init__(self, model_config, raster_config, port: int = 7007):
        import jax
        import jax.numpy as jnp

        from gstk_tpu.core.cameras import Camera
        from gstk_tpu.models.vanilla import render_scene

        self._scene = None
        self._lock = threading.Lock()
        self._cache = {}

        def render(c2w, h, w):
            with self._lock:
                scene = self._scene
            if scene is None:
                return np.zeros((h, w, 3), np.uint8)
            key = (h, w)
            if key not in self._cache:
                def fn(scene, camera):
                    return render_scene(
                        scene, camera, h, w,
                        sh_degree=model_config.sh_degree,
                        background=jnp.asarray([0.149, 0.1647, 0.2157]),
                        config=model_config, raster_config=raster_config,
                    )["rgb"]
                self._cache[key] = jax.jit(fn)
            camera = Camera(
                fx=jnp.float32(0.8 * w), fy=jnp.float32(0.8 * w),
                cx=jnp.float32(w / 2), cy=jnp.float32(h / 2),
                c2w=jnp.asarray(c2w),
            )
            rgb = np.asarray(self._cache[key](scene, camera))
            return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

        self.server = ViewerServer(render, port=port)

    def start(self):
        self.server.start()
        return self

    def update_scene(self, scene, stats: Optional[dict] = None):
        with self._lock:
            self._scene = scene
        if stats:
            self.server.update_stats(stats)
