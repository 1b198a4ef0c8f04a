"""Interactive + offline scene viewers.

The reference viewer is a GLFW/ImGui/OpenGL app with CUDA-GL interop
(src/viewer/viewer.cpp) — none of which exists on a TPU host. The TPU-native
replacements keep the reference's *threading contract* and API surface
(`update_scene` / `step` / `is_closed`, viewer.h:30-48; `run_with_viewer`
runs the training callback on a background thread, viewer.cpp:1130-1144)
but swap the output device:

  * ``Viewer`` + ``run_with_viewer`` — an HTTP viewer: a tiny built-in
    server renders frames with the benchmark tracer on demand and streams
    them to a browser page with fly-camera controls (WASD + drag), pause /
    step buttons, visualization modes (RGB / Depth / Alpha /
    Intersections), weight threshold and depth-quantile controls —
    mirroring the reference's ImGui panel (viewer.cpp:738-859).
  * ``TurntableRenderer`` — offline orbit renders to PNG files, for
    headless inspection of a checkpoint.

Training pauses exactly like the reference: ``viewer.step(i)`` blocks while
the pause flag is set (viewer.cpp:1082-1094).
"""

import io
import json
import threading
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ViewerOptions:
    """Defaults mirror src/viewer/viewer.h:10-28."""

    camera_pos: np.ndarray = field(
        default_factory=lambda: np.array([0.0, 0.0, -10.0], np.float32)
    )
    camera_forward: np.ndarray = field(
        default_factory=lambda: np.array([0.0, 0.0, 1.0], np.float32)
    )
    camera_up: np.ndarray = field(
        default_factory=lambda: np.array([0.0, -1.0, 0.0], np.float32)
    )
    fov: float = 60.0  # degrees, vertical
    width: int = 960
    height: int = 540
    max_framerate: float = 20.0  # fps cap while training
    weight_threshold: float = 0.05
    depth_quantile: float = 0.5
    max_depth: float = 10.0
    max_intersections: int = 1024
    camera_model: str = "pinhole"  # or "fisheye"
    background: str = "checker"  # or "solid" (reference viewer.cpp:806-812)
    port: int = 8090


class Viewer:
    """Scene viewer state shared between the training thread and the
    render/serving thread (reference viewer.cpp:545-553 atomics+mutex)."""

    VIS_MODES = ("rgb", "depth", "alpha", "intersections")

    def __init__(self, sh_degree, options: ViewerOptions = None):
        self.options = options or ViewerOptions()
        self.sh_degree = sh_degree
        self._lock = threading.Lock()
        self._scene = None  # (points, attrs, nbr_idx) device arrays
        self._closed = threading.Event()
        self._paused = threading.Event()
        self._step_once = threading.Event()
        self.iteration = 0
        self.total_iterations = None
        self.vis_mode = "rgb"
        self.color_map = "viridis"
        self.camera_pos = np.array(self.options.camera_pos, np.float32)
        self.camera_forward = _unit(self.options.camera_forward)
        self.camera_up = _unit(self.options.camera_up)

    # -- training-thread API (reference viewer.h:30-48) -----------------

    def update_scene(self, points, attributes, nbr_idx, *rest):
        """Snapshot the live scene buffers (deep copy under mutex like
        viewer.cpp:1007-1080; here device arrays are immutable so the
        snapshot is just a reference swap)."""
        with self._lock:
            self._scene = (points, attributes, nbr_idx)

    def step(self, iteration):
        """Block while paused — this is how the GUI pauses training
        (viewer.cpp:1082-1094)."""
        self.iteration = iteration
        while self._paused.is_set() and not self._closed.is_set():
            if self._step_once.is_set():
                self._step_once.clear()
                break
            time.sleep(0.02)

    def is_closed(self):
        return self._closed.is_set()

    def close(self):
        self._closed.set()

    # -- render side -----------------------------------------------------

    def render_frame(self):
        """Render the current camera with the visualization tracer.

        Returns an (H, W, 3) uint8 array, or None if no scene yet.
        """
        with self._lock:
            scene = self._scene
        if scene is None:
            return None
        points, attrs, nbr_idx = scene

        import jax.numpy as jnp
        from radfoam_tpu.ops.camera import Camera, PINHOLE, cast_rays
        from radfoam_tpu.ops.trace import TraceConfig
        from radfoam_tpu.ops import trace as trace_mod
        from radfoam_tpu.ops.nn import build_aabb_tree, nn

        from radfoam_tpu.ops.camera import FISHEYE

        o = self.options
        right = _unit(np.cross(self.camera_forward, self.camera_up))
        up = _unit(np.cross(right, self.camera_forward))
        cam = Camera(
            position=self.camera_pos, forward=self.camera_forward,
            right=right, up=up, fov=np.deg2rad(o.fov),
            width=o.width, height=o.height,
            model=FISHEYE if o.camera_model == "fisheye" else PINHOLE,
        )
        rays = cast_rays(cam).reshape(-1, 6)
        tree = build_aabb_tree(points)
        start = int(nn(points, tree, self.camera_pos[None])[0])

        nq = 1 if self.vis_mode == "depth" else 0
        cfg = TraceConfig(
            sh_degree=self.sh_degree, num_quantiles=nq,
            weight_threshold=float(o.weight_threshold),
            max_intersections=int(o.max_intersections),
            chunk_size=1 << 17,
        )
        quant = (
            jnp.full((rays.shape[0], 1), float(o.depth_quantile),
                     jnp.float32) if nq else
            jnp.zeros((rays.shape[0], 0), jnp.float32)
        )
        out = trace_mod._trace_forward_impl(
            cfg, points, attrs, nbr_idx, rays,
            jnp.full((rays.shape[0],), start, jnp.int32), quant,
        )
        rgba = np.asarray(out.rgba, dtype=np.float32).reshape(
            o.height, o.width, 4
        )
        if self.vis_mode == "rgb":
            # checkerboard or solid background (reference viewer.cpp:806-812)
            if o.background == "solid":
                bg = np.float32(1.0)
            else:
                yy, xx = np.mgrid[0 : o.height, 0 : o.width]
                checker = (
                    (((xx // 20) % 2) * 2 - 1) * (((yy // 20) % 2) * 2 - 1)
                )
                bg = np.where(checker[..., None] > 0, 0.3, 0.5).astype(
                    np.float32
                )
            img = rgba[..., :3] + (1 - rgba[..., 3:]) * bg
        elif self.vis_mode == "alpha":
            img = np.repeat(rgba[..., 3:], 3, axis=-1)
        elif self.vis_mode == "depth":
            from radfoam_tpu.viewer.colormaps import apply_colormap

            d = np.asarray(out.depth).reshape(o.height, o.width)
            img = apply_colormap(d / o.max_depth, self.color_map)
        else:  # intersections heat map (reference pipeline.cu:461-467)
            from radfoam_tpu.viewer.colormaps import apply_colormap

            nint = np.asarray(out.num_intersections, np.float32).reshape(
                o.height, o.width
            )
            img = apply_colormap(nint / 256.0, self.color_map)
        return np.uint8(np.clip(img, 0, 1) * 255)

    # -- camera controls -------------------------------------------------

    def move(self, forward=0.0, right_amt=0.0, up_amt=0.0):
        right = _unit(np.cross(self.camera_forward, self.camera_up))
        self.camera_pos = (
            self.camera_pos
            + forward * self.camera_forward
            + right_amt * right
            + up_amt * self.camera_up
        ).astype(np.float32)

    def rotate(self, yaw=0.0, pitch=0.0):
        right = _unit(np.cross(self.camera_forward, self.camera_up))
        f = self.camera_forward
        f = _rotate_about(f, self.camera_up, yaw)
        f = _rotate_about(f, right, pitch)
        self.camera_forward = _unit(f)


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def _rotate_about(v, axis, angle):
    axis = _unit(axis)
    c, s = np.cos(angle), np.sin(angle)
    return (
        v * c + np.cross(axis, v) * s + axis * np.dot(axis, v) * (1 - c)
    ).astype(np.float32)


_PAGE = """<!doctype html><html><head><title>radfoam-tpu viewer</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
#f{border:1px solid #444}</style></head><body>
<div>
<button onclick="cmd('pause')">pause/resume</button>
<button onclick="cmd('step')">step</button>
<select id="mode" onchange="cmd('mode&v='+this.value)">
<option>rgb</option><option>depth</option><option>alpha</option>
<option>intersections</option></select>
<select id="cmap" onchange="cmd('cmap&v='+this.value)">
<option>viridis</option><option>inferno</option><option>turbo</option>
<option>gray</option></select>
<select id="cmodel" onchange="cmd('cmodel&v='+this.value)">
<option>pinhole</option><option>fisheye</option></select>
fov<input id="fov" type="range" min="20" max="180" value="60"
 oninput="cmd('fov&v='+this.value)" style="width:90px"/>
max-int<input id="maxi" type="number" min="16" max="4096" value="1024"
 onchange="cmd('maxi&v='+this.value)" style="width:64px"/>
wt 1e-<input id="wt" type="range" min="1" max="6" step="0.5" value="1.3"
 oninput="cmd('wt&v='+Math.pow(10,-this.value))" style="width:70px"/>
depth-q<input id="dq" type="range" min="0.01" max="0.99" step="0.01"
 value="0.5" oninput="cmd('dq&v='+this.value)" style="width:70px"/>
<select id="bg" onchange="cmd('bg&v='+this.value)">
<option>checker</option><option>solid</option></select>
fps-cap<input id="fps" type="number" min="1" max="60" value="20"
 onchange="cmd('fps&v='+this.value)" style="width:48px"/>
<span id="st"></span>
</div>
<img id="f" width="960" height="540"/>
<script>
const img=document.getElementById('f');
function cmd(c){fetch('/cmd?c='+c)}
let keys={};
onkeydown=e=>keys[e.key]=1; onkeyup=e=>keys[e.key]=0;
let drag=null;
img.onmousedown=e=>drag=[e.clientX,e.clientY];
onmouseup=()=>drag=null;
onmousemove=e=>{if(drag){
  fetch(`/cmd?c=rot&dx=${e.clientX-drag[0]}&dy=${e.clientY-drag[1]}`);
  drag=[e.clientX,e.clientY];}};
setInterval(()=>{
  let f=(keys['w']?1:0)-(keys['s']?1:0);
  let r=(keys['d']?1:0)-(keys['a']?1:0);
  let u=(keys['e']?1:0)-(keys['q']?1:0);
  if(f||r||u)fetch(`/cmd?c=move&f=${f}&r=${r}&u=${u}`);
},100);
function refresh(){
  img.src='/frame.png?t='+Date.now();
  fetch('/status').then(r=>r.json()).then(s=>{
    document.getElementById('st').textContent=
      ` iter ${s.iteration}${s.total?'/'+s.total:''} ${s.paused?'[paused]':''}`;
  });
}
img.onload=()=>setTimeout(refresh,50);
img.onerror=()=>setTimeout(refresh,500);
refresh();
</script></body></html>"""


def serve_viewer(viewer: Viewer, port=None):
    """Start the HTTP viewer server (daemon thread). Returns the server."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import urlparse, parse_qs

    port = port or viewer.options.port
    frame_cache = {
        "png": None, "t": 0.0, "lock": threading.Lock(),
        # held across render+encode+store so concurrent /frame.png misses
        # don't all render the same frame redundantly
        "render_lock": threading.Lock(),
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/frame.png":
                # framerate cap while training (reference viewer.cpp:967-981):
                # requests arriving faster than max_framerate are served the
                # cached frame so render work never exceeds the cap.
                min_dt = 1.0 / max(viewer.options.max_framerate, 1e-3)

                def cached():
                    now = time.monotonic()
                    with frame_cache["lock"]:
                        png = frame_cache["png"]
                        fresh = now - frame_cache["t"] < min_dt
                    return png if (png is not None and fresh) else None

                png = cached()
                if png is None:
                    with frame_cache["render_lock"]:
                        # another request may have rendered while we
                        # waited on the render lock — re-check first
                        png = cached()
                        if png is None:
                            img = viewer.render_frame()
                            if img is None:
                                self.send_response(503)
                                self.end_headers()
                                return
                            from PIL import Image

                            buf = io.BytesIO()
                            Image.fromarray(img).save(buf, format="PNG")
                            png = buf.getvalue()
                            with frame_cache["lock"]:
                                frame_cache["png"] = png
                                frame_cache["t"] = time.monotonic()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(png)
            elif url.path == "/status":
                body = json.dumps({
                    "iteration": viewer.iteration,
                    "total": viewer.total_iterations,
                    "paused": viewer._paused.is_set(),
                    "mode": viewer.vis_mode,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/cmd":
                c = q.get("c", [""])[0]
                if c == "pause":
                    if viewer._paused.is_set():
                        viewer._paused.clear()
                    else:
                        viewer._paused.set()
                elif c == "step":
                    viewer._step_once.set()
                elif c == "mode":
                    v = q.get("v", ["rgb"])[0]
                    if v in Viewer.VIS_MODES:
                        viewer.vis_mode = v
                elif c == "cmap":
                    from radfoam_tpu.viewer.colormaps import COLORMAPS

                    v = q.get("v", ["viridis"])[0]
                    if v in COLORMAPS:
                        viewer.color_map = v
                elif c == "cmodel":
                    v = q.get("v", ["pinhole"])[0]
                    if v in ("pinhole", "fisheye"):
                        viewer.options.camera_model = v
                elif c == "fov":
                    viewer.options.fov = min(
                        max(float(q.get("v", [60])[0]), 5.0), 180.0
                    )
                elif c == "maxi":
                    viewer.options.max_intersections = min(
                        max(int(float(q.get("v", [1024])[0])), 16), 4096
                    )
                elif c == "wt":
                    # weight-threshold slider (viewer.cpp:815-820)
                    viewer.options.weight_threshold = min(
                        max(float(q.get("v", [0.05])[0]), 1e-6), 0.5
                    )
                elif c == "dq":
                    # depth-percentile slider (viewer.cpp:829-833)
                    viewer.options.depth_quantile = min(
                        max(float(q.get("v", [0.5])[0]), 0.01), 0.99
                    )
                elif c == "bg":
                    v = q.get("v", ["checker"])[0]
                    if v in ("checker", "solid"):
                        viewer.options.background = v
                elif c == "fps":
                    viewer.options.max_framerate = min(
                        max(float(q.get("v", [20])[0]), 1.0), 60.0
                    )
                elif c == "move":
                    s = 0.1
                    viewer.move(
                        forward=s * float(q.get("f", [0])[0]),
                        right_amt=s * float(q.get("r", [0])[0]),
                        up_amt=s * float(q.get("u", [0])[0]),
                    )
                elif c == "rot":
                    viewer.rotate(
                        yaw=-0.005 * float(q.get("dx", [0])[0]),
                        pitch=-0.005 * float(q.get("dy", [0])[0]),
                    )
                # any viewer-option / camera change must show on the next
                # /frame.png instead of serving the stale cached frame
                with frame_cache["lock"]:
                    frame_cache["t"] = 0.0
                self.send_response(200)
                self.end_headers()
            else:
                self.send_response(404)
                self.end_headers()

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    print(f"viewer: http://127.0.0.1:{port}/")
    return server


def run_with_viewer(model, loop_fn, total_iterations=None, camera_pos=None,
                    camera_forward=None, camera_up=None, port=None):
    """Run a training/viewing callback with the HTTP viewer attached.

    Mirrors the reference threading contract (viewer.cpp:1130-1144) with
    the roles swapped for a server: the callback runs on the *calling*
    thread (JAX prefers the main thread) and the HTTP server renders from
    daemon threads.
    """
    opts = ViewerOptions()
    if camera_pos is not None:
        opts.camera_pos = np.asarray(camera_pos, np.float32)
    if camera_forward is not None:
        opts.camera_forward = np.asarray(camera_forward, np.float32)
    if camera_up is not None:
        opts.camera_up = np.asarray(camera_up, np.float32)
    if port is not None:
        opts.port = port

    viewer = Viewer(model.sh_degree, opts)
    viewer.total_iterations = total_iterations
    points, attrs, nbr_idx = model.get_trace_data()
    viewer.update_scene(points, attrs, nbr_idx)

    server = serve_viewer(viewer)
    try:
        loop_fn(viewer)
    finally:
        viewer.close()
        server.shutdown()


class TurntableRenderer:
    """Offline orbit renders of a scene to PNG files."""

    def __init__(self, model, width=1280, height=720, radius=None,
                 center=None, elevation=0.3):
        self.model = model
        self.width = width
        self.height = height
        pts = np.asarray(model.primal_points)
        self.center = (
            np.asarray(center, np.float32) if center is not None
            else pts.mean(axis=0)
        )
        spread = np.linalg.norm(pts - self.center, axis=1)
        self.radius = (
            float(radius) if radius is not None
            else float(np.quantile(spread, 0.9)) * 2.0
        )
        self.elevation = elevation

    def render(self, out_dir, n_frames=30, weight_threshold=0.05):
        import os

        from PIL import Image
        import jax.numpy as jnp
        from radfoam_tpu.ops.camera import look_at, cast_rays
        from radfoam_tpu.ops.trace import TraceConfig
        from radfoam_tpu.ops import trace as trace_mod

        os.makedirs(out_dir, exist_ok=True)
        points, attrs, nbr_idx = self.model.get_trace_data()
        cfg = TraceConfig(
            sh_degree=self.model.sh_degree, num_quantiles=0,
            weight_threshold=weight_threshold, chunk_size=1 << 17,
        )
        paths = []
        for i in range(n_frames):
            ang = 2 * np.pi * i / n_frames
            eye = self.center + self.radius * np.array([
                np.cos(ang), np.sin(ang), self.elevation
            ])
            cam = look_at(eye, self.center, [0, 0, 1],
                          fov=np.deg2rad(50), width=self.width,
                          height=self.height)
            rays = cast_rays(cam).reshape(-1, 6)
            start = int(self.model.get_starting_point(
                jnp.asarray(eye[None].astype(np.float32))
            )[0])
            out = trace_mod._trace_forward_impl(
                cfg, points, attrs, nbr_idx, rays,
                jnp.full((rays.shape[0],), start, jnp.int32),
                jnp.zeros((rays.shape[0], 0), jnp.float32),
            )
            rgba = np.asarray(out.rgba, np.float32).reshape(
                self.height, self.width, 4
            )
            rgb = np.clip(rgba[..., :3] + (1 - rgba[..., 3:]), 0, 1)
            path = os.path.join(out_dir, f"turntable_{i:03d}.png")
            Image.fromarray(np.uint8(rgb * 255)).save(path)
            paths.append(path)
        return paths
