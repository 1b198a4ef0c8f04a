"""2M-point scale proof (VERDICT r1 task 2): full cycle on real TPU.

Builds a trained-like 2M-point scene, triangulates it, computes raster
bounds, renders 1080p frames with the tile rasterizer (FPS), cross-checks
raster vs walk at low res (PSNR), times the differentiable walk fwd+bwd at
1M rays (the train-step core), runs one prune_and_densify + incremental
retriangulation, and prints a JSON summary. Results recorded in DEVNOTES.md.
"""

import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
from functools import partial
import sys
import time

import numpy as np

t_all = time.time()
N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152
SH = 3

import jax
import jax.numpy as jnp

from radfoam_tpu.delaunay import Triangulation
from radfoam_tpu.ops.adjacency import csr_to_padded
from radfoam_tpu.ops.camera import look_at, cast_rays_device
from radfoam_tpu.ops import raster as R
from radfoam_tpu.ops.trace import TraceConfig, trace, pack_rgba8

out = {"n_points": N_POINTS}
print("devices:", jax.devices(), flush=True)

# scene via bench.py's on-disk cache (generation takes many minutes on
# this host; the triangulation/bounds timings below re-measure fresh)
t0 = time.time()
import bench

pts, attrs, table, bb_min, bb_max = bench.build_scene()
out["scene_ready_s"] = round(time.time() - t0, 1)
out["K"] = int(table.shape[1])
print(f"scene ready: {out['scene_ready_s']}s K={out['K']}", flush=True)

# timed full (warm-order) triangulation + bounds
t0 = time.time()
tri = Triangulation(pts)
out["full_tri_s"] = round(time.time() - t0, 1)
print(f"full triangulation: {out['full_tri_s']}s tets={tri.tets().shape[0]}",
      flush=True)

t0 = time.time()
bb_min2, bb_max2, hull = tri.cell_bounds()
out["cell_bounds_s"] = round(time.time() - t0, 1)
print(f"cell_bounds: {out['cell_bounds_s']}s hull={int(hull.sum())}",
      flush=True)

from radfoam_tpu.ops.cellbound import clamp_bounds

bb_min, bb_max, clamp_r = clamp_bounds(pts, bb_min, bb_max)
out["bound_clamp_r"] = round(clamp_r, 4)

# ---- raster FPS at 1080p ------------------------------------------------
W, H = 1920, 1080
cap = 3 << 20
density = attrs[:, -1]
@jax.jit
def _build(p, a, t, b0, b1):
    return R.build_scene_table(p, a, t, b0, b1, sh_degree=SH)

rtable = _build(jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
                jnp.asarray(bb_min), jnp.asarray(bb_max))
# real sync (block_until_ready is unreliable over the tunnel)
_ = jax.device_get(rtable[:2, :2])

frames = []
for v in range(4):
    ang = 2 * np.pi * v / 4
    eye = np.array([4.5 * np.cos(ang), 4.5 * np.sin(ang), 1.5])
    cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=1.0, width=W, height=H)
    frames.append(tuple(
        jnp.asarray(np.asarray(x, np.float32))
        for x in (cam.position, cam.forward, cam.right, cam.up)
    ))

bbmin_d, bbmax_d = jnp.asarray(bb_min), jnp.asarray(bb_max)
dens_d = jnp.asarray(density)

def _render(rp, b0, b1, dd, pos, fwd, rgt, up, *, cfg):
    # staged frame: a fresh fused-frame compile can exceed HBM at 2M
    return R.render_frame_staged(rp, b0, b1, dd, pos, fwd, rgt, up,
                                 jnp.float32(1.0), width=W, height=H,
                                 cfg=cfg)


while True:
    cfg = R.RasterConfig(sh_degree=SH, weight_threshold=0.05, tile=16,
                         max_pairs=cap, alpha_cull=1e-3,
                         table_k=int(table.shape[1]))
    render = lambda pos, fwd, rgt, up: _render(
        rtable, bbmin_d, bbmax_d, dens_d, pos, fwd, rgt, up, cfg=cfg)
    t0 = time.time()
    img, n_pairs, forced = render(*frames[0])
    jax.block_until_ready(img)
    print(f"compile+run: {time.time()-t0:.0f}s n_pairs={int(n_pairs)} "
          f"cap={cap} forced={float(forced)}", flush=True)
    if int(n_pairs) <= cap:
        break
    cap *= 2

out["n_pairs"] = int(n_pairs)
out["forced_pops"] = float(forced)
for f in frames:
    jax.block_until_ready(render(*f))
# device_get forces real remote completion (block_until_ready over the
# axon tunnel returns early)
_ = jax.device_get(render(*frames[0])[0][:2, :2])
t0 = time.time()
reps = 3
for _ in range(reps):
    outs = [render(*f)[0] for f in frames]
_ = jax.device_get(outs[-1][:2, :2])
dt = (time.time() - t0) / (reps * len(frames))
out["raster_ms_per_frame"] = round(dt * 1000, 1)
out["raster_fps_1080p"] = round(1 / dt, 2)
print(f"raster: {dt*1000:.0f} ms/frame ({1/dt:.2f} fps)", flush=True)

# ---- parity: raster vs walk at 480x270 ----------------------------------
w2, h2 = 480, 270
cam = look_at(np.array([4.5, 0, 1.5]), [0, 0, 0], [0, 0, 1], fov=1.0,
              width=w2, height=h2)
cfg2 = cfg._replace(max_pairs=cap)


def _render2(rp, b0, b1, dd, pos, fwd, rgt, up):
    return R.render_frame_staged(rp, b0, b1, dd, pos, fwd, rgt, up,
                                 jnp.float32(1.0), width=w2, height=h2,
                                 cfg=cfg2)


img_r, _, _ = _render2(
    rtable, bbmin_d, bbmax_d, dens_d,
    *[jnp.asarray(np.asarray(x, np.float32)) for x in
      (cam.position, cam.forward, cam.right, cam.up)])
img_r = np.asarray(img_r)

rays = np.asarray(jax.device_get(cast_rays_device(
    jnp.asarray(cam.position), jnp.asarray(cam.forward),
    jnp.asarray(cam.right), jnp.asarray(cam.up),
    jnp.float32(1.0), w2, h2))).reshape(-1, 6)
start = int(np.argmin(np.sum((pts - np.asarray(cam.position)) ** 2, axis=1)))
tcfg = TraceConfig(sh_degree=SH, num_quantiles=0, weight_threshold=0.05)
t0 = time.time()
walk_out = trace(
    jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
    jnp.asarray(rays), jnp.full((rays.shape[0],), start, jnp.int32),
    config=tcfg,
)
walk_img = np.asarray(walk_out.rgba).reshape(h2, w2, 4)
out["walk_lowres_s"] = round(time.time() - t0, 1)
mse = float(np.mean((walk_img - img_r) ** 2))
out["raster_vs_walk_psnr"] = round(-10 * np.log10(max(mse, 1e-12)), 2)
out["walk_mean_steps"] = float(np.asarray(
    walk_out.num_intersections).mean())
print(f"parity PSNR={out['raster_vs_walk_psnr']} dB, walk mean steps "
      f"{out['walk_mean_steps']:.1f}", flush=True)

# ---- train-step core: fwd+bwd at 1M rays --------------------------------
# NB: the walk engine's backward at 2M points does NOT fit the 16 GB HBM
# at 1M rays (measured RESOURCE_EXHAUSTED) — measure at 256k and report
# the 1M-scaled per-ray cost. The raster train engine is the 2M-scale
# path (tools/profile_train_step.py: 6.2 s/step at 800x800).
R_RAYS = 1 << 18
rng = np.random.default_rng(1)
origins = rng.uniform(-1, 1, (R_RAYS, 3)).astype(np.float32)
dirs = rng.standard_normal((R_RAYS, 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
train_rays = jnp.asarray(np.concatenate([origins, dirs], 1))
starts = jnp.zeros((R_RAYS,), jnp.int32)
targets = jnp.zeros((R_RAYS, 3), jnp.float32)
tcfg_t = TraceConfig(sh_degree=SH, num_quantiles=0, weight_threshold=0.001)

def loss_fn(p, a, nbr, rays_in, starts_in):
    o = trace(p, a, nbr, rays_in, starts_in, config=tcfg_t)
    return jnp.mean((o.rgba[:, :3] - targets) ** 2)

grad_fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
p_d, a_d = jnp.asarray(pts), jnp.asarray(attrs)
nbr_d = jnp.asarray(table)
g = grad_fn(p_d, a_d, nbr_d, train_rays, starts)
_ = jax.device_get(jax.tree.leaves(g)[0].ravel()[:2])
t0 = time.time()
for _ in range(3):
    g = grad_fn(p_d, a_d, nbr_d, train_rays, starts)
    _ = jax.device_get(jax.tree.leaves(g)[0].ravel()[:2])
dt3 = (time.time() - t0) / 3
out["walk_fwdbwd_rays"] = int(R_RAYS)
out["train_fwdbwd_s_per_iter"] = round(dt3 * ((1 << 20) / R_RAYS), 2)
print(f"walk fwd+bwd @{R_RAYS} rays: {dt3:.2f}s "
      f"(~{out['train_fwdbwd_s_per_iter']}s at 1M rays)", flush=True)

# ---- densify + incremental retriangulation ------------------------------
from radfoam_tpu.models.scene import RadFoamScene

t0 = time.time()
moved = pts + rng.standard_normal(pts.shape).astype(np.float32) * 1e-6
tri.rebuild(moved, incremental=True)
out["inc_retri_s"] = round(time.time() - t0, 1)
stats = getattr(tri._backend, "last_update_stats", None)
out["inc_retri_stats"] = stats
print(f"incremental retri (1e-6 motion): {out['inc_retri_s']}s "
      f"stats={stats}", flush=True)

# steady-state (warm-margin) update — the cost training actually pays:
# the first incremental scan certifies per-tet margins; every scan after
# that (triangulation cadence <= 100 optimizer steps) re-checks only
# tets whose vertices moved past their cached margin
t0 = time.time()
moved2 = moved + rng.standard_normal(pts.shape).astype(np.float32) * 1e-6
tri.rebuild(moved2, incremental=True)
out["inc_retri_warm_s"] = round(time.time() - t0, 1)
out["inc_retri_warm_stats"] = getattr(
    tri._backend, "last_update_stats", None
)
print(f"incremental retri (warm margins): {out['inc_retri_warm_s']}s "
      f"stats={out['inc_retri_warm_stats']}", flush=True)

out["total_s"] = round(time.time() - t_all, 1)
print("SCALE_PROOF " + json.dumps(out), flush=True)
