"""Walk-oracle certification of the raster engine AT SCALE (VERDICT r4
task 4): render the 2M-point bench scene with the exact walk tracer
(reference semantics, src/tracing/pipeline.cu:133-331 — the reference
runs this path at full scale) and with the product rasterizer under the
shipped bench config, and report walk-vs-raster PSNR + per-engine
timings.

Forward-only, so the walk fits HBM by ray chunking (TraceConfig
.chunk_size); at 2M points a 1080p frame is minutes, not hours — this is
the slow-but-finite oracle pass, not a product path.

Usage: python tools/walk_vs_raster_2m.py [--poses 2] [--width 1920]
       [--height 1080] [--chunk 17]  # chunk as log2(rays per chunk)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=2)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--chunk", type=int, default=17,
                    help="log2 rays per walk chunk (HBM bound)")
    ap.add_argument("--wt", type=float, default=0.05,
                    help="weight threshold (bench protocol: 0.05)")
    args = ap.parse_args()
    W, H = args.width, args.height

    import jax
    import jax.numpy as jnp

    import bench
    from radfoam_tpu.ops import raster as R
    from radfoam_tpu.ops.camera import look_at, cast_rays
    from radfoam_tpu.ops.cellbound import clamp_bounds
    from radfoam_tpu.ops.trace import TraceConfig, trace
    from radfoam_tpu.utils.math import psnr

    SH = 3
    pts, attrs, table, bb_min, bb_max = bench.build_scene()
    bb_min, bb_max, _ = clamp_bounds(pts, bb_min, bb_max)
    N, K = table.shape[0], int(table.shape[1])
    print(f"N={N} K={K}", flush=True)

    # product raster path: the exact shipped bench config (bench.py)
    cfg = R.RasterConfig(
        sh_degree=SH, weight_threshold=args.wt, tile=32,
        max_pairs=1500000, alpha_cull=1e-3, table_k=K,
        tile_list_cap=384, reorder_window=0,
    )
    bbmin_d, bbmax_d = jnp.asarray(bb_min), jnp.asarray(bb_max)
    dens_d = jnp.asarray(attrs[:, -1].astype(np.float32))
    rtable = jax.jit(
        lambda p, a, t, b0, b1: R.build_scene_table(
            p, a, t, b0, b1, sh_degree=SH, dtype=jnp.bfloat16)
    )(jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
      bbmin_d, bbmax_d)
    _ = jax.device_get(rtable[:2, :2])

    # walk path: full-precision trace over the SAME padded adjacency
    tcfg = TraceConfig(sh_degree=SH, weight_threshold=args.wt,
                       chunk_size=1 << args.chunk)
    pts_d = jnp.asarray(pts)
    attrs_d = jnp.asarray(attrs)
    tab_d = jnp.asarray(table)

    results = []
    for v in range(args.poses):
        ang = 2 * np.pi * v / max(args.poses, 1)
        eye = np.array([4.5 * np.cos(ang), 4.5 * np.sin(ang), 1.5])
        cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=1.0,
                      width=W, height=H)

        # raster render
        pos, fwd, rgt, up = (jnp.asarray(np.asarray(x, np.float32)) for x
                             in (cam.position, cam.forward, cam.right,
                                 cam.up))
        t0 = time.perf_counter()
        img_r, n_pairs, _ = R.render_frame_staged(
            rtable, bbmin_d, bbmax_d, dens_d, pos, fwd, rgt, up,
            jnp.float32(1.0), width=W, height=H, cfg=cfg)
        img_r = np.asarray(jax.device_get(img_r))
        t_r = time.perf_counter() - t0
        assert int(n_pairs) <= cfg.max_pairs, "pair cap clipped"

        # walk render: same pixel rays — fov_intrin documents the raster
        # pixel camera is cast_rays' pinhole up to direction scale
        rays = np.asarray(cast_rays(cam)).reshape(-1, 6)
        start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
        start_v = jnp.full((rays.shape[0],), start, jnp.int32)
        t0 = time.perf_counter()
        out = trace(pts_d, attrs_d, tab_d, jnp.asarray(rays), start_v,
                    config=tcfg)
        rgba_w = np.asarray(jax.device_get(out.rgba)).reshape(H, W, 4)
        t_w = time.perf_counter() - t0

        # white-background compose (bench/benchmark protocol)
        rgb_r = np.clip(img_r[..., :3] + (1.0 - img_r[..., 3:4]), 0, 1)
        rgb_w = np.clip(rgba_w[..., :3] + (1.0 - rgba_w[..., 3:4]), 0, 1)
        p = float(psnr(rgb_r, rgb_w))
        results.append((p, t_w, t_r))
        print(f"pose {v}: walk {t_w:.1f}s raster {t_r*1000:.0f}ms "
              f"PSNR(raster vs walk) {p:.2f} dB", flush=True)

    ps = [r[0] for r in results]
    print(f"MEAN walk-vs-raster PSNR at {N} pts, {W}x{H}: "
          f"{np.mean(ps):.2f} dB (min {np.min(ps):.2f})", flush=True)


if __name__ == "__main__":
    main()
