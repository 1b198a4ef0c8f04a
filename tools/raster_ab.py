"""Raster-config quality A/B at the 2M bench scene (chip).

Renders the same 1080p frame under a list of RasterConfig variants and
prints the PSNR of each against the exact baseline (reorder_window=8,
uncapped lists). Decides whether fast-path defaults (reorder_window=0,
tile_list_cap) are visually lossless before they ship as benchmark
defaults. Reference analog: the fp16-vs-fp32 attribute choice in
reference benchmark.py:35-54 — the reference also ships the fast
variant only after eyeballing parity.

Usage: python tools/raster_ab.py [--width 1920 --height 1080]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    W, H = args.width, args.height

    import bench
    from radfoam_tpu.ops import raster as R
    from radfoam_tpu.ops.camera import look_at
    from radfoam_tpu.ops.cellbound import clamp_bounds

    SH = 3
    pts, attrs, table, bb_min, bb_max = bench.build_scene()
    bb_min, bb_max, _ = clamp_bounds(pts, bb_min, bb_max)
    N, K = table.shape[0], int(table.shape[1])
    A = 1 + 3 * (SH + 1) ** 2

    rtable = jax.jit(
        lambda p, a, t, b0, b1: R.build_scene_table(
            p, a, t, b0, b1, sh_degree=SH, dtype=jnp.bfloat16)
    )(jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
      jnp.asarray(bb_min), jnp.asarray(bb_max))
    _ = jax.device_get(rtable[:2, :2])
    bbmin_d, bbmax_d = jnp.asarray(bb_min), jnp.asarray(bb_max)
    dens_d = jnp.asarray(attrs[:, -1].astype(np.float32))

    eye = np.array([4.5, 0.0, 1.5])
    cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=1.0, width=W, height=H)
    pos, fwd, rgt, up = [jnp.asarray(np.asarray(x, np.float32)) for x in
                         (cam.position, cam.forward, cam.right, cam.up)]

    variants = [
        ("rw8_exact", dict(reorder_window=8, tile_list_cap=0)),
        ("rw0", dict(reorder_window=0, tile_list_cap=0)),
        ("rw0_lcap192", dict(reorder_window=0, tile_list_cap=192)),
        ("rw0_lcap256", dict(reorder_window=0, tile_list_cap=256)),
        ("rw8_lcap256", dict(reorder_window=8, tile_list_cap=256)),
        ("t32_rw0_lcap384",
         dict(reorder_window=0, tile_list_cap=384, tile=32,
              max_pairs=1500000)),
        ("t32_rw8_lcap384",
         dict(reorder_window=8, tile_list_cap=384, tile=32,
              max_pairs=1500000)),
    ]
    base_img = None
    for name, kw in variants:
        kw = {"tile": 16, "max_pairs": 1 << 22, **kw}
        cfg = R.RasterConfig(
            sh_degree=SH, weight_threshold=0.05,
            alpha_cull=1e-3, table_k=K, entry_chunk=16, **kw,
        )
        img, n_pairs, _ = R.render_frame_staged(
            rtable, bbmin_d, bbmax_d, dens_d, pos, fwd, rgt, up,
            jnp.float32(1.0), width=W, height=H, cfg=cfg,
        )
        img_np = np.asarray(jax.device_get(img), np.float32)
        if img_np.dtype != np.float32 or img_np.max() > 2.0:
            img_np = img_np.astype(np.float32) / 255.0
        if base_img is None:
            base_img = img_np
            print(f"{name}: baseline  n_pairs={int(n_pairs)}", flush=True)
        else:
            p = psnr(img_np[..., :3], base_img[..., :3])
            md = float(np.max(np.abs(img_np[..., :3] - base_img[..., :3])))
            print(f"{name}: psnr_vs_exact={p:.2f} dB  maxdiff={md:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
