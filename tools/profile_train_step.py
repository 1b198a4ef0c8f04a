"""Raster-vs-walk train-step timing at the 2M bench scene (TPU).

Times one full raster training iteration (differentiable render fwd+bwd +
Adam) at a ~1M-pixel image against the walk step's fwd+bwd at 1M rays
(the reference protocol's rays/iter). Uses the bench scene's points +
triangulation, synthetic GT, capacity = N (no padding waste).

Usage: python tools/profile_train_step.py [--width 1296] [--height 728]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--height", type=int, default=728)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-walk", action="store_true")
    args = ap.parse_args()
    W, H = args.width, args.height

    import bench
    from radfoam_tpu.ops import raster as R
    from radfoam_tpu.ops.camera import look_at
    from radfoam_tpu.ops.cellbound import clamp_bounds
    from radfoam_tpu.train.raster_step import (
        RasterStepConfig, make_raster_train_step,
    )

    SH = 3
    pts, attrs, table, bb_min, bb_max = bench.build_scene()
    bb_min, bb_max, _ = clamp_bounds(pts, bb_min, bb_max)
    N, K = pts.shape[0], int(table.shape[1])
    D = (SH + 1) ** 2
    print(f"N={N} K={K} img={W}x{H}", flush=True)

    # params pytree from the bench scene's activated attrs (densities are
    # already activated — invert softplus approximately; exactness doesn't
    # matter for timing)
    rng = np.random.default_rng(0)
    params = {
        "primal_points": jnp.asarray(pts),
        "density": jnp.asarray(
            np.log(np.expm1(np.maximum(attrs[:, -1:], 1e-4) * 10.0)) / 10.0
        ),
        "att_dc": jnp.asarray(attrs[:, :3]),
        "att_sh": jnp.asarray(attrs[:, 3 : 3 * D]),
    }
    import optax

    opt_state = optax.scale_by_adam(eps=1e-15).init(params)
    nbr_d = jnp.asarray(table)
    bbmin_d, bbmax_d = jnp.asarray(bb_min), jnp.asarray(bb_max)

    eye = np.array([4.5, 0.0, 1.5])
    cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=1.0, width=W, height=H)
    basis = jnp.asarray(
        np.stack([cam.position, cam.forward, cam.right, cam.up]).astype(
            np.float32
        )
    )
    intrin = jnp.asarray(
        np.array(
            [float(v) for v in R.fov_intrin(1.0, width=W, height=H)],
            np.float32,
        )
    )
    gt_rgb = jnp.asarray(rng.random((H, W, 3), np.float32))
    gt_alpha = jnp.ones((H, W, 1), jnp.float32)
    lrs = {k: jnp.float32(1e-4) for k in params}

    rcfg = R.RasterConfig(
        sh_degree=SH, weight_threshold=1e-3, tile=16,
        max_pairs=1 << 22, alpha_cull=0.0, table_k=K, reorder_window=0,
    )
    scfg = RasterStepConfig(rcfg, 1.0, jnp.float32, True, W, H)
    step = make_raster_train_step(scfg)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params, opt_state, m = step(params, opt_state, nbr_d, bbmin_d,
                                bbmax_d, basis, intrin, gt_rgb, gt_alpha,
                                lrs, jnp.float32(1e-4), key)
    print(f"compile+first step: {time.time()-t0:.1f}s "
          f"n_pairs={int(m['n_pairs'])}", flush=True)

    _ = jax.device_get(params["density"][:2])
    t0 = time.perf_counter()
    for r in range(args.reps):
        key = jax.random.fold_in(key, r)
        params, opt_state, m = step(params, opt_state, nbr_d, bbmin_d,
                                    bbmax_d, basis, intrin, gt_rgb,
                                    gt_alpha, lrs, jnp.float32(1e-4), key)
    _ = jax.device_get(params["density"][:2])
    dt = (time.perf_counter() - t0) / args.reps
    print(f"raster train step: {dt*1000:.0f} ms/iter "
          f"({W*H/1e6:.2f}M px)", flush=True)
    print(f"loss={float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
