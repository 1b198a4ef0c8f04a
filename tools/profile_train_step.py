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

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--height", type=int, default=728)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cap", type=int, default=2 << 20)
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
            np.where(
                attrs[:, -1:] > 3.0,
                attrs[:, -1:],  # softplus ~ identity for large inputs
                np.log(np.expm1(np.maximum(attrs[:, -1:], 1e-4) * 10.0))
                / 10.0,
            )
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
        max_pairs=args.cap, alpha_cull=0.0, table_k=K, reorder_window=0,
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


if __name__ == "__main__" and (len(sys.argv) < 2
                              or sys.argv[1] != "iso"):
    main()
    sys.exit(0)


def isolate():
    """--mode fwd|comp: isolate render_train forward vs composite grad."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fwd", choices=["fwd", "comp"])
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--cap", type=int, default=1703936)
    ap.add_argument("--reps", type=int, default=3)
    args, _ = ap.parse_known_args(sys.argv[2:])
    W, H = args.width, args.height

    import bench
    from radfoam_tpu.ops import raster as R
    from radfoam_tpu.ops import raster_grad as RG
    from radfoam_tpu.ops.camera import look_at
    from radfoam_tpu.ops.cellbound import clamp_bounds

    SH = 3
    pts, attrs, table, bb_min, bb_max = bench.build_scene()
    bb_min, bb_max, _ = clamp_bounds(pts, bb_min, bb_max)
    N, K = pts.shape[0], int(table.shape[1])
    A = attrs.shape[1]
    Q = 2
    cfg = R.RasterConfig(
        sh_degree=SH, weight_threshold=1e-3, tile=16,
        max_pairs=args.cap, alpha_cull=0.0, table_k=K, reorder_window=0,
    )
    ntx, nty = R._grid_shape(W, H, cfg.tile)
    P = cfg.tile * cfg.tile
    eye = np.array([4.5, 0.0, 1.5])
    cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=1.0, width=W, height=H)
    pos, fwd, rgt, up = [jnp.asarray(np.asarray(x, np.float32)) for x in
                         (cam.position, cam.forward, cam.right, cam.up)]
    intrin = tuple(
        jnp.float32(v) for v in R.fov_intrin(1.0, width=W, height=H)
    )
    rng = np.random.default_rng(0)
    qlv = jnp.asarray(-np.sort(
        -rng.uniform(0.02, 0.98, (ntx * nty, Q, P)), axis=1
    ).astype(np.float32))
    pts_d = jnp.asarray(pts)
    attrs_d = jnp.asarray(attrs)
    nbr_d = jnp.asarray(table)
    b0, b1 = jnp.asarray(bb_min), jnp.asarray(bb_max)

    if args.mode == "fwd":
        f = jax.jit(lambda p, a, nb, c0, c1, q: RG.render_train(
            p, a, nb, c0, c1, pos, fwd, rgt, up, intrin, q,
            width=W, height=H, cfg=cfg)[0])
        f = partial(f, nb=nbr_d, c0=b0, c1=b1, q=qlv)
        t0 = time.time()
        out = f(pts_d, attrs_d)
        _ = jax.device_get(out[:2, :2])
        print(f"fwd compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(pts_d, attrs_d)
            _ = jax.device_get(out[:2, :2])
        print(f"render_train fwd: "
              f"{(time.perf_counter()-t0)/args.reps*1000:.0f} ms",
              flush=True)
    else:
        # precompute rows once, grad through the composite only
        tbl = jax.jit(lambda p, a, nb, c0, c1: R.build_scene_table(
            p, a, nb, c0, c1, sh_degree=SH))(pts_d, attrs_d, nbr_d, b0,
                                             b1)
        _ = jax.device_get(tbl[:2, :2])
        cell_s, _k, starts, n_pairs = jax.jit(
            lambda c0, c1, dd: R.bin_pairs(c0, c1, dd, pos, fwd, rgt,
                                           up, intrin, width=W, height=H,
                                           cfg=cfg))(b0, b1,
                                                     attrs_d[:, -1])
        cell_p, nstarts, lens = jax.jit(
            lambda cs, st: R.relayout_pairs(cs, st, width=W, height=H,
                                            cfg=cfg))(cell_s, starts)
        print(f"n_pairs={int(n_pairs)} cap={args.cap}", flush=True)
        camv = jnp.concatenate(
            [pos, fwd, rgt, up]
            + [jnp.reshape(v, (1,)) for v in intrin])
        core = RG._make_render_core(W, H, cfg, K, A, Q, N)

        def loss(p, a, nb, c0, c1, cp, ns, ls, cv, q):
            tiles = core(p, a, nb, c0, c1, cp, ns, ls, cv, q)
            return jnp.sum(tiles[:, :4] * 1e-3)

        g0 = jax.jit(jax.grad(loss, argnums=(0, 1)))
        g = lambda: g0(pts_d, attrs_d, nbr_d, b0, b1, cell_p, nstarts,
                       lens, camv, qlv)
        t0 = time.time()
        out = g()
        _ = jax.device_get(out[0][:2, :2])
        print(f"core grad compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = None
            out = g()
            _ = jax.device_get(out[0][:2, :2])
        print(f"render-core fwd+bwd: "
              f"{(time.perf_counter()-t0)/args.reps*1000:.0f} ms",
              flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "iso":
    isolate()
    sys.exit(0)
