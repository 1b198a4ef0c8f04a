"""A/B-validate the grad_planes=8 training default (VERDICT r2 task 6).

The raster backward keeps only the top-S |dv| neighbor-plane gradients per
pair (ops/raster_grad.py:240-251); the reference backward touches every
face of the visited cell (reference src/tracing/pipeline.cu backward), so
S < K is an approximation whose end-to-end effect was unmeasured. Two
measurements:

1. one-shot gradient fidelity: d_points / d_attrs of an L1 image loss on a
   trained-like scene, S=8 vs S=K — relative L2 error + cosine similarity.
2. convergence: the smoke-scale training loop run to completion with S=8
   vs S=K — final eval PSNR.

Runs on CPU (JAX_PLATFORMS=cpu) or the chip. Results recorded in DEVNOTES.

Usage: python tools/grad_planes_ab.py [--points 3000] [--iters 120]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def grad_fidelity(n_points, sh, wh):
    import jax
    import jax.numpy as jnp

    from radfoam_tpu.data.synthetic import (
        make_ground_truth_scene,
        render_views,
        SyntheticDataHandler,
    )
    from radfoam_tpu.ops.cellbound import cell_bounds
    from radfoam_tpu.ops.raster import RasterConfig, _grid_shape
    from radfoam_tpu.ops.raster_grad import render_train

    pts, attrs, table, tri = make_ground_truth_scene(
        n_points=n_points, sh_degree=sh
    )
    rays, rgbs, alphas, cams = render_views(
        pts, attrs, table, sh, n_views=1, wh=(wh, wh), return_cams=True
    )
    handler = SyntheticDataHandler(rays, rgbs, alphas, cams=cams)
    basis_np, intrin_np = handler.raster_camera(0)
    K = int(table.shape[1])
    nbr = jnp.asarray(table)
    bb_min, bb_max, _hull = cell_bounds(pts, tri.tets())
    gt = jnp.asarray(rgbs[0])

    def make_loss(S):
        cfg = RasterConfig(
            sh_degree=sh, weight_threshold=1e-3, tile=16,
            max_pairs=1 << 19, alpha_cull=0.0, table_k=K,
            reorder_window=0, grad_planes=S,
        )
        ntx, nty = _grid_shape(wh, wh, cfg.tile)
        # valid descending quantile levels in (0, 1], like the real train
        # step (train/raster_step.py) — all-zero levels drive
        # log(qlv) = -inf in the backward quantile path and NaN the
        # d_attrs density column
        qlv = -jnp.sort(
            -jax.random.uniform(
                jax.random.PRNGKey(0),
                (ntx * nty, 2, cfg.tile * cfg.tile),
                minval=1e-4, maxval=1.0,
            ),
            axis=1,
        )

        def loss(p, a):
            img, _ = render_train(
                p, a, nbr, jnp.asarray(bb_min), jnp.asarray(bb_max),
                jnp.asarray(basis_np[0]), jnp.asarray(basis_np[1]),
                jnp.asarray(basis_np[2]), jnp.asarray(basis_np[3]),
                jnp.asarray(intrin_np), qlv,
                width=wh, height=wh, cfg=cfg,
            )
            rgb = img[..., :3] + (1.0 - img[..., 3:4])
            return jnp.mean(jnp.abs(rgb - gt))

        return loss

    p0, a0 = jnp.asarray(pts), jnp.asarray(attrs)
    out = {}
    for tag, S in [("S8", min(8, K)), ("SK", K)]:
        gp, ga = jax.grad(make_loss(S), argnums=(0, 1))(p0, a0)
        out[tag] = (np.asarray(gp), np.asarray(ga))

    def stats(x, y):
        cos = float(
            np.sum(x * y)
            / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-30)
        )
        rel = float(np.linalg.norm(x - y) / (np.linalg.norm(y) + 1e-30))
        return cos, rel

    pcos, prel = stats(out["S8"][0], out["SK"][0])
    # grad_planes only gates NEIGHBOR-side position gradients; attribute
    # gradients are bit-identical in both arms by construction — report
    # the max abs diff as a sanity check (must be ~0), not a fidelity
    # metric. The meaningful fidelity number is d_points.
    attr_diff = float(np.max(np.abs(out["S8"][1] - out["SK"][1])))
    print(
        f"GRAD_FIDELITY n={n_points} K={K} "
        f"d_points cos={pcos:.6f} rel_l2={prel:.4f} "
        f"d_attrs_sanity max|S8-SK|={attr_diff:.2e} (expect 0)"
    )
    return pcos, prel


def convergence(n_points, sh, wh, iters, grad_planes):
    from radfoam_tpu.data.synthetic import (
        make_ground_truth_scene,
        render_views,
        SyntheticDataHandler,
    )
    from radfoam_tpu.train.loop import train

    pts, attrs, table, _ = make_ground_truth_scene(
        n_points=n_points, sh_degree=sh
    )
    rays, rgbs, alphas, cams = render_views(
        pts, attrs, table, sh, n_views=6, wh=(wh, wh), return_cams=True
    )

    class ModelArgs:
        sh_degree = sh
        init_points = max(512, n_points // 4)
        final_points = max(1024, n_points // 2)
        activation_scale = 1.0

    class PipelineArgs:
        iterations = iters
        densify_from = iters // 4
        densify_until = iters // 2
        densify_factor = 1.2
        white_background = True
        quantile_weight = 1e-4
        experiment_name = ""
        debug = True
        viewer = False
        train_engine = "raster"

    PipelineArgs.grad_planes = grad_planes

    class OptimizerArgs:
        points_lr_init = 2e-4
        points_lr_final = 5e-6
        density_lr_init = 1e-1
        density_lr_final = 1e-2
        attributes_lr_init = 5e-3
        attributes_lr_final = 5e-4
        sh_factor = 0.1
        freeze_points = int(iters * 0.9)

    class DatasetArgs:
        dataset = "synthetic"
        data_path = ""
        scene = "blob"
        patch_based = False
        downsample = [1]
        downsample_iterations = [0]

    def handler_cls(*_a, **_k):
        # points3D seeds the scene from the GT point cloud (like the
        # raster train smoke test) — without it train() random-initializes
        # a Gaussian cloud at scale 25 against a radius-2 scene and the
        # 120-iter PSNRs are init-dominated
        return SyntheticDataHandler(rays, rgbs, alphas, points3D=pts,
                                    cams=cams)

    _, psnr, _ = train(
        None, PipelineArgs(), ModelArgs(), OptimizerArgs(), DatasetArgs(),
        data_handler_cls=handler_cls,
    )
    print(f"CONVERGENCE grad_planes={grad_planes} iters={iters} "
          f"final_psnr={psnr:.3f}")
    return psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=3000)
    ap.add_argument("--sh", type=int, default=1)
    ap.add_argument("--wh", type=int, default=64)
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--skip-convergence", action="store_true")
    args = ap.parse_args()

    grad_fidelity(args.points, args.sh, args.wh)
    if not args.skip_convergence:
        p8 = convergence(args.points, args.sh, args.wh, args.iters, 8)
        pk = convergence(args.points, args.sh, args.wh, args.iters, 0)
        print(f"AB_RESULT psnr_S8={p8:.3f} psnr_SK={pk:.3f} "
              f"delta={p8 - pk:+.3f}")


if __name__ == "__main__":
    main()
