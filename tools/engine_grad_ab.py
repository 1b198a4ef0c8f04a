"""Walk-vs-raster TRAINING-GRADIENT parity A/B (round 5).

The raster engine converges measurably below the exact walk engine on
identical schedules (DEVNOTES "engine convergence A/B": probe walk
15.02 dB vs raster 10.45). Round-5 eliminations so far: grad_planes
truncation (4e-6 dB), sort-key inversions (midkey probe), batch mixing
(mv arm adverse), and the raster FORWARD itself (47 dB parity vs walk
on the probe's own checkpoint). This tool measures the remaining
suspect directly: does the raster step's gradient match the exact walk
gradient of the SAME white-bg L1 loss at the SAME params?

Arms:
  A (exact geometry): perturb attributes only — the triangulation and
    the cell bounds stay exact. Isolates the backward kernel.
  B (stale bounds): perturb point positions by a training-scale delta
    but keep the adjacency table AND the raster bounds computed at the
    ORIGINAL positions — exactly the state the raster step sees between
    triangulation installs (models/scene.py raster_bounds caches until
    the next install). The walk arm uses the same stale adjacency (the
    reference trains on stale adjacency too, train.py tri cadence) but
    has no bounds to go stale. Compares each engine's gradient to its
    own fresh-geometry counterpart and to each other.

Usage: python tools/engine_grad_ab.py [--points 32768] [--wh 256]
Results recorded in DEVNOTES ("engine gradient parity").
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stats(x, y):
    x = np.asarray(x, np.float64).ravel()
    y = np.asarray(y, np.float64).ravel()
    cos = float(np.sum(x * y)
                / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-30))
    rel = float(np.linalg.norm(x - y) / (np.linalg.norm(y) + 1e-30))
    return cos, rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--wh", type=int, default=256)
    ap.add_argument("--sh", type=int, default=2)
    ap.add_argument("--move", type=float, default=0.01,
                    help="arm-B point perturbation as a fraction of the "
                         "scene radius (training-scale inter-install "
                         "motion)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from radfoam_tpu.data.synthetic import (
        make_ground_truth_scene, render_views, SyntheticDataHandler,
    )
    from radfoam_tpu.ops.cellbound import cell_bounds
    from radfoam_tpu.ops.raster import RasterConfig, _grid_shape
    from radfoam_tpu.ops.raster_grad import render_train
    from radfoam_tpu.ops.trace import TraceConfig, trace

    wh, sh = args.wh, args.sh
    pts, attrs, table, tri = make_ground_truth_scene(
        n_points=args.points, sh_degree=sh
    )
    rays, rgbs, alphas, cams = render_views(
        pts, attrs, table, sh, n_views=1, wh=(wh, wh), return_cams=True
    )
    handler = SyntheticDataHandler(rays, rgbs, alphas, cams=cams)
    basis_np, intrin_np = handler.raster_camera(0)
    K = int(table.shape[1])
    nbr = jnp.asarray(table)
    bb_min0, bb_max0, _ = cell_bounds(pts, tri.tets())
    gt = jnp.asarray(rgbs[0])
    gt_flat = gt.reshape(-1, 3)
    eye = np.asarray(basis_np[0], np.float32)
    flat_rays = jnp.asarray(rays[0].reshape(-1, 6))
    start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
    starts = jnp.full((flat_rays.shape[0],), start, jnp.int32)

    rcfg = RasterConfig(
        sh_degree=sh, weight_threshold=1e-3, tile=16,
        max_pairs=1 << 22, alpha_cull=0.0, table_k=K,
        reorder_window=0, grad_planes=K,  # exact arm: every plane
    )
    tcfg = TraceConfig(sh_degree=sh, num_quantiles=0,
                       weight_threshold=1e-3)
    ntx, nty = _grid_shape(wh, wh, rcfg.tile)
    qlv = -jnp.sort(
        -jax.random.uniform(jax.random.PRNGKey(0),
                            (ntx * nty, 2, rcfg.tile * rcfg.tile),
                            minval=1e-4, maxval=1.0), axis=1)

    def raster_loss(p, a, bb_min, bb_max):
        img, n_pairs = render_train(
            p, a, nbr, bb_min, bb_max,
            jnp.asarray(basis_np[0]), jnp.asarray(basis_np[1]),
            jnp.asarray(basis_np[2]), jnp.asarray(basis_np[3]),
            jnp.asarray(intrin_np), qlv, width=wh, height=wh, cfg=rcfg,
        )
        rgb = img[..., :3] + (1.0 - img[..., 3:4])
        return jnp.mean(jnp.abs(rgb - gt)), n_pairs

    def walk_loss(p, a):
        out = trace(p, a, nbr, flat_rays, starts, config=tcfg)
        rgba = out.rgba.astype(jnp.float32)
        rgb = rgba[:, :3] + (1.0 - rgba[:, 3:])
        return jnp.mean(jnp.abs(rgb - gt_flat))

    rgrad = jax.jit(jax.grad(lambda p, a, lo, hi: raster_loss(p, a, lo, hi)[0],
                             argnums=(0, 1)))
    wgrad = jax.jit(jax.grad(walk_loss, argnums=(0, 1)))

    rng = np.random.default_rng(7)

    # ---- Arm A: perturb attributes only (exact geometry) ----
    a_pert = attrs.copy()
    a_pert[:, :-1] += rng.standard_normal(a_pert[:, :-1].shape).astype(
        np.float32) * 0.15
    a_pert[:, -1] *= np.exp(
        rng.standard_normal(a_pert.shape[0]).astype(np.float32) * 0.4)
    p0 = jnp.asarray(pts)
    aA = jnp.asarray(a_pert)
    gpR, gaR = rgrad(p0, aA, jnp.asarray(bb_min0), jnp.asarray(bb_max0))
    gpW, gaW = wgrad(p0, aA)
    cosA_a, relA_a = stats(gaR, gaW)
    cosA_p, relA_p = stats(gpR, gpW)
    # density column separately (drives densify + the probe's dynamics)
    cosA_d, relA_d = stats(np.asarray(gaR)[:, -1], np.asarray(gaW)[:, -1])
    print(f"ARM_A exact-geometry n={args.points} wh={wh} "
          f"d_attrs cos={cosA_a:.5f} rel={relA_a:.4f} | "
          f"d_density cos={cosA_d:.5f} rel={relA_d:.4f} | "
          f"d_points cos={cosA_p:.5f} rel={relA_p:.4f}", flush=True)

    # ---- Arm B: perturb positions, bounds stale ----
    radius = float(np.linalg.norm(pts, axis=1).max())
    move = rng.standard_normal(pts.shape).astype(np.float32) * (
        args.move * radius / np.sqrt(3))
    pB = jnp.asarray(pts + move)
    # stale bounds = bounds of the ORIGINAL positions (what the raster
    # step actually bins with between installs)
    gpR_s, gaR_s = rgrad(pB, aA, jnp.asarray(bb_min0), jnp.asarray(bb_max0))
    # fresh bounds at the moved positions (same stale ADJACENCY — only
    # the bins move; mirrors an hypothetical per-step bounds refresh)
    from radfoam_tpu.ops.cellbound import clamp_bounds
    bbf_min, bbf_max, _ = cell_bounds(np.asarray(pB), tri.tets())
    gpR_f, gaR_f = rgrad(pB, aA, jnp.asarray(bbf_min), jnp.asarray(bbf_max))
    gpW_b, gaW_b = wgrad(pB, aA)

    for tag, gp_x, ga_x in (("stale-bounds", gpR_s, gaR_s),
                            ("fresh-bounds", gpR_f, gaR_f)):
        ca, ra = stats(ga_x, gaW_b)
        cd, rd = stats(np.asarray(ga_x)[:, -1], np.asarray(gaW_b)[:, -1])
        cp, rp = stats(gp_x, gpW_b)
        print(f"ARM_B {tag} move={args.move} "
              f"d_attrs cos={ca:.5f} rel={ra:.4f} | "
              f"d_density cos={cd:.5f} rel={rd:.4f} | "
              f"d_points cos={cp:.5f} rel={rp:.4f}", flush=True)


if __name__ == "__main__":
    main()
