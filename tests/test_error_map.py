"""Raster-engine densification error map (ops/raster_grad.render_error_map)
vs two independent oracles:

* position-gradient norms vs jax.grad through render_train with the same
  L1 white-background loss (the analytic cotangent path must equal
  autodiff through the custom-vjp);
* per-point contribution vs the walk tracer's accumulated weight channel
  (reference pipeline.cu:80-82) at a near-zero weight threshold, where
  both engines composite essentially every intersection.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radfoam_tpu.ops import raster as R
from radfoam_tpu.ops import raster_grad as RG
from radfoam_tpu.ops.camera import cast_rays
from radfoam_tpu.ops.trace import TraceConfig, trace

from tests.test_raster import build_scene, cam_setup

pytestmark = pytest.mark.slow


def _args(pts, attrs, table, bounds):
    return (jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]))


def test_error_map_matches_autodiff_and_walk():
    pts, attrs, table, bounds = build_scene(
        n_points=700, sh_degree=1, seed=3, saturate=True
    )
    W = H = 24  # non-multiple of tile: exercises the edge-lane mask
    cam, start = cam_setup(pts, W, H)
    K = int(table.shape[1])
    wt = 1e-6
    cfg = R.RasterConfig(
        sh_degree=1, weight_threshold=wt, tile=16, max_pairs=1 << 16,
        interpret=True, table_k=K, grad_planes=K, reorder_window=0,
        emit_contrib=True,
    )
    rng = np.random.default_rng(11)
    gt = rng.uniform(0.0, 1.0, (H, W, 3)).astype(np.float32)
    args = _args(pts, attrs, table, bounds)
    cam_j = tuple(
        jnp.asarray(np.asarray(v, np.float32))
        for v in (cam.position, cam.forward, cam.right, cam.up)
    )
    intrin = R.fov_intrin(jnp.float32(cam.fov), width=W, height=H)

    err, contrib = RG.render_error_map(
        *args, *cam_j, intrin, jnp.asarray(gt), width=W, height=H,
        cfg=cfg, white_background=True,
    )

    # --- oracle 1: autodiff through render_train, same loss
    ntx, nty = R._grid_shape(W, H, cfg.tile)
    P = cfg.tile * cfg.tile
    qlv = jnp.full((ntx * nty, 1, P), 2.0, jnp.float32)  # never crossed

    def loss(p):
        img, _ = RG.render_train(
            p, *args[1:], *cam_j, intrin, qlv, width=W, height=H,
            cfg=cfg,
        )
        rgb = img[..., :3] + (1.0 - img[..., 3:4])
        return jnp.sum(jnp.abs(rgb - jnp.asarray(gt)).mean(axis=-1))

    gp = jax.grad(loss)(args[0])
    err_ref = np.linalg.norm(np.asarray(gp), axis=-1)
    scale = err_ref.max() + 1e-12
    np.testing.assert_allclose(
        np.asarray(err) / scale, err_ref / scale, atol=1e-4
    )
    assert err_ref.max() > 0

    # --- oracle 2: walk contribution channel on the same pixel rays
    tcfg = TraceConfig(sh_degree=1, num_quantiles=0, weight_threshold=wt,
                       return_contribution=True)
    rays = np.asarray(cast_rays(cam)).reshape(-1, 6)
    out = trace(
        args[0], args[1], args[2], jnp.asarray(rays),
        jnp.full((rays.shape[0],), start, jnp.int32), config=tcfg,
    )
    c_walk = np.asarray(out.contribution)
    c_rast = np.asarray(contrib)
    s = c_walk.max() + 1e-12
    d = np.abs(c_rast - c_walk) / s
    # bulk must agree tightly; at wt=1e-6 a handful of rays survive all
    # the way to hull cells, whose unbounded wedges the raster clips by
    # construction (ops/raster.py module docstring) — bound that tail
    assert (d > 2e-3).mean() < 0.01, (d.max(), (d > 2e-3).sum())
    assert d.max() < 0.2, d.max()
    assert c_walk.max() > 0
