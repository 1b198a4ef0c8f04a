"""Exact camera models in the raster engine (dir grids + fisheye).

The reference consumes COLMAP's distorted cameras via per-pixel
unprojection (data_loader/colmap.py:10-20) and renders fisheye in the
viewer/benchmark kernels (src/tracing/camera.h:12-33). The raster engine
reproduces both through ops/dirgrid: a per-tile camera-frame direction
grid replaces the in-kernel affine camera, and binning runs on a fitted
affine approximation expanded by its conservative pixel margin (or the
fisheye sector bound). Parity oracle: the walk tracer fed the same exact
rays.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radfoam_tpu.ops.camera import FISHEYE as CAM_FISHEYE
from radfoam_tpu.ops.camera import cast_rays, look_at
from radfoam_tpu.ops.dirgrid import (
    fisheye_dir_grid,
    fit_affine_intrin,
    make_dir_grid,
)
from radfoam_tpu.ops.trace import TraceConfig, trace
from radfoam_tpu.ops import raster as R

from tests.test_raster import build_scene, cam_setup, psnr, walk_image

pytestmark = pytest.mark.slow


def pinhole_cam_dirs(width, height, fov):
    """Camera-frame pinhole dirs in cast_rays' pixel convention
    (camera.h:56-85: x = i/W, u = (2x - 1) aspect, v = 1 - 2y)."""
    aspect = width / height
    x = np.arange(width, dtype=np.float64) / width
    y = np.arange(height, dtype=np.float64) / height
    u = (2.0 * x - 1.0) * aspect
    v = 1.0 - 2.0 * y
    uu, vv = np.meshgrid(u, v)
    w = 1.0 / np.tan(fov * 0.5)
    d = np.stack([uu, vv, np.full_like(uu, w)], axis=-1)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
        np.float32
    )


def render_with_grid(pts, attrs, bounds, table, cam, cfg, dir_grid,
                     intrin, pad_px):
    rtable = R.build_row_table(
        R.pack_raster_table(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table)
        ),
        jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        sh_degree=cfg.sh_degree,
    )
    img, n_pairs, forced = R.render_frame(
        rtable, jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        jnp.asarray(attrs[:, -1]),
        jnp.asarray(cam.position), jnp.asarray(cam.forward),
        jnp.asarray(cam.right), jnp.asarray(cam.up),
        jnp.float32(cam.fov), width=cam.width, height=cam.height,
        cfg=cfg,
        dir_grid=None if dir_grid is None else jnp.asarray(dir_grid),
        pad_px=jnp.float32(pad_px),
        intrin=None if intrin is None else tuple(
            jnp.float32(v) for v in intrin
        ),
    )
    assert int(n_pairs) <= cfg.max_pairs
    return np.asarray(img)


def test_dir_grid_matches_affine_pinhole():
    """A pinhole direction grid reproduces the in-kernel affine camera."""
    pts, attrs, table, bounds = build_scene(n_points=1200, saturate=True)
    W = H = 48
    cam, _ = cam_setup(pts, W, H)
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                         max_pairs=1 << 16, interpret=True,
                         table_k=int(table.shape[1]))
    img_affine = render_with_grid(
        pts, attrs, bounds, table, cam, cfg, None, None, 0.0
    )
    dirs = pinhole_cam_dirs(W, H, cam.fov)
    grid = make_dir_grid(dirs, W, H, cfg.tile)
    img_grid = render_with_grid(
        pts, attrs, bounds, table, cam, cfg, grid, None, 0.0
    )
    np.testing.assert_allclose(img_grid, img_affine, atol=1e-4)


def test_fit_affine_pinhole_is_subpixel():
    W = H = 64
    dirs = pinhole_cam_dirs(W, H, 1.1)
    intrin, pad = fit_affine_intrin(dirs, W, H)
    assert pad < 1e-3, pad
    # matches the fov convention's intrinsics
    ax, bx, ay, by = (float(v) for v in R.fov_intrin(1.1, width=W,
                                                     height=H))
    np.testing.assert_allclose(
        np.asarray(intrin), [ax, bx, ay, by], rtol=1e-4, atol=1e-6
    )


def test_distorted_camera_matches_walk():
    """Synthetic radially-distorted camera (SIMPLE_RADIAL-style): raster
    with the exact dir grid + conservative affine binning == walk on the
    same exact rays."""
    pts, attrs, table, bounds = build_scene(saturate=True)
    W = H = 48
    cam, start = cam_setup(pts, W, H)
    dirs0 = pinhole_cam_dirs(W, H, cam.fov).astype(np.float64)
    u = dirs0[..., 0] / dirs0[..., 2]
    v = dirs0[..., 1] / dirs0[..., 2]
    r2 = u * u + v * v
    k1 = 0.12
    du, dv = u * (1.0 + k1 * r2), v * (1.0 + k1 * r2)
    d = np.stack([du, dv, np.ones_like(du)], axis=-1)
    dirs_cam = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(
        np.float32
    )

    # walk on the exact distorted rays
    Rw = np.stack([cam.right, cam.up, cam.forward], axis=1)  # cam->world
    dirs_world = dirs_cam.reshape(-1, 3) @ Rw.T
    rays = np.concatenate(
        [np.broadcast_to(cam.position, dirs_world.shape), dirs_world],
        axis=-1,
    ).astype(np.float32)
    tcfg = TraceConfig(sh_degree=2, num_quantiles=0,
                       weight_threshold=0.001)
    walk = np.asarray(
        trace(
            jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
            jnp.asarray(rays),
            jnp.full((rays.shape[0],), start, jnp.int32), config=tcfg,
        ).rgba
    ).reshape(H, W, 4)

    intrin, pad = fit_affine_intrin(dirs_cam, W, H)
    assert 0.1 < pad < W, pad  # genuinely non-affine, but bounded
    grid = make_dir_grid(dirs_cam, W, H, 16)
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                         max_pairs=1 << 18, interpret=True,
                         table_k=int(table.shape[1]))
    rast = render_with_grid(
        pts, attrs, bounds, table, cam, cfg, grid, tuple(intrin), pad
    )
    assert psnr(walk, rast) > 38.0, psnr(walk, rast)


def test_fisheye_matches_walk():
    """Equidistant fisheye: raster (sector binning + fisheye dir grid)
    == walk on cast_rays' fisheye rays."""
    pts, attrs, table, bounds = build_scene(saturate=True)
    W = H = 48
    fov = 1.3
    eye = np.asarray((0.4, 0.3, 0.2), np.float32)
    cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=fov, width=W, height=H,
                  model=CAM_FISHEYE)
    start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
    walk = walk_image(pts, attrs, table, cam, start, 0.001)

    grid = fisheye_dir_grid(fov, W, H, 16)
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                         max_pairs=1 << 18, interpret=True,
                         table_k=int(table.shape[1]),
                         cam_model=R.FISHEYE)
    rast = render_with_grid(
        pts, attrs, bounds, table, cam, cfg, grid,
        (fov, 0.0, 0.0, 0.0), 0.0
    )
    assert psnr(walk, rast) > 38.0, psnr(walk, rast)


def test_train_render_with_dir_grid():
    """render_train accepts the exact-camera path and its gradients stay
    finite (the dirs input is non-differentiable)."""
    import jax

    pts, attrs, table, bounds = build_scene(n_points=900, saturate=True)
    W = H = 32
    cam, _ = cam_setup(pts, W, H)
    from radfoam_tpu.ops.raster_grad import render_train

    dirs = pinhole_cam_dirs(W, H, cam.fov)
    grid = make_dir_grid(dirs, W, H, 16)
    intrin, pad = fit_affine_intrin(dirs, W, H)
    cfg = R.RasterConfig(sh_degree=2, weight_threshold=0.001, tile=16,
                         max_pairs=1 << 14, interpret=True,
                         table_k=int(table.shape[1]), reorder_window=0)
    ntx = -(-W // 16) * (-(-H // 16))
    qlv = np.tile(
        np.array([0.7, 0.3], np.float32)[None, :, None], (ntx, 1, 256)
    )

    def loss(p):
        img, _ = render_train(
            p, jnp.asarray(attrs), jnp.asarray(table),
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
            jnp.asarray(cam.position), jnp.asarray(cam.forward),
            jnp.asarray(cam.right), jnp.asarray(cam.up),
            tuple(jnp.float32(v) for v in intrin), jnp.asarray(qlv),
            width=W, height=H, cfg=cfg, dir_grid=jnp.asarray(grid),
            pad_px=jnp.float32(pad),
        )
        return jnp.mean(img[..., :3] ** 2)

    g = jax.grad(loss)(jnp.asarray(pts))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0
