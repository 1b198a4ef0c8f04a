"""Per-tile camera-frame direction grids for the raster engines.

The composite kernels' default camera is a 4-scalar affine intrinsic
(raster.fov_intrin / dataset_intrin) evaluated per pixel in-kernel. That
expresses centered and off-center pinholes exactly, but not lens
distortion (reference COLMAP cameras, data_loader/colmap.py:10-20) or the
fisheye model (reference src/tracing/camera.h:12-33). This module supplies
the exact path: a per-tile grid of CAMERA-FRAME unit directions that the
kernels rotate into world space with the per-frame camera basis — one
(n_tiles, 8, P) array per camera intrinsics + resolution, shared by every
view of that camera (directions in the camera frame don't depend on the
pose), so real-data training pays the HBM cost once, not per frame.

Binning still runs on the affine model; ``fit_affine_intrin`` returns the
least-squares affine approximation together with a conservative pixel
margin that ``raster.bin_pairs`` adds to every cell's screen rect so no
(tile, cell) pair visible under the exact camera is missed.
"""

import numpy as np


def make_dir_grid(dirs_cam, width, height, tile):
    """Tile a (H, W, 3) camera-frame direction field for the kernels.

    Returns (n_tiles, 8, tile*tile) float32: rows 0..2 are the x/y/z
    direction components over the tile's pixels (row-major within the
    tile, matching raster._pixel_dir_rows' iota order), rows 3..7 pad the
    sublane axis to the f32 VMEM tiling. Pixels outside the image (the
    partial boundary tiles) get zero directions, which contribute nothing
    (no plane has denom != 0, so every interval is empty) — same masking
    the walk applies to |dir| < 0.1 rays (reference pipeline.cu:370-373).
    """
    dirs_cam = np.asarray(dirs_cam, np.float32).reshape(height, width, 3)
    ntx = -(-width // tile)
    nty = -(-height // tile)
    padded = np.zeros((nty * tile, ntx * tile, 3), np.float32)
    padded[:height, :width] = dirs_cam
    g = padded.reshape(nty, tile, ntx, tile, 3)
    g = g.transpose(0, 2, 1, 3, 4).reshape(nty * ntx, tile * tile, 3)
    out = np.zeros((nty * ntx, 8, tile * tile), np.float32)
    out[:, :3] = g.transpose(0, 2, 1)
    return out


def fit_affine_intrin(dirs_cam, width, height):
    """Least-squares affine intrinsics + conservative binning margin.

    Fits the kernels' affine camera dir ~ (ax x + bx, ay y + by, 1) to an
    exact (H, W, 3) camera-frame direction field and returns
    ``(intrin, pad_px)`` where intrin = (ax, bx, ay, by) and pad_px bounds
    the screen-space error: for every pixel, the exact direction's
    projection through the affine model lands within pad_px pixels of the
    pixel itself. raster.bin_pairs expands each cell's conservative rect
    by pad_px, so binning under the affine model remains a superset of
    the exact camera's visibility. Undistortable points (z <= 0, e.g.
    fisheye edges past 90 deg) force pad_px to the full image diagonal —
    correct but slow; use the fisheye binner for such cameras.
    """
    dirs_cam = np.asarray(dirs_cam, np.float64).reshape(height, width, 3)
    z = dirs_cam[..., 2]
    ok = z > 1e-6
    u = np.where(ok, dirs_cam[..., 0] / np.where(ok, z, 1.0), 0.0)
    v = np.where(ok, dirs_cam[..., 1] / np.where(ok, z, 1.0), 0.0)

    x = np.arange(width, dtype=np.float64)[None, :] + 0.0
    y = np.arange(height, dtype=np.float64)[:, None] + 0.0
    xb = np.broadcast_to(x, u.shape)[ok]
    yb = np.broadcast_to(y, v.shape)[ok]

    def fit(coord, val):
        A = np.stack([coord, np.ones_like(coord)], axis=1)
        sol, *_ = np.linalg.lstsq(A, val, rcond=None)
        return sol  # (a, b)

    ax, bx = fit(xb, u[ok])
    ay, by = fit(yb, v[ok])
    # screen-space residual: affine pixel coordinate of the exact slope
    px = (u - bx) / ax
    py = (v - by) / ay
    err_x = np.abs(px - np.broadcast_to(x, u.shape))
    err_y = np.abs(py - np.broadcast_to(y, v.shape))
    pad = float(max(err_x[ok].max(initial=0.0), err_y[ok].max(initial=0.0)))
    if not ok.all():
        pad = float(np.hypot(width, height))
    return (
        np.array([ax, bx, ay, by], np.float32),
        pad,
    )


def fisheye_dir_grid(fov, width, height, tile):
    """Camera-frame fisheye direction grid (reference camera.h:56-85).

    Equidistant model over the reference's pixel convention (x = i/width,
    u = (2x - 1) * aspect, v = 1 - 2y, phi = fov * |uv|); directions past
    phi >= pi are zeroed (masked rays). Returns the (n_tiles, 8, P) grid
    for the composite kernels; binning must use cfg.cam_model=FISHEYE.
    """
    aspect = width / height
    x = np.arange(width, dtype=np.float32) / width
    y = np.arange(height, dtype=np.float32) / height
    u = (2.0 * x - 1.0) * aspect
    v = 1.0 - 2.0 * y
    uu, vv = np.meshgrid(u, v)
    theta = np.arctan2(vv, uu)
    phi = fov * np.sqrt(uu * uu + vv * vv)
    mask = (phi < np.pi).astype(np.float32)
    phi = np.minimum(phi, np.pi - 1e-6)
    dirs = np.stack(
        [
            np.sin(phi) * np.cos(theta),
            np.sin(phi) * np.sin(theta),
            np.cos(phi),
        ],
        axis=-1,
    ) * mask[..., None]
    return make_dir_grid(dirs, width, height, tile)
