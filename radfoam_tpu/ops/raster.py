"""Tile rasterizer: the TPU-native real-time render engine.

The reference renders by walking each ray cell-to-cell through the Voronoi
adjacency graph in one CUDA megakernel (src/tracing/pipeline.cu:472-544).
Round 1 reproduced that walk as an XLA while_loop (ops/trace.py), which is
correct but hard-capped by the TPU's serially-dependent gather rate
(~90M rows/s measured => ~1 fps at 1080p). This module replaces the *walk*
with a *rasterization* of the same math, the way 3D Gaussian Splatting maps
to tile-based hardware — except the primitive here is an exact convex
Voronoi cell, so the result matches the walk's intervals, not an
approximation of them:

  1. Every Voronoi cell is conservatively bounded by a sphere
     (ops/cellbound.py: farthest incident Delaunay circumcenter).
  2. Spheres project to screen-space AABBs and expand into
     (tile, depth_key, cell) pairs — dense XLA ops.
  3. One global two-key sort orders each tile's cell list front-to-back
     (depth_key = conservative lower bound of the ray-entry parameter
     t_in, so the per-pixel interval order and the list order agree up
     to rare local inversions of overlapping bounds).
  4. ONE bulk gather packs each pair's cell row — the only irregular
     memory access in the whole frame (vs. rays x steps of them).
  5. A Pallas kernel composites each tile: the cell list streams from HBM
     through double-buffered DMA, every (pixel, cell) ray-interval
     [t_in, t_out] is computed from the cell's neighbor bisector planes
     (same math as the walk's exit-face test, trace.py:137-175 /
     reference tracing_utils.cuh:43-67), and alpha compositing runs in
     list order with whole-tile early exit once all transmittances pass
     the weight threshold.

Because Voronoi cells tile space, per-ray intervals are disjoint and the
composite in t_in order equals the walk exactly (up to fp association).
Two knobs trade exactness for speed, both off by default and validated
against golden walk renders when on:
  * ``alpha_cull``: skip cells whose maximum possible alpha
    (sigma * 2R) is below threshold — empty-space skipping.
  * hull cells use their finite Voronoi vertices as extent; contributions
    in their unbounded wedges (which the walk also terminates in) are
    dropped.
"""

from functools import lru_cache, partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AFFINE = 0  # binning camera: affine intrinsics (+ pad_px margin)
FISHEYE = 1  # binning camera: equidistant fisheye (intrin[0] = fov)


class RasterConfig(NamedTuple):
    """Static rasterizer configuration."""

    sh_degree: int = 3
    weight_threshold: float = 0.001
    tile: int = 16  # tile edge in pixels (tile*tile = lanes per program)
    # binning camera model: AFFINE projects cell AABBs through the
    # 4-scalar intrinsics; FISHEYE through the equidistant sector bound
    # (ops/dirgrid supplies the matching exact in-kernel direction grids)
    cam_model: int = AFFINE
    max_pairs: int = 1 << 22  # static (tile, cell) pair capacity
    entry_chunk: int = 16  # cells DMA'd + composited per kernel loop step
    # sorted-merge width (exact-order mode): 0 = entry_chunk. Setting
    # entry_chunk=32 with merge_chunk=16 halves the loop-iteration fixed
    # cost (DMA sync + transpose + chunk precompute run once per 32
    # entries) while the bitonic network and pending set stay at the
    # cheap 2x16-row size — two sub-merges per loop step.
    merge_chunk: int = 0
    alpha_cull: float = 0.0  # drop cells with sigma*2R below this (0 = off)
    # adjacency-table width K of the scene's build_row_table (the padded
    # row width hides it; Mosaic needs 128-aligned rows). Set per scene.
    table_k: int = 0
    # exact-order compositing: any value > 0 selects the batch
    # sorted-merge path — per chunk, new entries and the pending set
    # (capacity = entry_chunk per pixel) are bitonic-sorted by true
    # t_in and the provably-final prefix is emitted in closed form
    # (safe emission against the conservative sort key, all-vector).
    # 0 = composite in raw list order (fastest, approximate where
    # bounding spheres overlap). The jnp oracle (composite_reference)
    # still interprets this as a per-entry buffer width.
    reorder_window: int = 8
    interpret: bool = False  # run the Pallas kernel in interpreter mode
    # diagnostic: the inference kernel reports processed entries per tile
    # (chunks x CE) in the aux channel instead of forced-pop counts
    stats: bool = False
    # training only: per pair, neighbor-position gradients are emitted for
    # the grad_planes highest-|dv| planes instead of all K (the reference
    # backward also touches only selected faces, pipeline.cu atomicAdd
    # targets) — this turns the N*K scatter wall (~13 s at 2M points)
    # into a pairs*S scatter (~1 s). Set to the table's K for exactness.
    grad_planes: int = 8
    # per-tile depth-sorted list cap (0 = off): each tile keeps only its
    # ``tile_list_cap`` NEAREST binned cells, the TPU analog of the
    # reference's per-ray max_intersections=1024 (pipeline.h:15-19).
    # This makes the padded pair buffer a scene-independent
    # n_tiles * cap rows — the bulk row gather is row-RATE bound
    # (~40 M rows/s at any width, tools/gather_model.py), so shrinking
    # rows is the only stage-2 lever. With the early-exit stats showing
    # <= 192 entries ever composited per tile at wt = 0.05, a 256 cap is
    # output-identical on the bench protocol; unsaturated (background)
    # tiles may lose far-tail alpha.
    tile_list_cap: int = 0
    # densification error maps: the backward kernel additionally emits
    # each pair's maximum per-pixel compositing weight (the reference's
    # per-point "contribution", pipeline.cu:80-82) into a spare dnbr
    # column so prune/densify never needs the walk engine
    emit_contrib: bool = False


def pack_raster_table(points, attrs, nbr_idx):
    """(N, W) f32 row table: [p(3) | vx(K) | vy(K) | vz(K) | attrs(A)].

    Same data as the walk tracer's packed rows (trace.py:pack_trace_table)
    minus the neighbor indices — the rasterizer never follows adjacency,
    it only needs the bisector-plane geometry. Offsets are rounded through
    f16 exactly like the walk so both engines see identical planes.
    """
    q = jnp.take(points, nbr_idx, axis=0)  # (N, K, 3)
    off = (q - points[:, None, :]).astype(jnp.float16).astype(jnp.float32)
    return jnp.concatenate(
        [
            points.astype(jnp.float32),
            off[..., 0],
            off[..., 1],
            off[..., 2],
            attrs.astype(jnp.float32),
        ],
        axis=1,
    )


def _grid_shape(width, height, tile):
    ntx = -(-width // tile)
    nty = -(-height // tile)
    return ntx, nty


# ---------------------------------------------------------------------------
# binning: cells -> sorted (tile, cell) pairs


def _angdist(t, t0):
    """|t - t0| on the circle, result in [0, pi]."""
    d = jnp.mod(t - t0 + np.pi, 2.0 * np.pi) - np.pi
    return jnp.abs(d)


def _fisheye_rect(cx, cy, cz, dist, e_norm, fov, *, width, height):
    """Conservative pixel rect of a bounding sphere under the equidistant
    fisheye camera (reference camera.h:56-85: u = (2x/W - 1) aspect,
    v = 1 - 2y/H, phi = fov |uv|).

    The sphere subtends a cone of half-angle b = asin(e/d) around its
    center direction (polar angle a from forward, azimuth tc); its screen
    footprint is the polar rect r in [phi_lo, phi_hi]/fov, theta in
    tc +- delta, whose Cartesian AABB comes from interval products.
    Spheres containing the camera (d <= e) cover the full screen.
    """
    aspect = width / height
    eps = 1e-12
    d_s = jnp.maximum(dist, eps)
    sin_b = jnp.clip(e_norm / d_s, 0.0, 1.0)
    b = jnp.arcsin(sin_b)
    ca = jnp.clip(cz / d_s, -1.0, 1.0)
    a = jnp.arccos(ca)
    phi_lo = jnp.maximum(a - b, 0.0)
    phi_hi = jnp.minimum(a + b, np.pi)
    r_lo = phi_lo / fov
    r_hi = phi_hi / fov
    sin_a = jnp.sqrt(jnp.maximum(1.0 - ca * ca, 0.0))
    narrow = (a > b) & (a + b < np.pi)
    delta = jnp.where(
        narrow,
        jnp.arcsin(jnp.clip(sin_b / jnp.maximum(sin_a, eps), 0.0, 1.0)),
        np.pi,
    )
    tc = jnp.arctan2(cy, cx)
    tm, tp = tc - delta, tc + delta
    cos_hi = jnp.where(
        _angdist(tc, 0.0) <= delta, 1.0,
        jnp.maximum(jnp.cos(tm), jnp.cos(tp)),
    )
    cos_lo = jnp.where(
        _angdist(tc, np.pi) <= delta, -1.0,
        jnp.minimum(jnp.cos(tm), jnp.cos(tp)),
    )
    sin_hi = jnp.where(
        _angdist(tc, 0.5 * np.pi) <= delta, 1.0,
        jnp.maximum(jnp.sin(tm), jnp.sin(tp)),
    )
    sin_lo = jnp.where(
        _angdist(tc, -0.5 * np.pi) <= delta, -1.0,
        jnp.minimum(jnp.sin(tm), jnp.sin(tp)),
    )
    # min/max of r * trig over the [r_lo, r_hi] x [lo, hi] rectangle
    uu_min = jnp.minimum(r_lo * cos_lo, r_hi * cos_lo)
    uu_max = jnp.maximum(r_lo * cos_hi, r_hi * cos_hi)
    vv_min = jnp.minimum(r_lo * sin_lo, r_hi * sin_lo)
    vv_max = jnp.maximum(r_lo * sin_hi, r_hi * sin_hi)
    inside = dist <= e_norm
    uu_min = jnp.where(inside, -aspect, uu_min)
    uu_max = jnp.where(inside, aspect, uu_max)
    vv_min = jnp.where(inside, -1.0, vv_min)
    vv_max = jnp.where(inside, 1.0, vv_max)
    # pixel coords: x = (u/aspect + 1) W/2, y = (1 - v) H/2 (v flips y)
    px_min = (uu_min / aspect + 1.0) * (0.5 * width)
    px_max = (uu_max / aspect + 1.0) * (0.5 * width)
    py_min = (1.0 - vv_max) * (0.5 * height)
    py_max = (1.0 - vv_min) * (0.5 * height)
    return px_min, px_max, py_min, py_max


def _bin_expand(bb_min, bb_max, density, pos, fwd, rgt, up, intrin,
                *, width, height, cfg, pad_px=0.0):
    """bin_pairs' expansion half: visible-cell screen rects -> the (M,)
    fused u32 sort keys + per-slot cell ids (pre-sort). Split out so the
    profiler can time expansion vs the sort (tools/profile_raster.py)."""
    TS = cfg.tile
    ntx, nty = _grid_shape(width, height, TS)
    n_tiles = ntx * nty
    M = cfg.max_pairs
    N = bb_min.shape[0]
    ax, bx, ay, by = intrin

    center = 0.5 * (bb_min + bb_max)
    ext = 0.5 * (bb_max - bb_min)  # half-extents, world axes
    rel = center - pos[None, :]
    cz = rel @ fwd
    cx = rel @ rgt
    cy = rel @ up
    # camera-space half-extents of the world AABB: |R^T| e
    absR = jnp.stack([jnp.abs(rgt), jnp.abs(up), jnp.abs(fwd)], axis=0)
    e_cam = ext @ absR.T  # (N, 3) -> (ex, ey, ez)
    ex, ey, ez = e_cam[:, 0], e_cam[:, 1], e_cam[:, 2]
    e_norm = jnp.linalg.norm(ext, axis=-1)

    visible = jnp.ones((N,), bool)
    if cfg.alpha_cull > 0.0:
        visible &= (density * (2.0 * e_norm)) >= cfg.alpha_cull
    # zero extent marks padding rows (capacity > active points)
    visible &= e_norm > 0.0

    if cfg.cam_model == FISHEYE:
        dist_f = jnp.linalg.norm(rel, axis=-1)
        px_min, px_max, py_min, py_max = _fisheye_rect(
            cx, cy, cz, dist_f, e_norm, intrin[0],
            width=width, height=height,
        )
    else:
        visible &= (cz + ez) > 0.0
        # conservative screen rect of the camera-space AABB: each side
        # projects through whichever z extreme maximizes the rect. Boxes
        # crossing the camera plane clamp at a near plane — a cell
        # containing the camera axis then covers the full screen, while
        # off-axis crossers stay laterally bounded and mostly cull
        # off-screen.
        znear = 1e-3
        z_lo = jnp.maximum(cz - ez, znear)
        z_hi = jnp.maximum(cz + ez, znear)
        xm, xp = cx - ex, cx + ex
        ym, yp = cy - ey, cy + ey
        # camera-plane slopes s = X/Z, Y/Z; a point at (X, Y, Z) projects
        # to pixel x' = (X/Z - bx)/ax, y' = (Y/Z - by)/ay (see
        # _pixel_dir_rows)
        u_min = jnp.minimum(xm / z_lo, xm / z_hi)
        u_max = jnp.maximum(xp / z_lo, xp / z_hi)
        v_min = jnp.minimum(ym / z_lo, ym / z_hi)
        v_max = jnp.maximum(yp / z_lo, yp / z_hi)

        pxa = (u_min - bx) / ax
        pxb = (u_max - bx) / ax
        px_min = jnp.minimum(pxa, pxb)
        px_max = jnp.maximum(pxa, pxb)
        pya = (v_min - by) / ay
        pyb = (v_max - by) / ay
        py_min = jnp.minimum(pya, pyb)
        py_max = jnp.maximum(pya, pyb)

    px_min = px_min - pad_px
    px_max = px_max + pad_px
    py_min = py_min - pad_px
    py_max = py_max + pad_px
    visible &= (px_max >= 0.0) & (px_min <= width)
    visible &= (py_max >= 0.0) & (py_min <= height)

    tx0 = jnp.clip(jnp.floor(px_min / TS).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(px_max / TS).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(py_min / TS).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor(py_max / TS).astype(jnp.int32), 0, nty - 1)

    nx = (tx1 - tx0 + 1) * visible
    ny = (ty1 - ty0 + 1) * visible
    counts = nx * ny

    offs = jnp.cumsum(counts)
    n_pairs = offs[-1]
    offs0 = offs - counts  # exclusive

    # depth key, per CELL (camera-dependent but tile-independent).
    # reorder_window > 0 (exact-order mode): conservative lower bound of
    # per-pixel t_in (distance to the bounding sphere) — the sorted-merge
    # kernel's safe-emission proof REQUIRES key <= true t_in.
    # reorder_window == 0 (list-order mode): nothing downstream consumes
    # the bound, so use the distance to the cell center — an interval-
    # MIDPOINT proxy. A ray's cell intervals are disjoint (Voronoi), so
    # ordering by any interior point is exact; the center tracks the
    # midpoint far better than the sphere bound tracks t_in, which
    # collapses to near-zero for the large overlapping cells of early
    # training (32k points) and scrambles the composite order.
    dist = jnp.linalg.norm(rel, axis=-1)
    key_cell = dist if cfg.reorder_window == 0 else dist - e_norm

    # single fused u32 sort key: tile (13 bits for <=8192 tiles) | depth
    # quantized to the remaining bits. One-key sorts are ~2x cheaper on TPU
    # than the (tile, f32) two-key comparator; quantization inversions are
    # absorbed by the kernel's exact-t_in reorder buffer (which orders by
    # the true per-pixel t_in anyway — the list order is already only a
    # conservative approximation of it).
    depth_bits = max(1, 31 - max(int(n_tiles).bit_length(), 1))
    q_max = jnp.float32((1 << depth_bits) - 1)
    k_lo = jnp.min(jnp.where(visible, key_cell, jnp.inf))
    k_hi = jnp.max(jnp.where(visible, key_cell, -jnp.inf))
    k_rng = jnp.maximum(k_hi - k_lo, 1e-20)
    q_cell = (
        jnp.clip((key_cell - k_lo) / k_rng, 0.0, 1.0) * q_max
    ).astype(jnp.int32)

    # cell-id per pair slot WITHOUT jnp.repeat: repeat lowers to a binary
    # search (log2 N random 4-byte gather passes over M — measured ~250 ms
    # at 2M cells / 4M pairs). A scatter-max of each cell's index at its
    # range start followed by a running max fills every slot with its
    # owning cell in two linear passes instead.
    seed = jnp.full((M,), -1, jnp.int32).at[offs0].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    cell = jax.lax.cummax(seed)

    # one packed row gather replaces four scalar takes per pair
    aux = jnp.stack(
        [offs0, nx, ty0 * ntx + tx0, q_cell], axis=1
    )  # (N, 4) i32
    auxp = jnp.take(aux, cell, axis=0)  # (M, 4)
    slot = jnp.arange(M, dtype=jnp.int32) - auxp[:, 0]
    nx_p = jnp.maximum(auxp[:, 1], 1)
    dx = slot % nx_p
    dy = slot // nx_p
    tile = auxp[:, 2] + dy * ntx + dx

    valid = jnp.arange(M, dtype=jnp.int32) < n_pairs
    fused = jnp.where(
        valid,
        (tile.astype(jnp.uint32) << depth_bits)
        | auxp[:, 3].astype(jnp.uint32),
        jnp.uint32(n_tiles) << depth_bits,
    )
    return fused, cell, key_cell, n_pairs, depth_bits


def bin_pairs(bb_min, bb_max, density, pos, fwd, rgt, up, intrin,
              *, width, height, cfg, pad_px=0.0):
    """Expand visible cells into depth-sorted per-tile cell lists.

    bb_min/bb_max: (N, 3) world-space AABBs of each cell's finite Voronoi
    extent (ops/cellbound.cell_bounds). Padding rows must collapse to a
    point (zero extent). intrin = (ax, bx, ay, by) affine pixel
    intrinsics (fov_intrin / dataset_intrin); under cfg.cam_model=FISHEYE
    only intrin[0] is read, as the fov. ``pad_px`` expands every cell's
    screen rect — pass dirgrid.fit_affine_intrin's margin when the
    composite runs on an exact direction grid so affine binning stays
    conservative for the true (distorted) camera.

    Returns (sorted_cell (M,) int32, sorted_key (M,) f32,
    tile_starts (n_tiles+1,) int32, n_pairs () int32). Pairs beyond
    ``cfg.max_pairs`` are dropped — callers must check ``n_pairs`` and
    either raise or re-run with a larger cap (no silent truncation policy).
    """
    ntx, nty = _grid_shape(width, height, cfg.tile)
    n_tiles = ntx * nty
    fused, cell, key_cell, n_pairs, depth_bits = _bin_expand(
        bb_min, bb_max, density, pos, fwd, rgt, up, intrin,
        width=width, height=height, cfg=cfg, pad_px=pad_px,
    )
    fused_s, cell_s = jax.lax.sort((fused, cell), num_keys=1)
    starts = jnp.searchsorted(
        fused_s,
        jnp.arange(n_tiles + 1, dtype=jnp.uint32) << depth_bits,
        side="left",
    ).astype(jnp.int32)
    return cell_s, key_cell, starts, n_pairs


# ---------------------------------------------------------------------------
# shared per-tile math (used by the Pallas kernel and the jnp reference).
#
# Data layout is chosen for the TPU vector unit: PIXELS LIVE ON LANES.
# Every per-pixel quantity is (1, P) or (rows, P) with P = tile*tile = 256
# lanes (two full vregs); per-entry plane quantities are (K, P); the
# reorder buffer is (W, P). Entry rows arrive from DMA as (CE, Wrow) and
# are transposed once per chunk with an MXU identity contraction (Mosaic
# has no lane->sublane reshape). SH coefficients are stored PLANAR
# (channel-major) in the raster pack so each channel is a contiguous
# (D, 1) column after the transpose.

C0 = 0.28209479177387814
C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def _sh_basis_rows(x, y, z, degree):
    """SH basis rows from (1, P) direction components -> (D, P).

    Same constants/ordering as ops/sh.sh_basis (reference sh_utils.cuh).
    """
    one = jnp.ones_like(x)
    rows = [C0 * one]
    if degree > 0:
        rows += [-C1 * y, C1 * z, -C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        rows += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 2:
        rows += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.concatenate(rows, axis=0)


def fov_intrin(fov, *, width, height):
    """Affine pixel->direction intrinsics for the reference fov model.

    The generalized camera is dir = fwd + (ax x + bx) rgt + (ay y + by) up
    (normalized). cast_rays' pinhole dir = ds fwd + u rgt + v up with
    u = (2x/W - 1) aspect, v = 1 - 2y/H, ds = 1/tan(fov/2) is the same
    direction scaled by 1/ds. Dataset cameras (fx, fy, cx, cy with
    half-pixel centers and y-down axes) map through dataset_intrin.
    """
    aspect = width / height
    ds = 1.0 / jnp.tan(fov * 0.5)
    ax = 2.0 * aspect / (width * ds)
    bx = -aspect / ds
    ay = -2.0 / (height * ds)
    by = 1.0 / ds
    return ax, bx, ay, by


def dataset_intrin(fx, fy, cx, cy):
    """Intrinsics for loader-convention cameras (data/blender.py:25-43):
    dir_cam = ((x + .5 - cx)/fx, (y + .5 - cy)/fy, 1) with rgt/up/fwd =
    c2w columns 0/1/2 (up points DOWN in world; the positive ay absorbs
    it)."""
    ax = 1.0 / fx
    bx = (0.5 - cx) / fx
    ay = 1.0 / fy
    by = (0.5 - cy) / fy
    return ax, bx, ay, by


def _pixel_dir_rows(tx, ty, cam9, intrin, *, width, height, tile):
    """Normalized ray direction components, each (1, P).

    intrin = (ax, bx, ay, by): dir = fwd + (ax x + bx) rgt +
    (ay y + by) up over integer pixel coords — expresses both the
    reference fov convention (fov_intrin) and dataset fx/fy/cx/cy
    cameras (dataset_intrin) exactly.
    """
    TS = tile
    P = TS * TS
    fx, fy, fz, rx, ry, rz, ux, uy, uz = cam9
    ax, bx, ay, by = intrin
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)  # row-major pixel
    ii = idx % TS  # pixel col within tile
    jj = idx // TS  # pixel row within tile
    u = ax * (tx * TS + ii).astype(jnp.float32) + bx
    v = ay * (ty * TS + jj).astype(jnp.float32) + by
    dx = fx + u * rx + v * ux
    dy = fy + u * ry + v * uy
    dz = fz + u * rz + v * uz
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    return dx * inv, dy * inv, dz * inv


def _grid_dir_rows(dirs_block, cam9):
    """World-frame direction components from a camera-frame grid tile.

    dirs_block: (8, P) rows 0..2 = camera-frame unit direction components
    (ops/dirgrid.make_dir_grid). The rotation preserves the norm, so the
    rows come out normalized like _pixel_dir_rows'. Zero rows (image pad
    or fisheye mask) stay zero: every plane denom vanishes, all intervals
    are empty, and the pixel keeps the background.
    """
    fx, fy, fz, rx, ry, rz, ux, uy, uz = cam9
    dcx = dirs_block[0:1]
    dcy = dirs_block[1:2]
    dcz = dirs_block[2:3]
    dx = dcx * rx + dcy * ux + dcz * fx
    dy = dcx * ry + dcy * uy + dcz * fy
    dz = dcx * rz + dcy * uz + dcz * fz
    return dx, dy, dz


def _mxu_transpose(chunk):
    """(CE, W) -> (W, CE) via an identity contraction on the MXU.

    Mosaic cannot reshape/transpose lanes into sublanes directly; a
    dot_general contracting the CE axis against eye(CE) does it in one
    trivially cheap matrix op.
    """
    CE = chunk.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CE, CE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (CE, CE), 0)
    eye = (lane == sub).astype(chunk.dtype)
    return jax.lax.dot_general(
        chunk, eye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _entry_core(col, origin, dir_rows, basis, K, A):
    """One cell's interval + color against all tile pixels.

    col: (Wrow, 1) transposed packed raster column (planar-SH layout);
    origin: 3 scalars; dir_rows: three (1, P) components; basis: (D, P).
    Returns (od (1, P) optical depth sigma*len, rgb_p (3, P) decoded cell
    color, t_in (1, P) entry parameter).

    Interval math: for each neighbor plane with offset v (midpoint
    bisector), the ray hits it at t = [(p - o) . v + |v|^2/2] / (v . d);
    planes with v.d > 0 bound the exit (min over them), v.d < 0 the entry
    (max, clamped at 0). Padding slots have v = 0 and fall out of both
    sets. A non-finite exit (boundary cell, ray leaving the foam) keeps
    the walk's semantics: zero contribution (trace.py run &= has_exit).
    This is the walk's exit-face test (trace.py:137-175 / reference
    tracing_utils.cuh:43-67) evaluated for entry AND exit.
    """
    ox, oy, oz = origin
    dirx, diry, dirz = dir_rows
    px = col[0, 0]
    py = col[1, 0]
    pz = col[2, 0]
    vx = col[3 : 3 + K]  # (K, 1)
    vy = col[3 + K : 3 + 2 * K]
    vz = col[3 + 2 * K : 3 + 3 * K]
    sigma = col[3 + 3 * K + A - 1, 0]

    num = (
        vx * (px - ox) + vy * (py - oy) + vz * (pz - oz)
        + 0.5 * (vx * vx + vy * vy + vz * vz)
    )  # (K, 1)
    denom = vx * dirx + vy * diry + vz * dirz  # (K, P)
    t = num / denom
    t_out = jnp.min(
        jnp.where(denom > 0.0, t, jnp.inf), axis=0, keepdims=True
    )  # (1, P)
    t_in = jnp.max(
        jnp.where(denom < 0.0, t, 0.0), axis=0, keepdims=True
    )
    seg = jnp.where(
        jnp.isfinite(t_out), jnp.maximum(t_out - t_in, 0.0), 0.0
    )
    od = sigma * seg  # (1, P)

    D = (A - 1) // 3
    coeffs = col[3 + 3 * K : 3 + 3 * K + A - 1]  # (3D, 1) planar
    rgb_p = jnp.maximum(
        0.5
        + jax.lax.dot_general(
            coeffs.reshape(3, D), basis, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ),
        0.0,
    )  # (3, P)
    rgb_p = jnp.where(sigma > 1e-6, rgb_p, 0.0)
    return od, rgb_p, t_in


# ---------------------------------------------------------------------------
# exact-order emission: per-pixel k-way merge buffer
#
# Entries stream in conservative key order (key <= every later entry's true
# t_in). Live entries park in W per-pixel slots; a slot is composited
# ("popped") only once its t_in is <= the current key — at that point no
# future entry can precede it, so pop order == exact per-ray interval order.
# A full buffer forces the min-t_in pop early (counted in ``forced``).
# All buffer state is (W, P): slot axis on sublanes, pixels on lanes.


def _buffer_pop(state, key_now, wt, force_for_insert):
    (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced) = state
    occ = S_od > 0.0
    min_t = jnp.min(jnp.where(occ, S_t, jnp.inf), axis=0, keepdims=True)
    full = jnp.min(S_od, axis=0, keepdims=True) > 0.0
    need = full & force_for_insert
    do_pop = (min_t <= key_now) | need
    cand = occ & (S_t == min_t) & do_pop
    slot = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    first = jnp.min(jnp.where(cand, slot, cand.shape[0]), axis=0,
                    keepdims=True)
    sel = cand & (slot == first)
    self_f = sel.astype(jnp.float32)
    od_p = jnp.sum(S_od * self_f, axis=0, keepdims=True)
    r_p = jnp.sum(S_r * self_f, axis=0, keepdims=True)
    g_p = jnp.sum(S_g * self_f, axis=0, keepdims=True)
    b_p = jnp.sum(S_b * self_f, axis=0, keepdims=True)
    decay = jnp.exp(-od_p)  # od_p = 0 when nothing popped -> no-op
    w = jnp.where(T > wt, T * (1.0 - decay), 0.0)
    rgb_r = rgb_r + w * r_p
    rgb_g = rgb_g + w * g_p
    rgb_b = rgb_b + w * b_p
    # freeze T at the weight threshold (walk early-exit semantics; the
    # sorted-merge kernel and the list-order path do the same)
    T = jnp.where(T > wt, T * decay, T)
    S_od = jnp.where(sel, 0.0, S_od)
    forced = forced + (need & (min_t > key_now)).astype(jnp.float32)
    return (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced)


def _buffer_insert(state, t_new, od_new, rgb3, live):
    (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced) = state
    r_new, g_new, b_new = rgb3  # each (1, P)
    free = S_od <= 0.0
    slot = jax.lax.broadcasted_iota(jnp.int32, free.shape, 0)
    first = jnp.min(jnp.where(free, slot, free.shape[0]), axis=0,
                    keepdims=True)
    ins = free & (slot == first) & live
    S_t = jnp.where(ins, t_new, S_t)
    S_od = jnp.where(ins, od_new, S_od)
    S_r = jnp.where(ins, r_new, S_r)
    S_g = jnp.where(ins, g_new, S_g)
    S_b = jnp.where(ins, b_new, S_b)
    return (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced)


def _buffer_init(P, W):
    z = jnp.zeros((W, P), jnp.float32)
    o = jnp.zeros((1, P), jnp.float32)
    return (
        z, z, z, z, z,
        jnp.ones((1, P), jnp.float32),
        o, o, o, o,
    )


def _buffer_drain(state, wt, W):
    inf_key = jnp.full((1, 1), jnp.inf, jnp.float32)
    no_force = jnp.zeros((1, 1), bool)
    for _ in range(W):
        state = _buffer_pop(state, inf_key, wt, no_force)
    return state


def _apply_entry(bst, od, rgb3, t_in, key_e, in_list, wt, Wbuf):
    """Apply one entry's (od, rgb, t_in) to the composite state."""
    if Wbuf > 0:
        key_e = jnp.where(in_list, key_e, -jnp.inf)
        T = bst[5]
        live = in_list & (od > 0.0) & (T > wt)

        # dead entries (pure binning overshoot: the conservative bounding
        # sphere hit the tile but the convex cell misses every ray, or
        # the tile already saturated) skip the ~2x-dominant reorder
        # buffer ops entirely. EXACT: pops are ordered by min t_in
        # regardless of when they run, and a dead entry never inserts —
        # deferring its pop sweep to a later live entry (or the drain)
        # emits the same sequence.
        def visit(b):
            b = _buffer_pop(b, key_e, wt, live)
            return _buffer_insert(b, t_in, od, rgb3, live)

        bst = jax.lax.cond(jnp.any(live), visit, lambda b: b, bst)
    else:
        (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced) = bst
        live = in_list & (T > wt)
        od = jnp.where(live, od, 0.0)
        decay = jnp.exp(-od)
        w = T * (1.0 - decay)
        rgb_r = rgb_r + w * rgb3[0]
        rgb_g = rgb_g + w * rgb3[1]
        rgb_b = rgb_b + w * rgb3[2]
        T = T * decay
        bst = (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced)
    return bst


def _chunk_precompute(chunk_t, origin, basis, K, A):
    """Batch the per-chunk camera-dependent quantities.

    chunk_t: (W + 8, CE) transposed row-table rows (build_row_table
    layout). Returns (vx, vy, vz (K, CE), num (K, CE), sig (1, CE),
    key (1, CE), rgb[(CE, P)] x 3). The conservative depth key is derived
    here from the stored bb center/extent — the exact same formula as
    bin_pairs' sort key (|center − origin| − e_norm) so the reorder
    buffer's safe-emission invariant holds against the sorted stream.
    Batching the SH decode into three chunk-wide MXU contractions and the
    plane numerators into one (K, CE) pass removes all per-entry
    scalar-unit work from the inner loop.
    """
    ox, oy, oz = origin
    vx = chunk_t[3 : 3 + K]
    vy = chunk_t[3 + K : 3 + 2 * K]
    vz = chunk_t[3 + 2 * K : 3 + 3 * K]
    # position = p_hi + p_lo (hi/lo split restores ~f32 precision from an
    # f16 table; f32 tables store p_lo = 0 so this is dtype-agnostic)
    Wt = 3 + 3 * K + A
    px = chunk_t[0:1] + chunk_t[Wt + 5 : Wt + 6]
    py = chunk_t[1:2] + chunk_t[Wt + 6 : Wt + 7]
    pz = chunk_t[2:3] + chunk_t[Wt + 7 : Wt + 8]
    num = (
        vx * (px - ox) + vy * (py - oy) + vz * (pz - oz)
        + 0.5 * (vx * vx + vy * vy + vz * vz)
    )
    sig = chunk_t[3 + 3 * K + A - 1 : 3 + 3 * K + A]
    W = 3 + 3 * K + A
    cx = chunk_t[W : W + 1] - ox
    cy = chunk_t[W + 1 : W + 2] - oy
    cz = chunk_t[W + 2 : W + 3] - oz
    key = jnp.sqrt(cx * cx + cy * cy + cz * cz) - chunk_t[W + 3 : W + 4]
    D = (A - 1) // 3
    base = 3 + 3 * K
    rgb = []
    for c in range(3):
        coeff = chunk_t[base + c * D : base + (c + 1) * D]  # (D, CE)
        rgb.append(
            jnp.maximum(
                0.5
                + jax.lax.dot_general(
                    coeff, basis, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ),
                0.0,
            )
        )  # (CE, P)
    return vx, vy, vz, num, sig, key, rgb


def _entry_interval_inf(pre, e, dir_rows, degm=None):
    """Entry e's per-pixel [t_in, t_out] from the chunk precompute,
    with the optional degree-gated plane-block skip (see
    _entry_from_chunk). Returns (t_out (1, P) possibly inf, t_in)."""
    vx, vy, vz, num, _sig, _key, _rgb = pre
    dirx, diry, dirz = dir_rows
    K = vx.shape[0]
    P = dirx.shape[1]

    def plane_minmax(vx_b, vy_b, vz_b, num_b, t_out, t_in):
        den = vx_b * dirx + vy_b * diry + vz_b * dirz  # (kb, P)
        t = num_b / den
        t_out = jnp.minimum(
            t_out,
            jnp.min(jnp.where(den > 0.0, t, jnp.inf), axis=0,
                    keepdims=True),
        )
        t_in = jnp.maximum(
            t_in,
            jnp.max(jnp.where(den < 0.0, t, 0.0), axis=0, keepdims=True),
        )
        return t_out, t_in

    t_out = jnp.full((1, P), jnp.inf, jnp.float32)
    t_in = jnp.zeros((1, P), jnp.float32)
    if degm is None:
        t_out, t_in = plane_minmax(
            vx[:, e : e + 1], vy[:, e : e + 1], vz[:, e : e + 1],
            num[:, e : e + 1], t_out, t_in,
        )
    else:
        KB = 8
        for kb in range(0, K, KB):
            t_out, t_in = jax.lax.cond(
                kb < degm,
                lambda to, ti, kb=kb: plane_minmax(
                    vx[kb : kb + KB, e : e + 1],
                    vy[kb : kb + KB, e : e + 1],
                    vz[kb : kb + KB, e : e + 1],
                    num[kb : kb + KB, e : e + 1],
                    to, ti,
                ),
                lambda to, ti: (to, ti),
                t_out, t_in,
            )
    return t_out, t_in


def _entry_from_chunk(pre, e, dir_rows, degm=None):
    """Entry e's (od, rgb3, t_in, key) from the chunk precompute.

    ``degm`` (traced scalar: THIS entry's real degree, from the table's
    degree column) activates block-skipping: planes are tested in blocks
    of 8 and whole blocks past ``degm`` are skipped with a conditional.
    Padded tables run at K = max degree (72 on 2M foams) while the mean
    degree is ~15, so skipping cuts the dominant (K, P) plane math ~4x
    with EXACTLY the same result — skipped blocks contain only padding
    planes (v = 0), which contribute to neither the entry nor the exit
    set.
    """
    vx, vy, vz, num, sig, key, rgb = pre
    t_out, t_in = _entry_interval_inf(pre, e, dir_rows, degm)
    seg = jnp.where(
        jnp.isfinite(t_out), jnp.maximum(t_out - t_in, 0.0), 0.0
    )
    sig_e = sig[0:1, e : e + 1]  # (1, 1)
    od = sig_e * seg
    color_on = sig_e > 1e-6
    rgb3 = tuple(
        jnp.where(color_on, rgb[c][e : e + 1], 0.0) for c in range(3)
    )
    return od, rgb3, t_in, key[0:1, e : e + 1]


# sentinel key for zero-weight / free rows in the sorted-merge pending
# set: must be FINITE (the bitonic network fetches compare-exchange
# partners with 0/1 permutation matmuls, and 0 * inf = NaN would poison
# every row) yet far below any real ray parameter
_DEAD_KEY = -3.0e37


def _bitonic_sort_rows(X, keyP, nrows):
    """In-register bitonic sort of ``X`` (nrows, C) ascending by its
    first ``keyP`` lane columns, applied to every lane column.

    Compare-exchange partners are fetched with constant (nrows, nrows)
    permutation matrices on the MXU — no sublane shuffles, no
    conditionals, so the whole network pipelines. 15 rounds for 32 rows.
    """
    n = nrows
    rounds = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            rounds.append((j, k))
            j //= 2
        k *= 2
    return _bitonic_rounds_apply(X, keyP, n, rounds)


def _bitonic_rounds_apply(X, keyP, n, rounds):
    """Run bitonic compare-exchange ``rounds`` = [(j, k), ...] over the
    (n, C) working array (see _bitonic_sort_rows)."""
    r_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    xor_rc = jnp.bitwise_xor(r_i, c_i)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    C = X.shape[1]
    reps = C // keyP
    for j, k in rounds:
        P_j = (xor_rc == j).astype(jnp.float32)
        partner = jax.lax.dot_general(
            P_j, X, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # take_min <=> bit j of the row index equals bit k — via
        # integer xor (a bool == bool comparison lowers to an
        # i8 -> i1 truncation Mosaic rejects)
        take_min = (
            jnp.bitwise_and(
                jnp.bitwise_xor(row // j, row // k), 1
            ) == 0
        )  # (n, 1)
        ks = X[:, :keyP]
        kp = partner[:, :keyP]
        # logical ops only — a where() with BOOL branches lowers to
        # an i8 select + i1 truncation Mosaic rejects
        sel = (take_min & (kp < ks)) | ((~take_min) & (kp > ks))
        # segment-wise select: concatenating the bool mask forces an
        # i8 -> i1 truncation Mosaic rejects
        X = jnp.concatenate(
            [
                jnp.where(sel, partner[:, i * keyP : (i + 1) * keyP],
                          X[:, i * keyP : (i + 1) * keyP])
                for i in range(reps)
            ],
            axis=1,
        )
    return X




def _emit_sorted(bst, t_s, od_s, cr_s, cg_s, cb_s, emit, wt):
    """Composite the ``emit``-masked rows of a t_in-ascending entry
    block in closed form (MXU exclusive-prefix; see _chunk_composite).

    T freezes once it crosses the weight threshold (walk semantics,
    trace.py early exit): the gate is a prefix property — T only decays
    — so gating on the un-frozen prefix is exactly the sequential
    frozen gate (first crossing index coincides, and past it T stays
    at or below wt either way)."""
    (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced) = bst
    n = t_s.shape[0]
    P = t_s.shape[1]
    odE = jnp.where(emit, od_s, 0.0)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    L = (r_i > c_i).astype(jnp.float32)
    S = jax.lax.dot_general(
        L, odE, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # exclusive prefix
    T_pre = T * jnp.exp(-S)
    gate = T_pre > wt
    w = jnp.where(gate, T_pre * (1.0 - jnp.exp(-odE)), 0.0)
    ones_row = jnp.full((1, n), 1.0, jnp.float32)
    acc = jax.lax.dot_general(
        ones_row,
        jnp.concatenate([w * cr_s, w * cg_s, w * cb_s,
                         jnp.where(gate, odE, 0.0)], axis=1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, 4P)
    rgb_r = rgb_r + acc[:, 0:P]
    rgb_g = rgb_g + acc[:, P : 2 * P]
    rgb_b = rgb_b + acc[:, 2 * P : 3 * P]
    T = T * jnp.exp(-acc[:, 3 * P : 4 * P])
    return (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced)


def _chunk_entries(pre, dir_rows, chunk_t, deg_col, n_in_list, CE,
                   degm_c):
    """All CE entries' (t_in, od, colors) as (CE, P) blocks; padding
    entries past ``n_in_list`` get t_in = +inf, od = 0.

    Loop order is plane-block OUTER, entry INNER: one lax.cond gates each
    8-plane block for the whole chunk (K/8 - 1 conds per chunk), with the
    (CE, P) running interval bounds as the carry. The two prior shapes
    both measured slower: per-entry per-block conds (CE x K/8 = 144 scalar
    branches per chunk at K=72, each stalling the vector pipeline) and
    ungated full-K math (the padding-plane math it skips is the dominant
    vector cost at K >> mean degree). The plane-block skip stays gated on
    the CHUNK-max degree — exact, because blocks past the max degree hold
    only padding planes (v = 0), which join neither the entry nor the
    exit set.
    """
    vx, vy, vz, num, sig, _key, _rgb = pre
    dirx, diry, dirz = dir_rows
    K = vx.shape[0]
    P = dirx.shape[1]
    KB = 8

    def block(kb, t_out, t_in):
        to_l, ti_l = [], []
        for e in range(CE):
            den = (
                vx[kb : kb + KB, e : e + 1] * dirx
                + vy[kb : kb + KB, e : e + 1] * diry
                + vz[kb : kb + KB, e : e + 1] * dirz
            )  # (KB, P)
            t = num[kb : kb + KB, e : e + 1] / den
            to_l.append(jnp.min(
                jnp.where(den > 0.0, t, jnp.inf), axis=0, keepdims=True
            ))
            ti_l.append(jnp.max(
                jnp.where(den < 0.0, t, 0.0), axis=0, keepdims=True
            ))
        t_out = jnp.minimum(t_out, jnp.concatenate(to_l, axis=0))
        t_in = jnp.maximum(t_in, jnp.concatenate(ti_l, axis=0))
        return t_out, t_in

    t_out = jnp.full((CE, P), jnp.inf, jnp.float32)
    t_in = jnp.zeros((CE, P), jnp.float32)
    t_out, t_in = block(0, t_out, t_in)  # degree >= 4: always live
    n_extra = (K - 1) // KB  # extra 8-plane blocks past the first
    if n_extra > 0:
        # ONE scalar branch (lax.switch on the extra-block count) instead
        # of a chain of K/8 - 1 lax.conds: each cond costs ~0.11 us of
        # scalar-unit stall (DEVNOTES round-3 kernel facts), so the chain
        # burned ~1 us per chunk at K = 72 while the selected branch runs
        # the same gated plane math. Semantics unchanged: branch n runs
        # blocks kb = KB..n*KB, exactly the blocks the cond chain ran for
        # ceil(degm/KB) = n + 1.
        nb = jnp.clip(
            ((degm_c + (KB - 1)) // KB).astype(jnp.int32) - 1,
            0, n_extra,
        )

        def make_branch(n):
            def br(to, ti):
                for j in range(1, n + 1):
                    to, ti = block(j * KB, to, ti)
                return to, ti
            return br

        t_out, t_in = jax.lax.switch(
            nb, [make_branch(n) for n in range(n_extra + 1)],
            t_out, t_in,
        )

    seg = jnp.where(
        jnp.isfinite(t_out), jnp.maximum(t_out - t_in, 0.0), 0.0
    )
    od = _mxu_transpose(pre[4]) * seg  # (CE, 1) sigma * (CE, P) seg
    tin = t_in
    e_idx = jax.lax.broadcasted_iota(jnp.int32, (CE, 1), 0)
    live = e_idx < n_in_list
    od = jnp.where(live, od, 0.0)
    # zero-od rows (padding, or cells this pixel's ray misses) must NOT
    # linger in the sorted-merge pending set — their interval math
    # yields arbitrary t_in that would displace real entries from the
    # suffix and force mis-ordered emission. Key them far-negative
    # (finite — see _DEAD_KEY): they sort first and flush straight
    # through with zero weight (the per-entry buffer equivalently never
    # inserted them).
    tin = jnp.where(od > 0.0, tin, _DEAD_KEY)
    sig_col = _mxu_transpose(pre[4])  # (CE, 1)
    color_on = sig_col > 1e-6
    c_r = jnp.where(color_on, pre[6][0], 0.0)  # (CE, P)
    c_g = jnp.where(color_on, pre[6][1], 0.0)
    c_b = jnp.where(color_on, pre[6][2], 0.0)
    return tin, od, c_r, c_g, c_b


def _sorted_chunk_composite(bst, pre, dir_rows, chunk_t, deg_col,
                            n_in_list, wt, CE, use_bitonic, degm_c,
                            merge_chunk=0):
    """Exact-t_in-order composite of one chunk against the pending set.

    Replaces the per-entry reorder buffer (safe-emission k-way merge)
    with its batch equivalent: the chunk's CE new entries join the CE
    pending entries, one bitonic network sorts all 2 CE rows per pixel
    by true t_in, and the sorted prefix that is provably final — t_in no
    later than every future entry's conservative key lower bound
    (k_last, this chunk's largest sort key) — is composited in closed
    form. The smallest CE rows are force-emitted beyond that to bound
    the pending set (counted in ``forced``, same graceful degradation as
    the buffer); the remaining rows are a STATIC suffix slice, so no
    per-pixel compaction is needed. Emission order equals the exact
    per-pixel t_in order whenever ``forced`` stays 0 — the same
    guarantee the reorder buffer gave, at ~vector cost per entry
    instead of ~750 serialized cycles (prof 2026-08-17).
    """
    tin, od, c_r, c_g, c_b = _chunk_entries(
        pre, dir_rows, chunk_t, deg_col, n_in_list, CE, degm_c,
    )
    CM = merge_chunk or CE
    if CM == CE:
        return _sorted_merge(
            bst, tin, od, c_r, c_g, c_b, pre[5], n_in_list, wt, CM,
            use_bitonic,
        )
    # sub-merges: the entry math above ran once for the whole CE-entry
    # DMA chunk; the pending set + bitonic network stay CM rows wide
    for s in range(0, CE, CM):
        bst = _sorted_merge(
            bst, tin[s : s + CM], od[s : s + CM], c_r[s : s + CM],
            c_g[s : s + CM], c_b[s : s + CM], pre[5][:, s : s + CM],
            n_in_list - s, wt, CM, use_bitonic,
        )
    return bst


def _sorted_merge(bst, tin, od, c_r, c_g, c_b, keys, n_live, wt, CM,
                  use_bitonic):
    """One batch sorted-merge of CM new entry rows against the CM-row
    pending set (see _sorted_chunk_composite)."""
    (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced) = bst
    CE = CM
    P = tin.shape[1]
    # future entries' t_in >= their key >= this block's largest live key.
    # keepdims: the bound stays a (1, 1) vector value — broadcast into the
    # compare below without a vector->scalar round trip per iteration
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CM), 1)
    k_last = jnp.max(
        jnp.where(lane < n_live, keys, -jnp.inf), keepdims=True
    )

    t32 = jnp.concatenate([S_t, tin], axis=0)  # (2CE, P)
    od32 = jnp.concatenate([S_od, od], axis=0)
    r32 = jnp.concatenate([S_r, c_r], axis=0)
    g32 = jnp.concatenate([S_g, c_g], axis=0)
    b32 = jnp.concatenate([S_b, c_b], axis=0)
    if use_bitonic:
        # real Mosaic lowering: in-register bitonic network (MXU
        # permutation fetches, no conds)
        X = jnp.concatenate([t32, od32, r32, g32, b32], axis=1)
        X = _bitonic_sort_rows(X, P, 2 * CE)
        t_s = X[:, 0:P]
        od_s = X[:, P : 2 * P]
        cr_s = X[:, 2 * P : 3 * P]
        cg_s = X[:, 3 * P : 4 * P]
        cb_s = X[:, 4 * P : 5 * P]
    else:
        # interpreter: the eagerly-executed bitonic rounds are ~100x
        # slower than one XLA sort; ordering is identical up to ties
        # (equal t_in rows commute in the composite)
        t_s, od_s, cr_s, cg_s, cb_s = jax.lax.sort(
            (t32, od32, r32, g32, b32), dimension=0, num_keys=1
        )

    # emit: every provably-final row (t_in bounded by all future keys),
    # every zero-weight row, and — only when the pending set would
    # overflow its CE slots — the smallest unsafe live rows (counted as
    # forced). Dead rows sort first (-inf), so the retained unsafe live
    # rows are always the topmost contiguous block: the static suffix
    # [CE:2CE) contains them all, no per-pixel compaction needed.
    safe = t_s <= k_last
    live_row = od_s > 0.0
    unsafe_live = live_row & (~safe)
    ul_f = unsafe_live.astype(jnp.float32)
    n = 2 * CE
    r_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    L1 = (r_i >= c_i).astype(jnp.float32)  # inclusive prefix
    rank_inc = jax.lax.dot_general(
        L1, ul_f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (2CE, P): # unsafe-live rows at or before each row
    n_ul = jnp.max(rank_inc, axis=0, keepdims=True)  # total per pixel
    force = unsafe_live & (rank_inc <= n_ul - CE)
    emit = safe | (~live_row) | force
    forced = forced + jnp.sum(
        force.astype(jnp.float32), axis=0, keepdims=True
    )
    bst = (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced)
    bst = _emit_sorted(bst, t_s, od_s, cr_s, cg_s, cb_s, emit, wt)
    (_, _, _, _, _, T, rgb_r, rgb_g, rgb_b, forced) = bst
    # pending set = static suffix; emitted rows in it become free slots
    # (dead-keyed so they flush through the next merge with zero weight)
    emit_hi = emit[CE:]
    S_t = jnp.where(emit_hi, _DEAD_KEY, t_s[CE:])
    S_od = jnp.where(emit_hi, 0.0, od_s[CE:])
    S_r = cr_s[CE:]
    S_g = cg_s[CE:]
    S_b = cb_s[CE:]
    return (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced)


def _sorted_drain(bst, wt):
    """Composite everything left pending (already t_in-ascending)."""
    (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced) = bst
    emit = jnp.ones(S_od.shape, bool)
    return _emit_sorted(bst, S_t, S_od, S_r, S_g, S_b, emit, wt)


def _chunk_composite(bst, pre, dir_rows, chunk_t, deg_col, n_in_list,
                     wt, CE, degm_c):
    """List-order composite of a WHOLE chunk in one vectorized pass.

    The per-entry formulation (16 sequential buffer/state updates, each
    with a vector->scalar `any(live)` cond) serialized the kernel at
    ~750 cycles/entry — the measured composite cost was per-chunk
    overhead, not plane math (prof 2026-08-17). Here the compositing
    recurrence is closed-form instead: with D_e = exp(-od_e),
    T_before_e = T0 * prod_{i<e} D_i, so one strictly-lower-triangular
    (CE, CE) MXU contraction yields every entry's exclusive
    optical-depth prefix, and the weights w_e = T_before_e (1 - D_e)
    and color accumulation reduce with one more (1, CE) contraction.
    The weight-threshold gate is a prefix property (T only decays), so
    gating on the un-frozen prefix is EXACTLY the sequential gate.

    Semantics = the reorder_window=0 list-order composite. Exact
    per-pixel t_in ordering (reorder_window > 0) keeps the buffer path.
    """
    (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced) = bst
    _tin, od, c_r, c_g, c_b = _chunk_entries(
        pre, dir_rows, chunk_t, deg_col, n_in_list, CE, degm_c,
    )

    r_i = jax.lax.broadcasted_iota(jnp.int32, (CE, CE), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (CE, CE), 1)
    L = (r_i > c_i).astype(jnp.float32)  # strictly lower triangular
    S = jax.lax.dot_general(
        L, od, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CE, P) exclusive prefix optical depth
    T_pre = T * jnp.exp(-S)
    gate = T_pre > wt
    D = jnp.exp(-od)
    w = jnp.where(gate, T_pre * (1.0 - D), 0.0)
    # one (1, CE) @ (CE, 4P) contraction reduces the three weighted
    # color channels AND the gated optical-depth total together
    ones_row = jnp.full((1, CE), 1.0, jnp.float32)
    acc = jax.lax.dot_general(
        ones_row,
        jnp.concatenate([w * c_r, w * c_g, w * c_b,
                         jnp.where(gate, od, 0.0)], axis=1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, 4P)
    P = od.shape[1]
    rgb_r = rgb_r + acc[:, 0:P]
    rgb_g = rgb_g + acc[:, P : 2 * P]
    rgb_b = rgb_b + acc[:, 2 * P : 3 * P]
    T = T * jnp.exp(-acc[:, 3 * P : 4 * P])
    return (S_t, S_od, S_r, S_g, S_b, T, rgb_r, rgb_g, rgb_b, forced)


def _composite_step(bst, col, key_col, in_list, origin, dir_rows, basis,
                    K, A, wt, Wbuf):
    """Per-entry composite step (jnp reference path)."""
    od, rgb_p, t_in = _entry_core(col, origin, dir_rows, basis, K, A)
    key_e = col[key_col : key_col + 1, 0:1]
    return _apply_entry(
        bst, od, (rgb_p[0:1], rgb_p[1:2], rgb_p[2:3]), t_in, key_e,
        in_list, wt, Wbuf,
    )


# ---------------------------------------------------------------------------
# Pallas composite kernel


def _composite_kernel(cfg, K, A, width, height, ntx, has_dirs,
                      use_bitonic, starts_ref, lens_ref, cam_ref,
                      rows_hbm, *rest):
    if has_dirs:
        dirs_ref, out_ref, aux_ref, buf, sems = rest
    else:
        out_ref, aux_ref, buf, sems = rest
        dirs_ref = None
    TS = cfg.tile
    P = TS * TS
    CE = cfg.entry_chunk
    wt = cfg.weight_threshold
    Wbuf = cfg.reorder_window
    deg_col = 3 + 3 * K + A + 4  # build_row_table degree column

    t_id = pl.program_id(0)
    # tile lists are padded to CE-multiples so every DMA start is aligned
    # to the (8, 128) HBM tiling
    start = pl.multiple_of(starts_ref[t_id], CE)
    length = lens_ref[t_id]
    tx = t_id % ntx
    ty = t_id // ntx

    origin = (cam_ref[0], cam_ref[1], cam_ref[2])
    cam9 = tuple(cam_ref[i] for i in range(3, 12))
    intrin = tuple(cam_ref[i] for i in range(12, 16))

    n_chunks = pl.cdiv(length, CE)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * CE, CE)],
            buf.at[slot],
            sems.at[slot],
        )

    # empty-tile skip: tiles with no binned cells (background outside
    # every cell AABB) write a transparent output without paying for the
    # pixel camera, the SH basis, or the drain — on trained scenes a
    # large fraction of 1080p tiles is empty
    @pl.when(n_chunks == 0)
    def _():
        out_ref[0] = jnp.concatenate(
            [jnp.zeros((3, P), jnp.float32),
             jnp.zeros((1, P), jnp.float32)], axis=0
        )
        aux_ref[0] = jnp.zeros((1, P), jnp.float32)

    @pl.when(n_chunks > 0)
    def _live_tile():
        _composite_tile_body(
            cfg, K, A, width, height, has_dirs, use_bitonic, tx, ty,
            origin, cam9, intrin, dirs_ref, out_ref, aux_ref, buf,
            get_dma, start, length, n_chunks,
        )


def _composite_tile_body(cfg, K, A, width, height, has_dirs, use_bitonic,
                         tx, ty, origin, cam9, intrin, dirs_ref, out_ref,
                         aux_ref, buf, get_dma, start, length, n_chunks):
    TS = cfg.tile
    P = TS * TS
    CE = cfg.entry_chunk
    wt = cfg.weight_threshold
    Wbuf = cfg.reorder_window
    deg_col = 3 + 3 * K + A + 4  # build_row_table degree column

    if has_dirs:
        dir_rows = _grid_dir_rows(dirs_ref[0], cam9)
    else:
        dir_rows = _pixel_dir_rows(tx, ty, cam9, intrin,
                                   width=width, height=height, tile=TS)
    basis = _sh_basis_rows(*dir_rows, cfg.sh_degree)

    get_dma(0, 0).start()

    def body(state):
        c = state[0]
        bst = state[1:]

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(c % 2, c).wait()
        # f16 tables: upcast on the VPU before the MXU transpose (f32
        # identity contraction) — the DMA already banked the bandwidth win
        chunk_t = _mxu_transpose(
            buf[c % 2].astype(jnp.float32)
        )  # (Wrow, CE)
        pre = _chunk_precompute(chunk_t, origin, basis, K, A)
        # chunk-max degree gates the plane-block skip (exact: blocks
        # past the max degree hold only padding planes)
        degm_c = jnp.max(chunk_t[deg_col : deg_col + 1])

        if Wbuf == 0:
            # list-order mode: whole-chunk closed-form composite (MXU
            # prefix) instead of 16 serialized state updates
            bst = _chunk_composite(
                bst, pre, dir_rows, chunk_t, deg_col, length - c * CE,
                wt, CE, degm_c,
            )
        else:
            # exact-order mode: batch sorted-merge against the pending
            # set (the per-entry reorder buffer's vectorized equivalent)
            bst = _sorted_chunk_composite(
                bst, pre, dir_rows, chunk_t, deg_col, length - c * CE,
                wt, CE, use_bitonic, degm_c,
                merge_chunk=cfg.merge_chunk,
            )

        return (c + 1,) + bst

    def cond(state):
        c, T = state[0], state[6]
        return (c < n_chunks) & (jnp.max(T) > wt)

    if Wbuf > 0:
        # pending-set init for the sorted merge: free slots (od = 0,
        # dead key) flush through the first merge with zero weight
        CM = cfg.merge_chunk or CE
        z = jnp.zeros((CM, P), jnp.float32)
        binit = (jnp.full((CM, P), _DEAD_KEY, jnp.float32), z, z, z, z,
                 jnp.ones((1, P), jnp.float32),
                 jnp.zeros((1, P), jnp.float32),
                 jnp.zeros((1, P), jnp.float32),
                 jnp.zeros((1, P), jnp.float32),
                 jnp.zeros((1, P), jnp.float32))
    else:
        binit = _buffer_init(P, 1)
    state0 = (jnp.int32(0),) + binit
    state = jax.lax.while_loop(cond, body, state0)
    c_f = state[0]
    bst = state[1:]

    # drain: an early exit leaves the next chunk's DMA in flight — wait on
    # it so the scratch/semaphore state is clean for the next grid step
    @pl.when(c_f < n_chunks)
    def _():
        get_dma(c_f % 2, c_f).wait()

    if Wbuf > 0:
        bst = _sorted_drain(bst, wt)
    T = bst[5]
    rgb_r, rgb_g, rgb_b, forced = bst[6], bst[7], bst[8], bst[9]
    out_ref[0] = jnp.concatenate(
        [rgb_r, rgb_g, rgb_b, 1.0 - T], axis=0
    )
    if cfg.stats:
        # processed-entry diagnostic: chunks consumed before early exit,
        # clamped to the tile's live list length (background tiles run
        # the grid's padded chunk bound without consuming entries)
        proc = jnp.minimum(
            c_f.astype(jnp.float32) * CE, length.astype(jnp.float32)
        )
        aux_ref[0] = jnp.zeros((1, P), jnp.float32) + proc
    else:
        aux_ref[0] = forced


def composite_pallas(rows, starts, lens, cam, *, width, height, cfg, K, A,
                     dir_grid=None):
    """Run the per-tile composite kernel over the whole frame.

    rows: (Mp + CE, W + 8) f32/f16 pre-gathered sorted cell rows
      (build_row_table layout: planar-SH pack + center/extent/degree) in
      the CE-ALIGNED per-tile layout (every tile's list starts at a
      multiple of entry_chunk).
    starts: (n_tiles + 1,) int32 aligned per-tile offsets into rows.
    lens: (n_tiles,) int32 true (unpadded) per-tile list lengths.
    cam: (16,) f32 [pos fwd rgt up ds pad...].
    dir_grid: optional (n_tiles, 8, P) camera-frame direction grid
      (ops/dirgrid) replacing the in-kernel affine pixel camera — exact
      for distorted/fisheye cameras.

    Returns ((n_tiles, 4, P) f32 rgba rows,
             (n_tiles, 1, P) f32 forced-pop diagnostic counts).
    """
    TS = cfg.tile
    ntx, nty = _grid_shape(width, height, TS)
    n_tiles = ntx * nty
    P = TS * TS
    Wrow = rows.shape[1]
    if cfg.merge_chunk and (
        cfg.merge_chunk > cfg.entry_chunk
        or cfg.entry_chunk % cfg.merge_chunk
    ):
        # a non-divisor slices a short final sub-merge block and fails
        # with an opaque shape error inside the bitonic network at trace
        # time — reject it here with a readable message instead
        raise ValueError(
            f"merge_chunk ({cfg.merge_chunk}) must divide entry_chunk "
            f"({cfg.entry_chunk})"
        )

    has_dirs = dir_grid is not None
    interpret = cfg.interpret or jax.default_backend() == "cpu"
    kernel = partial(_composite_kernel, cfg, K, A, width, height, ntx,
                     has_dirs, not interpret)

    dir_specs = (
        [pl.BlockSpec((1, 8, P), lambda t, *_: (t, 0, 0),
                      memory_space=pltpu.VMEM)]
        if has_dirs else []
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
        ] + dir_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 4, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cfg.entry_chunk, Wrow), rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # the Mosaic kernel only lowers for real TPUs; the CPU backend (unit
    # tests, virtual meshes) runs the interpreter automatically
    # (``interpret`` computed above, where it also selects the skip mode)
    args = (starts, lens, cam, rows) + (
        (dir_grid,) if has_dirs else ()
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 4, P), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, P), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# jnp reference composite (tests; python loop over tiles)


def composite_reference(rows_np, keys_np, starts_np, pos, fwd, rgt, up,
                        intrin, *, width, height, cfg, K, A,
                        dir_grid=None):
    """Pure-jnp per-tile composite using the exact same helper math as the
    Pallas kernel (python loop over tiles and entries). Test-only.

    rows_np must be in the PLANAR-SH raster pack layout.
    Returns ((n_tiles, 4, P) rgba rows, (n_tiles, P) forced-pop counts).
    """
    TS = cfg.tile
    ntx, nty = _grid_shape(width, height, TS)
    P = TS * TS
    out = np.zeros((ntx * nty, 4, P), np.float32)
    forced_out = np.zeros((ntx * nty, P), np.float32)
    wt = cfg.weight_threshold
    Wbuf = cfg.reorder_window
    key_col = 3 + 3 * K + A
    cam9 = tuple(
        jnp.float32(v) for v in (*np.asarray(fwd), *np.asarray(rgt),
                                 *np.asarray(up))
    )
    origin = tuple(jnp.float32(v) for v in np.asarray(pos))

    rows_np = np.asarray(rows_np)
    keys_np = np.asarray(keys_np)
    for t in range(ntx * nty):
        s, e = int(starts_np[t]), int(starts_np[t + 1])
        if dir_grid is not None:
            dir_rows = _grid_dir_rows(jnp.asarray(dir_grid[t]), cam9)
        else:
            dir_rows = _pixel_dir_rows(
                jnp.int32(t % ntx), jnp.int32(t // ntx), cam9,
                tuple(jnp.float32(v) for v in intrin),
                width=width, height=height, tile=TS,
            )
        basis = _sh_basis_rows(*dir_rows, cfg.sh_degree)
        bst = _buffer_init(P, max(Wbuf, 1))
        for i in range(s, e):
            col = jnp.asarray(
                np.concatenate([rows_np[i], keys_np[i : i + 1]])[:, None]
            )
            bst = _composite_step(
                bst, col, key_col, jnp.bool_(True), origin, dir_rows,
                basis, K, A, wt, Wbuf,
            )
        if Wbuf > 0:
            bst = _buffer_drain(bst, wt, Wbuf)
        T = bst[5]
        out[t, 0] = np.asarray(bst[6])[0]
        out[t, 1] = np.asarray(bst[7])[0]
        out[t, 2] = np.asarray(bst[8])[0]
        out[t, 3] = 1.0 - np.asarray(T)[0]
        forced_out[t] = np.asarray(bst[9])[0]
    return out, forced_out


# ---------------------------------------------------------------------------
# frame orchestration


def tiles_to_image(tiles, *, width, height, tile):
    """(n_tiles, C, tile*tile) -> (height, width, C) crop."""
    ntx, nty = _grid_shape(width, height, tile)
    C = tiles.shape[1]
    img = tiles.transpose(0, 2, 1).reshape(nty, ntx, tile, tile, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(nty * tile, ntx * tile, C)
    return img[:height, :width]


def image_to_tiles(img, *, width, height, tile):
    """Exact inverse of tiles_to_image: (height, width, C) ->
    (n_tiles, C, tile*tile), zero-padding the partial edge tiles."""
    ntx, nty = _grid_shape(width, height, tile)
    C = img.shape[-1]
    img = jnp.pad(
        img, ((0, nty * tile - height), (0, ntx * tile - width), (0, 0))
    )
    t = img.reshape(nty, tile, ntx, tile, C).transpose(0, 2, 1, 3, 4)
    return t.reshape(nty * ntx, tile * tile, C).transpose(0, 2, 1)


def pack_raster_planar(rpacked, K, A):
    """Reorder a pack_raster_table's SH block to planar (channel-major).

    [p | v | sh_interleaved(3D) sigma] -> [p | v | sh_r(D) sh_g(D) sh_b(D)
    sigma]. The kernel consumes the planar layout (contiguous per-channel
    columns after the chunk transpose).
    """
    D = (A - 1) // 3
    base = 3 + 3 * K
    sh = rpacked[:, base : base + 3 * D]
    planar = sh.reshape(-1, D, 3).transpose(0, 2, 1).reshape(-1, 3 * D)
    return jnp.concatenate(
        [rpacked[:, :base], planar, rpacked[:, base + 3 * D :]], axis=1
    )


def build_row_table(rpacked, bb_min, bb_max, *, sh_degree,
                    dtype=jnp.float32):
    """Static per-scene row table consumed by the composite kernel.

    Layout (W + 8 columns, W = 3 + 3K + A):
      [p_hi (3) | planes+attrs (W-3) | bb center (3) | extent norm (1) |
       degree (1) | p_lo (3)]

    Everything camera-dependent (the conservative depth key) is derived
    in-kernel from the stored center/extent, so this table is built ONCE
    per triangulation and the per-frame pipeline only bins, sorts, and
    gathers — no per-frame multi-GB table rewrites (measured ~60 ms/frame
    at 2M points before hoisting).

    A 2-byte ``dtype`` (bfloat16 on TPU — Mosaic rejects f16 scratch
    buffers on this stack) halves the frame's dominant HBM traffic (the
    bulk row gather + the kernel's DMA stream). float16 is LOSSLESS for
    the plane offsets (pack_raster_table rounds them through f16
    already); bfloat16 re-rounds them to 8 mantissa bits; cell
    positions keep ~22 mantissa bits via the hi/lo split (p = p_hi + p_lo,
    reconstructed in-kernel — the f32 path stores p_lo = 0 so the kernel
    is dtype-agnostic). Attr rounding matches the benchmark protocol's
    fp16 attribute mode (reference benchmark.py:95-139).
    """
    N, W = rpacked.shape
    A = 1 + 3 * (sh_degree + 1) ** 2
    K = (W - 3 - A) // 3
    planar = pack_raster_planar(rpacked, K, A)
    deg = jnp.sum(
        (rpacked[:, 3 : 3 + K] != 0.0)
        | (rpacked[:, 3 + K : 3 + 2 * K] != 0.0)
        | (rpacked[:, 3 + 2 * K : 3 + 3 * K] != 0.0),
        axis=1,
    ).astype(jnp.float32)
    center = 0.5 * (bb_min + bb_max).astype(jnp.float32)
    e_norm = jnp.linalg.norm(
        0.5 * (bb_max - bb_min).astype(jnp.float32), axis=-1, keepdims=True
    )
    p = planar[:, :3]
    if jnp.dtype(dtype).itemsize == 2:
        # f16 halves bytes but Mosaic rejects f16 VMEM scratch on this
        # stack; bfloat16 is TPU-native and lowers — same hi/lo split
        # restores ~16 mantissa bits on positions either way
        p_hi = p.astype(dtype).astype(jnp.float32)
        p_lo = p - p_hi
    else:
        p_hi = p
        p_lo = jnp.zeros_like(p)
    table = jnp.concatenate(
        [p_hi, planar[:, 3:], center, e_norm, deg[:, None], p_lo], axis=1
    ).astype(dtype)
    # Mosaic DMA slices must be 128-aligned along lanes
    W_pad = -(-table.shape[1] // 128) * 128
    return jnp.pad(table, ((0, 0), (0, W_pad - table.shape[1])))


def relayout_pairs(cell_s, starts, *, width, height, cfg, tile_caps=None,
                   mp_cap=0):
    """Re-layout sorted pairs so every tile list starts CE-aligned.

    Mosaic DMA slice starts must honor the (8, 128) HBM tiling, so each
    tile's entry list is padded up to a multiple of ``cfg.entry_chunk``.
    Uses the same scatter-max + running-max expansion trick as binning
    (jnp.repeat lowers to a binary-search gather — measured ~250 ms at 4M
    pairs). Returns (cell_p (Mp,) int32 gather indices, nstarts
    (n_tiles+1,) aligned offsets, lens (n_tiles,) true lengths).

    tile_caps: optional (n_tiles,) int32 PER-TILE list caps (ragged
    layout), with ``mp_cap`` the static total row capacity. This is the
    consumption-sized gather: a sizing pass measures how deep the
    composite's early exit actually consumes each tile's list
    (size_tile_caps), and the timed pass then gathers only that prefix
    (+margin) instead of every binned pair — the composite never reads
    past its exit point, so the image is bit-identical while the gather
    shrinks from all pairs to ~consumed rows (measured 16x fewer at the
    2M bench scene). Callers must verify nstarts[-1] <= mp_cap (overflow
    would silently clip the deepest tiles).
    """
    CE = cfg.entry_chunk
    ntx, nty = _grid_shape(width, height, cfg.tile)
    n_tiles = ntx * nty
    M = cell_s.shape[0]
    lens_src = starts[1:] - starts[:-1]  # (T,) spacing in the sorted stream
    if tile_caps is None and cfg.tile_list_cap > 0:
        # keep each tile's nearest `cap` cells (depth-sorted prefix) —
        # the padded buffer then has a scene-independent static bound AND
        # a uniform stride: tile t owns [t*cap_pad, (t+1)*cap_pad). That
        # kills the Mp-length prefix scans the ragged layout needs below
        # (two log-pass cumsums ~ 25-30 ms at 1080p — more than the row
        # gather they fed).
        cap_pad = -(-cfg.tile_list_cap // CE) * CE
        lens = jnp.minimum(lens_src, cfg.tile_list_cap)
        Mp = n_tiles * cap_pad
        # Each tile's slice of the sorted stream is CONSECUTIVE, so the
        # copy is a segment move, not a random gather. TPU gathers are
        # row-rate bound (~45 M rows/s — a per-element take() here
        # measured 30 ms, 2x the row gather it feeds), so gather GW
        # consecutive elements per row instead: two grouped row takes
        # (the tile offset straddles a group boundary) plus GW static
        # shift-selects reassemble every segment at 1/GW the row count.
        GW = 8
        n_grp = cap_pad // GW
        Mg = -(-M // GW)
        cs8 = jnp.pad(cell_s, (0, Mg * GW - M)).reshape(Mg, GW)
        o = (
            starts[:-1, None]
            + jnp.arange(n_grp, dtype=jnp.int32)[None, :] * GW
        )  # (T, n_grp) segment offsets into the sorted stream
        q = jnp.minimum(o // GW, Mg - 1)
        A = jnp.take(cs8, q.reshape(-1), axis=0)
        B = jnp.take(cs8, jnp.minimum(q + 1, Mg - 1).reshape(-1), axis=0)
        C = jnp.concatenate([A, B], axis=1).reshape(
            n_tiles, n_grp, 2 * GW
        )
        r_t = (starts[:-1] % GW)[:, None, None]  # (T, 1, 1) phase
        picked = C[:, :, 0:GW] * (r_t == 0)
        for r in range(1, GW):
            picked = picked + C[:, :, r : r + GW] * (r_t == r)
        slot = jnp.broadcast_to(
            jnp.arange(cap_pad, dtype=jnp.int32)[None, :],
            (n_tiles, cap_pad),
        )
        valid = slot < lens[:, None]
        cell_p = jnp.where(
            valid, picked.reshape(n_tiles, cap_pad), 0
        ).reshape(Mp)
        nstarts = (
            jnp.arange(n_tiles + 1, dtype=jnp.int32) * cap_pad
        )
        return cell_p, nstarts, lens
    if tile_caps is not None:
        if mp_cap <= 0:
            raise ValueError("tile_caps requires a static mp_cap > 0")
        lens = jnp.minimum(lens_src, tile_caps)
        Mp = int(mp_cap)
    else:
        lens = lens_src
        Mp = cfg.max_pairs + CE * n_tiles  # static worst-case capacity
    plens = -(-lens // CE) * CE
    nstarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(plens).astype(jnp.int32)]
    )
    # gather-style: every output slot j pulls its pair from
    # src = j - shift(j), where shift is the cumulative padding inserted
    # by earlier tiles (constant within a tile, so it prefix-sums from
    # one narrow scatter at the tile boundaries). A second boundary
    # scatter marks each tile's padding region [nstarts[t] + lens[t],
    # nstarts[t+1]). Monotonic GATHERS replace the previous Mp-wide
    # scatter, which XLA serialized (measured 65 ms of index work at a
    # 4.2M cap — ~40x off memory speed-of-light for ~100 MB of traffic).
    # shift delta per tile = padded length minus SOURCE spacing (negative
    # when tile_list_cap truncated the tile's list)
    pad_amt = (plens - lens_src).astype(jnp.int32)
    shift = jnp.cumsum(
        jnp.zeros((Mp,), jnp.int32).at[nstarts[1:]].add(
            pad_amt, mode="drop"
        )
    )
    pad_edges = (
        jnp.zeros((Mp,), jnp.int32)
        .at[nstarts[:-1] + lens].add(1, mode="drop")
        .at[nstarts[1:]].add(-1, mode="drop")
    )
    j = jnp.arange(Mp, dtype=jnp.int32)
    valid = (jnp.cumsum(pad_edges) == 0) & (j < nstarts[-1])
    src = jnp.minimum(j - shift, M - 1)
    cell_p = jnp.where(valid, jnp.take(cell_s, src), 0)
    return cell_p, nstarts, lens


def render_frame(rows_table, bb_min, bb_max, density, pos, fwd, rgt, up,
                 fov, *, width, height, cfg, dir_grid=None, pad_px=0.0,
                 intrin=None):
    """Full raster render: bin + sort + gather + Pallas composite.

    rows_table: (N, W + 8) build_row_table output — the static per-scene
      row table (planar pack + bb center/extent/degree columns).
    bb_min/bb_max: (N, 3) cell AABBs (cellbound.cell_bounds, ideally
      clamped with cellbound.clamp_bounds — MUST be the same bounds the
      table was built with, or the kernel's depth keys diverge from the
      sort order).
    density: (N,) activated densities (alpha culling input).
    dir_grid/pad_px: exact camera path (ops/dirgrid) — per-tile
      camera-frame directions for the composite, and the conservative
      binning margin of the affine approximation.
    intrin: optional (ax, bx, ay, by) overriding the fov-derived
      intrinsics (dataset cameras; under cfg.cam_model=FISHEYE pass
      (fov, 0, 0, 0)).

    Returns ((H, W, 4) f32 rgba image, n_pairs, forced-pop count).
    """
    N, Wt = rows_table.shape
    # layout: W + 8 used columns (W = 3 + 3K + A) padded to 128; the pad
    # hides K, so the scene's adjacency width rides in cfg.table_k
    A = 1 + 3 * (cfg.sh_degree + 1) ** 2
    K = cfg.table_k
    if K <= 0:
        raise ValueError(
            "cfg.table_k must carry the scene's adjacency width "
            "(nbr_idx.shape[1])"
        )
    if -(-(3 + 3 * K + A + 8) // 128) * 128 != Wt:
        raise ValueError(
            f"rows_table width {Wt} inconsistent with table_k={K}"
        )

    if intrin is None:
        intrin = fov_intrin(fov, width=width, height=height)
    cell_s, key_cell, starts, n_pairs = bin_pairs(
        bb_min, bb_max, density, pos, fwd, rgt, up, intrin,
        width=width, height=height, cfg=cfg, pad_px=pad_px,
    )

    cell_p, nstarts, lens = relayout_pairs(
        cell_s, starts, width=width, height=height, cfg=cfg
    )

    # ONE gather from the static table into the aligned per-tile layout —
    # the only per-frame touch of row data
    rows = jnp.take(rows_table, cell_p, axis=0)
    cam = jnp.concatenate(
        [pos, fwd, rgt, up] + [jnp.reshape(v, (1,)) for v in intrin]
    ).astype(jnp.float32)
    tiles, forced = composite_pallas(
        rows, nstarts, lens, cam,
        width=width, height=height, cfg=cfg, K=K, A=A, dir_grid=dir_grid,
    )
    img = tiles_to_image(tiles, width=width, height=height, tile=cfg.tile)
    return img, n_pairs, jnp.sum(forced)


render_frame = partial(
    jax.jit, static_argnames=("width", "height", "cfg")
)(render_frame)


@lru_cache(maxsize=8)
def _staged_fns(width, height, cfg, K, A, has_dirs, mp_cap=0):
    bin_j = jax.jit(
        partial(bin_pairs, width=width, height=height, cfg=cfg)
    )

    @jax.jit
    def gather_j(rows_table, cell_s, starts, tile_caps=None):
        cell_p, nstarts, lens = relayout_pairs(
            cell_s, starts, width=width, height=height, cfg=cfg,
            tile_caps=tile_caps, mp_cap=mp_cap,
        )
        return jnp.take(rows_table, cell_p, axis=0), nstarts, lens

    @jax.jit
    def comp_j(rows, nstarts, lens, cam, dir_grid=None):
        tiles, forced = composite_pallas(
            rows, nstarts, lens, cam,
            width=width, height=height, cfg=cfg, K=K, A=A,
            dir_grid=dir_grid,
        )
        img = tiles_to_image(
            tiles, width=width, height=height, tile=cfg.tile
        )
        # stats mode reports the PER-TILE consumption vector (cap-sizing
        # input, size_tile_caps); otherwise the forced-pop total
        aux = forced[:, 0, 0] if cfg.stats else jnp.sum(forced)
        return img, aux

    return bin_j, gather_j, comp_j


def render_frame_staged(rows_table, bb_min, bb_max, density, pos, fwd,
                        rgt, up, fov, *, width, height, cfg,
                        dir_grid=None, pad_px=0.0, intrin=None,
                        tile_caps=None, mp_cap=0, cam_packed=None):
    """render_frame split into three chained jits (bin / gather /
    composite).

    Semantically identical to render_frame and still fully async (each
    stage dispatches without host sync, so frames pipeline the same), but
    each executable's peak HBM is bounded by its own stage — a fresh XLA
    compile of the single fused frame graph at 2M points can land a
    memory plan that exceeds the 16 GB v5e HBM, while the staged pieces
    compile and fit reliably. Use this for big scenes; render_frame
    remains the one-call path for everything else.

    ``cam_packed`` (with ``intrin``) lets a caller hoist the per-pose
    16-float camera vector out of a timed loop: on a tunnel-attached
    device every tiny helper op (intrinsics math, reshape, concatenate)
    is its own host->device dispatch, and on a single-core host those
    ~10 dispatches per frame can rival the three real stage launches.
    """
    N, Wt = rows_table.shape
    A = 1 + 3 * (cfg.sh_degree + 1) ** 2
    K = cfg.table_k
    if K <= 0:
        raise ValueError(
            "cfg.table_k must carry the scene's adjacency width"
        )
    if -(-(3 + 3 * K + A + 8) // 128) * 128 != Wt:
        raise ValueError(
            f"rows_table width {Wt} inconsistent with table_k={K}"
        )
    bin_j, gather_j, comp_j = _staged_fns(
        width, height, cfg, K, A, dir_grid is not None, int(mp_cap)
    )
    if intrin is None:
        intrin = fov_intrin(
            jnp.asarray(fov, jnp.float32), width=width, height=height
        )
    cell_s, _key, starts, n_pairs = bin_j(
        bb_min, bb_max, density, pos, fwd, rgt, up, intrin,
        pad_px=jnp.asarray(pad_px, jnp.float32),
    )
    if tile_caps is None:
        rows, nstarts, lens = gather_j(rows_table, cell_s, starts)
    else:
        rows, nstarts, lens = gather_j(rows_table, cell_s, starts,
                                       tile_caps)
    if cam_packed is None:
        cam = jnp.concatenate(
            [pos, fwd, rgt, up]
            + [jnp.reshape(jnp.asarray(v, jnp.float32), (1,))
               for v in intrin]
        )
    else:
        cam = cam_packed
    if dir_grid is None:
        img, forced = comp_j(rows, nstarts, lens, cam)
    else:
        img, forced = comp_j(rows, nstarts, lens, cam, dir_grid)
    return img, n_pairs, forced


def visibility_compact(points, attrs, nbr_idx, bb_min, bb_max, density,
                       alpha_cull):
    """Scene-static visibility compaction (host-side, numpy).

    ``alpha_cull`` is camera-independent — sigma * 2R < cull means the
    cell is invisible from EVERY pose — so the culled set can be decided
    once per scene instead of re-filtered inside every frame's binning.
    Reorders the scene so all potentially-visible cells come first and
    returns the permuted arrays plus n_visible; callers then hand
    bin_pairs only the first n_visible rows of bb_min/bb_max/density
    (cell ids stay valid: they index the equally-permuted row table).
    At the 2M trained-like bench scene this shrinks every N-proportional
    binning pass 4x (530k of 2.1M cells survive the cull).

    Returns (points, attrs, nbr_idx, bb_min, bb_max, density, n_visible),
    all permuted copies; nbr_idx is remapped through the permutation
    (self-index padding maps to the new self-index automatically).
    """
    points = np.asarray(points)
    attrs = np.asarray(attrs)
    nbr_idx = np.asarray(nbr_idx)
    bb_min = np.asarray(bb_min)
    bb_max = np.asarray(bb_max)
    density = np.asarray(density)
    e_norm = np.linalg.norm(0.5 * (bb_max - bb_min), axis=-1)
    keep = (density * (2.0 * e_norm) >= alpha_cull) & (e_norm > 0)
    order = np.argsort(~keep, kind="stable").astype(np.int32)
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0], dtype=np.int32)
    return (points[order], attrs[order], inv[nbr_idx[order]],
            bb_min[order], bb_max[order], density[order],
            int(keep.sum()))


def size_tile_caps(frames, render_sz, entry_chunk, margin_chunks=1,
                   pair_margin=1.3):
    """Derive per-pose PER-TILE gather caps from a stats-mode sizing pass.

    render_sz must run the staged render with generous caps and
    cfg.stats=True so its aux channel is the per-tile consumed-entry
    vector. For each pose this returns caps = consumed + margin (entry-
    chunk aligned) — the composite deterministically consumes the same
    list prefix on the timed pass, so gathering only that prefix is
    exact. Also returns the static total row capacity mp_cap (max over
    poses of the summed aligned caps) and each pose's sizing image so
    callers can assert the capped render is unchanged.

    Returns (tile_caps_list [(n_tiles,) i32 per pose], mp_cap, max_pairs,
    images [np arrays per pose]).
    """
    ce = int(entry_chunk)
    caps_list, imgs = [], []
    mp_cap, max_np = 0, 0
    for f in frames:
        img, n_pairs, proc = render_sz(*f)
        proc = np.asarray(jax.device_get(proc)).astype(np.int64)
        imgs.append(np.asarray(jax.device_get(img)))
        max_np = max(max_np, int(jax.device_get(n_pairs)))
        caps = (-(-proc // ce) + int(margin_chunks)) * ce
        caps_list.append(caps.astype(np.int32))
        mp_cap = max(mp_cap, int(caps.sum()))
    # binning is deterministic per (scene, pose), and callers hard-fail
    # on overflow, so the margin only covers caller-side pose jitter;
    # the static cap sizes the sort, the binning's dominant cost
    max_pairs = -(-int(pair_margin * max_np) // ce) * ce
    return caps_list, int(mp_cap), max_pairs, imgs


def size_caps(frames, render_sz, entry_chunk):
    """Derive per-scene (max_pairs, tile_list_cap) from a sizing pass.

    The reference sizes its per-ray intersection buffer with a fixed
    max_intersections (pipeline.h:15-19) and benchmarks arbitrary trained
    checkpoints (benchmark.py:22-139); capacities here are measured per
    scene instead of hand-tuned: ``render_sz`` must be the staged render
    under a GENEROUS config (large max_pairs, tile_list_cap=0, stats=True)
    so its aux channel reports per-tile consumed entries. Every pose in
    ``frames`` is binned; the returned caps are

    - max_pairs: the measured pose maximum + 30%, entry-chunk aligned;
    - tile_list_cap: 2x the deepest early-exit consumption (the composite
      never reads past its exit point, so 2x headroom bounds truncation).
    """
    max_np, max_proc = 0, 0
    for f in frames:
        _img, n_pairs, proc = render_sz(*f)
        max_np = max(max_np, int(jax.device_get(n_pairs)))
        max_proc = max(
            max_proc, int(np.max(np.asarray(jax.device_get(proc))))
        )
    ce = int(entry_chunk)
    max_pairs = -(-int(1.3 * max_np) // ce) * ce
    tile_list_cap = max(-(-2 * max_proc // ce) * ce, 2 * ce)
    return max_pairs, tile_list_cap


def build_scene_table(points, attrs, nbr_idx, bb_min, bb_max, *,
                      sh_degree, dtype=jnp.float32, chunks=None,
                      with_nbr_ids=False):
    """Fused one-pass equivalent of
    build_row_table(pack_raster_table(...), ...).

    The two-step path materializes the interleaved pack (2.1 GB at 2M
    points), the planar reorder (another 2.1 GB), the concat, and the pad
    — ~13 GB of transient HBM, which does not reliably fit next to the
    scene on a 16 GB chip. This builder emits the final (N, Wpad) layout
    in ONE concatenate whose operands are fused producers (neighbor
    offsets, channel-major SH slices), cutting peak to ~7 GB.
    Bit-identical to the two-step path (tested).

    ``chunks``: split the build into a remat'd lax.map over point blocks.
    Under AUTODIFF the concat's narrow (N, 1..72) operands become
    residuals that TPU tiled layouts pad to (N, 128) — ~1 GB each at 2M
    points regardless of logical width (measured 45% HBM utilization in
    the train step). Chunking bounds them to one block at a time; the
    inference path (no autodiff) fuses them and needs no chunking.
    """
    if chunks is not None and chunks > 1:
        N = points.shape[0]
        if N % chunks == 0:
            n = N // chunks

            @jax.checkpoint
            def piece(args):
                pts_c, attrs_c, nbr_c, bmin_c, bmax_c = args
                return _build_block(
                    points, pts_c, attrs_c, nbr_c, bmin_c, bmax_c,
                    dtype=dtype, with_nbr_ids=with_nbr_ids,
                )

            blocks = jax.lax.map(
                piece,
                (
                    points.reshape(chunks, n, 3),
                    attrs.reshape(chunks, n, -1),
                    nbr_idx.reshape(chunks, n, -1),
                    bb_min.reshape(chunks, n, 3),
                    bb_max.reshape(chunks, n, 3),
                ),
            )
            return blocks.reshape(N, blocks.shape[-1])
    return _build_block(points, points, attrs, nbr_idx, bb_min, bb_max,
                        dtype=dtype, with_nbr_ids=with_nbr_ids)


def _build_block(all_points, points, attrs, nbr_idx, bb_min, bb_max, *,
                 dtype, with_nbr_ids=False):
    """One block of build_scene_table (points etc. are the block's rows;
    all_points backs the neighbor gather)."""
    all_points = all_points.astype(jnp.float32)
    points = points.astype(jnp.float32)
    attrs = attrs.astype(jnp.float32)
    N, K = nbr_idx.shape
    A = attrs.shape[1]
    D = (A - 1) // 3

    q = jnp.take(all_points, nbr_idx, axis=0)  # (N, K, 3)
    off = (q - points[:, None, :]).astype(jnp.float16).astype(jnp.float32)
    deg = jnp.sum(
        jnp.any(off != 0.0, axis=-1), axis=1
    ).astype(jnp.float32)[:, None]
    # channel-major SH: attrs[:, :-1] is (N, D, 3) coefficient-major
    sh_planar = (
        attrs[:, : 3 * D].reshape(N, D, 3).transpose(0, 2, 1).reshape(
            N, 3 * D
        )
    )
    center = 0.5 * (bb_min + bb_max).astype(jnp.float32)
    e_norm = jnp.linalg.norm(
        0.5 * (bb_max - bb_min).astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    if jnp.dtype(dtype).itemsize == 2:
        p_hi = points.astype(dtype).astype(jnp.float32)
        p_lo = points - p_hi
    else:
        p_hi = points
        p_lo = jnp.zeros_like(points)
    # training tables carry neighbor ids (exact in f32 for N < 2^24) so
    # the backward kernel can emit per-plane gradients addressed by point
    # — for K=72/sh3 they fit inside the existing 128-pad for free
    nbr_cols = (
        [jax.lax.stop_gradient(nbr_idx).astype(jnp.float32)]
        if with_nbr_ids else []
    )
    W_used = 3 + 3 * K + A + 8 + (K if with_nbr_ids else 0)
    W_pad = -(-W_used // 128) * 128
    table = jnp.concatenate(
        [
            p_hi,
            off[..., 0],
            off[..., 1],
            off[..., 2],
            sh_planar,
            attrs[:, -1:],
            center,
            e_norm,
            deg,
            p_lo,
        ]
        + nbr_cols
        + [jnp.zeros((N, W_pad - W_used), jnp.float32)],
        axis=1,
    ).astype(dtype)
    return table
