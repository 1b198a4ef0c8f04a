"""Conservative per-cell Voronoi bounds for rasterization binning.

The tile rasterizer (ops/raster.py) bins each Voronoi cell into the screen
tiles its bounding sphere touches. The exact extent of a bounded Voronoi
cell is the farthest incident Voronoi vertex, i.e. the farthest circumcenter
of the site's incident Delaunay tets; hull cells are unbounded and get a
scene-scale clamp. Runs host-side once per triangulation rebuild (same
cadence as the reference's triangulation_ops.cu radius pass).

Reference parity anchor: the walk tracer needs no such bound (it follows
adjacency), so this component is new to the TPU design; its correctness
contract is "conservative": every point of cell i lies within
``radius[i]`` of ``points[i]`` (up to the hull clamp).
"""

import numpy as np


def tet_circumcenters(points, tets):
    """Circumcenters of tetrahedra, vectorized.

    Solves 2 (v_k - v_0) . x = |v_k|^2 - |v_0|^2 per tet by Cramer's rule.
    Degenerate (near-flat) tets fall back to the tet centroid with a large
    radius handled by the caller's clamp.

    Returns (cc (T, 3) float64, ok (T,) bool).
    """
    p = points.astype(np.float64)
    a = p[tets[:, 0]]
    ba = p[tets[:, 1]] - a
    ca = p[tets[:, 2]] - a
    da = p[tets[:, 3]] - a

    rb = 0.5 * np.einsum("ij,ij->i", ba, ba)
    rc = 0.5 * np.einsum("ij,ij->i", ca, ca)
    rd = 0.5 * np.einsum("ij,ij->i", da, da)

    cross_cd = np.cross(ca, da)
    cross_db = np.cross(da, ba)
    cross_bc = np.cross(ba, ca)
    det = np.einsum("ij,ij->i", ba, cross_cd)
    ok = np.abs(det) > 1e-30
    inv = 1.0 / np.where(ok, det, 1.0)
    cc = a + (
        rb[:, None] * cross_cd + rc[:, None] * cross_db
        + rd[:, None] * cross_bc
    ) * inv[:, None]
    return cc, ok


def hull_vertices(tets, num_points):
    """Boolean mask of points on the convex hull (unbounded Voronoi cells).

    A tet face is on the hull iff no second tet shares it; faces are packed
    into int64 keys for a fast unique count (works for N < 2^21).
    """
    faces = np.stack(
        [
            tets[:, [1, 2, 3]],
            tets[:, [0, 2, 3]],
            tets[:, [0, 1, 3]],
            tets[:, [0, 1, 2]],
        ],
        axis=1,
    ).reshape(-1, 3).astype(np.int64)
    faces.sort(axis=1)
    if num_points < (1 << 21):
        keys = (faces[:, 0] << 42) | (faces[:, 1] << 21) | faces[:, 2]
        _, first, counts = np.unique(
            keys, return_index=True, return_counts=True
        )
    else:
        _, first, counts = np.unique(
            faces, axis=0, return_index=True, return_counts=True
        )
    boundary = first[counts == 1]
    mask = np.zeros(num_points, bool)
    mask[faces[boundary].reshape(-1)] = True
    return mask


def cell_bounds(points, tets, num_points=None, degenerate_fallback=None):
    """Axis-aligned bounding box of every Voronoi cell's finite extent.

    A bounded Voronoi cell is the convex hull of its vertices (the
    circumcenters of its incident Delaunay tets), so the AABB of those
    vertices plus the site contains the cell exactly — a much tighter
    screen footprint than the bounding sphere (cell_radii), typically
    2-4x fewer (tile, cell) pairs. Near-degenerate tets contribute a
    +-``degenerate_fallback`` cube around the site; hull cells cover only
    their finite part (same wedge semantics as cell_radii).

    Returns (bb_min (C, 3) f32, bb_max (C, 3) f32, hull_mask (C,) bool).
    """
    points = np.asarray(points, dtype=np.float64)
    tets = np.asarray(tets)
    n = points.shape[0]
    cap = int(num_points) if num_points is not None else n
    if degenerate_fallback is None:
        used = points[: min(n, cap)]
        degenerate_fallback = float(
            np.linalg.norm(used.max(axis=0) - used.min(axis=0))
        )

    cc, ok = tet_circumcenters(points, tets)
    # segment min/max via argsort + reduceat (np.minimum.at is ~100x
    # slower at the 10M-tet scale)
    T = tets.shape[0]
    ids = tets.T.reshape(-1)  # (4T,) incidence: all of column k, then k+1
    site = points[ids]
    ccr = np.broadcast_to(cc, (4, T, 3)).reshape(-1, 3)
    okr = np.broadcast_to(ok, (4, T)).reshape(-1)
    lo = np.where(okr[:, None], ccr, site - degenerate_fallback)
    hi = np.where(okr[:, None], ccr, site + degenerate_fallback)
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    bounds_idx = np.flatnonzero(
        np.concatenate([[True], ids_s[1:] != ids_s[:-1]])
    )
    seg_ids = ids_s[bounds_idx]
    bb_min = np.full((cap, 3), np.inf)
    bb_max = np.full((cap, 3), -np.inf)
    bb_min[seg_ids] = np.minimum.reduceat(lo[order], bounds_idx, axis=0)
    bb_max[seg_ids] = np.maximum.reduceat(hi[order], bounds_idx, axis=0)
    # the site itself is inside its cell; padding rows collapse to a point
    upto = min(n, cap)
    bb_min[:upto] = np.minimum(bb_min[:upto], points[:upto])
    bb_max[:upto] = np.maximum(bb_max[:upto], points[:upto])
    bb_min[upto:] = 0.0
    bb_max[upto:] = 0.0

    hull = np.zeros(cap, bool)
    hull[:upto] |= hull_vertices(tets, upto)
    # directional f32 rounding keeps the cast conservative
    lo32 = np.nextafter(
        bb_min.astype(np.float32), np.float32(-np.inf)
    )
    hi32 = np.nextafter(
        bb_max.astype(np.float32), np.float32(np.inf)
    )
    return lo32, hi32, hull


def cell_radii(points, tets, num_points=None, degenerate_fallback=None):
    """Bounding radius of every Voronoi cell's *finite* extent.

    radius[i] = max distance from site i to an incident tet circumcenter —
    the exact farthest finite Voronoi vertex of cell i. Near-degenerate
    (flat) tets, whose circumcenter is numerically unreliable and far away,
    contribute ``degenerate_fallback`` (default: the scene bounding-box
    diagonal) instead. Hull cells are additionally unbounded; their radius
    only covers the finite part (the rasterizer documents dropping
    contributions in the unbounded wedges, where the walk also terminates).
    Padding rows past the real point count get 0.

    Returns (radius (C,) float32, hull_mask (C,) bool).
    """
    points = np.asarray(points, dtype=np.float64)
    tets = np.asarray(tets)
    n = points.shape[0]
    cap = int(num_points) if num_points is not None else n
    if degenerate_fallback is None:
        used = points[: min(n, cap)]
        lo = used.min(axis=0)
        hi = used.max(axis=0)
        degenerate_fallback = float(np.linalg.norm(hi - lo))

    cc, ok = tet_circumcenters(points, tets)
    radius = np.zeros(cap, np.float64)
    for k in range(4):
        idx = tets[:, k]
        d = np.linalg.norm(cc - points[idx], axis=1)
        d = np.where(ok, d, degenerate_fallback)
        np.maximum.at(radius, idx, d)

    hull = np.zeros(cap, bool)
    hull[: min(n, cap)] |= hull_vertices(tets, min(n, cap))
    return radius.astype(np.float32), hull


def clamp_bounds(points, bb_min, bb_max, k=8.0):
    """Clamp pathological cell AABBs to ``k`` x the robust extent scale.

    Thin sliver tets put Voronoi vertices enormously far from their sites
    (measured: p99 extent 6.2 vs p50 0.06, max 7e6 on a 2M trained-like
    foam), so a handful of needle cells bin into thousands of screen tiles
    and poison the front-to-back sort keys. Clamping the BINNING bound to
    a ball of radius k x median(half-extent) around each site drops only
    contributions farther than that from the site — regions where a
    transversal ray's path length (and thus alpha) is negligible. The
    interval math itself stays exact; this is the same bounded-error
    contract as ``alpha_cull``.

    Returns (bb_min', bb_max', clamp_radius).
    """
    points = np.asarray(points, np.float32)
    bb_min = np.asarray(bb_min, np.float32)
    bb_max = np.asarray(bb_max, np.float32)
    ext = 0.5 * (bb_max - bb_min)
    e_norm = np.linalg.norm(ext, axis=-1)
    live = e_norm > 0
    if not live.any():
        return bb_min, bb_max, 0.0
    scale = float(np.median(e_norm[live]))
    r = np.float32(k * scale)
    lo = np.maximum(bb_min, points - r)
    hi = np.minimum(bb_max, points + r)
    return lo, hi, float(r)
