"""Triangulation invariants the reference enforces at runtime (SURVEY.md §4):
Delaunay empty-circumsphere property, CSR symmetry, duplicate detection,
permutation bookkeeping."""

import numpy as np
import pytest

from radfoam_tpu.delaunay import Triangulation, TriangulationFailedError
from radfoam_tpu.delaunay.api import tets_to_point_adjacency
from radfoam_tpu.ops.adjacency import csr_to_padded, padded_to_csr


def make_points(rng, n=200):
    return rng.normal(size=(n, 3)).astype(np.float32)


def test_all_points_have_neighbors(rng):
    tri = Triangulation(make_points(rng))
    offsets = tri.point_adjacency_offsets().astype(np.int64)
    degrees = offsets[1:] - offsets[:-1]
    assert (degrees > 0).all()


def test_adjacency_symmetry(rng):
    tri = Triangulation(make_points(rng))
    adj = tri.point_adjacency().astype(np.int64)
    offsets = tri.point_adjacency_offsets().astype(np.int64)
    n = offsets.shape[0] - 1
    degrees = offsets[1:] - offsets[:-1]
    src = np.repeat(np.arange(n), degrees)
    fwd = set(map(tuple, np.stack([src, adj], axis=1)))
    bwd = set(map(tuple, np.stack([adj, src], axis=1)))
    assert fwd == bwd


def test_neighbors_sorted_within_row(rng):
    tri = Triangulation(make_points(rng))
    adj = tri.point_adjacency().astype(np.int64)
    offsets = tri.point_adjacency_offsets().astype(np.int64)
    for i in range(0, offsets.shape[0] - 1, 17):
        row = adj[offsets[i] : offsets[i + 1]]
        assert (np.diff(row) > 0).all()


def test_empty_circumsphere_property(rng):
    """Sampled tets must have (near-)empty circumspheres — the defining
    Delaunay invariant (reference exact_tree_ops.cuh:128-282)."""
    pts = make_points(rng, 120).astype(np.float64)
    tri = Triangulation(pts)
    order = tri.permutation()
    sorted_pts = pts[order]
    tets = tri.tets()
    take = rng.choice(tets.shape[0], size=min(50, tets.shape[0]), replace=False)
    for t in tets[take]:
        a, b, c, d = sorted_pts[t]
        # circumcenter via linear system
        A = 2 * np.stack([b - a, c - a, d - a])
        rhs = np.array(
            [b @ b - a @ a, c @ c - a @ a, d @ d - a @ a]
        )
        center = np.linalg.solve(A, rhs)
        r2 = np.sum((a - center) ** 2)
        d2 = np.sum((sorted_pts - center) ** 2, axis=1)
        inside = d2 < r2 * (1 - 1e-9)
        inside[t] = False
        assert inside.sum() == 0


def test_duplicates_raise(rng):
    pts = make_points(rng, 64)
    pts[10] = pts[50]
    with pytest.raises(TriangulationFailedError):
        Triangulation(pts)


def test_min_points_enforced(rng):
    with pytest.raises(ValueError):
        Triangulation(make_points(rng, 8))


def test_incremental_keeps_order(rng):
    pts = make_points(rng)
    tri = Triangulation(pts)
    sorted_pts = pts[tri.permutation()]
    moved = sorted_pts + rng.normal(size=sorted_pts.shape).astype(
        np.float32
    ) * 1e-3
    resorted = tri.rebuild(moved, incremental=True)
    assert resorted is False
    # adjacency indices refer to the given (unsorted) order
    adj = tri.point_adjacency()
    assert adj.max() < pts.shape[0]


def test_full_rebuild_returns_sorted(rng):
    pts = make_points(rng)
    tri = Triangulation(pts)
    assert tri.permutation() is not None
    resorted = tri.rebuild(pts, incremental=False)
    assert resorted is True


def test_csr_padded_roundtrip(rng):
    tri = Triangulation(make_points(rng))
    adj = tri.point_adjacency()
    offsets = tri.point_adjacency_offsets()
    table = csr_to_padded(adj, offsets)
    adj2, offsets2 = padded_to_csr(table)
    np.testing.assert_array_equal(adj.astype(np.int64), adj2)
    np.testing.assert_array_equal(offsets.astype(np.int64), offsets2)


def test_tets_to_adjacency_simple():
    # two tets sharing a face (0,1,2)
    tets = np.array([[0, 1, 2, 3], [0, 1, 2, 4]])
    adj, offsets = tets_to_point_adjacency(tets, 5)
    # point 0 neighbors: 1,2,3,4
    np.testing.assert_array_equal(adj[offsets[0] : offsets[1]], [1, 2, 3, 4])
    # point 3 neighbors: 0,1,2 (not 4)
    np.testing.assert_array_equal(adj[offsets[3] : offsets[4]], [0, 1, 2])


def test_incremental_revalidate_skips_and_rebuilds(rng):
    """The native incremental path: unchanged/slightly-moved points that
    keep the topology Delaunay reuse the triangulation; larger motion
    triggers a rebuild whose adjacency matches a fresh build."""
    from radfoam_tpu.delaunay.native import load_native_backend

    backend = load_native_backend()
    if backend is None:
        pytest.skip("native backend unavailable")

    pts = make_points(rng, 400)
    tri = Triangulation(pts, backend=backend)
    sorted_pts = pts[tri.permutation()]
    adj0 = tri.point_adjacency().copy()

    # zero motion: must reuse (identical CSR object contents)
    assert tri.rebuild(sorted_pts, incremental=True) is False
    np.testing.assert_array_equal(tri.point_adjacency(), adj0)

    def reference_adjacency(points):
        # same-order ground truth via an independent full build (Qhull)
        from radfoam_tpu.delaunay.api import _ScipyBackend

        tets = _ScipyBackend().triangulate(points)
        return tets_to_point_adjacency(tets, points.shape[0])

    # tiny motion: topology normally survives — either way the CSR must be
    # the exact Delaunay adjacency of the moved points
    moved = sorted_pts + rng.normal(size=sorted_pts.shape).astype(
        np.float32
    ) * 1e-7
    tri.rebuild(moved, incremental=True)
    adj_ref, off_ref = reference_adjacency(moved)
    np.testing.assert_array_equal(tri.point_adjacency(), adj_ref)
    np.testing.assert_array_equal(tri.point_adjacency_offsets(), off_ref)

    # large motion: rebuild required, result must match the ground truth
    moved2 = sorted_pts + rng.normal(size=sorted_pts.shape).astype(
        np.float32
    ) * 0.3
    tri.rebuild(moved2, incremental=True)
    adj_ref2, off_ref2 = reference_adjacency(moved2)
    np.testing.assert_array_equal(tri.point_adjacency(), adj_ref2)
    np.testing.assert_array_equal(tri.point_adjacency_offsets(), off_ref2)


def test_incremental_repair_exactness():
    """foam_update's local repair must produce exactly the CSR of a full
    rebuild (the certificate guarantees global Delaunayness) across motion
    scales, and report repairs through last_update_stats (VERDICT r1 #3)."""
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.delaunay.native import load_native_backend

    backend = load_native_backend()
    if backend is None:
        pytest.skip("native backend unavailable")

    rng = np.random.default_rng(11)
    n = 8000
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tri = Triangulation(pts, backend=backend)
    pts = pts[tri.permutation()].copy()

    repaired_any = False
    for scale in (1e-6, 1e-4, 5e-4):
        moved = (
            pts + rng.standard_normal(pts.shape).astype(np.float32) * scale
        ).astype(np.float32)
        tri.rebuild(moved, incremental=True)
        stats = getattr(backend, "last_update_stats", (0, 0))
        repaired_any |= stats[0] > 0

        fresh = load_native_backend()
        _, adj, off = fresh.triangulate_with_adjacency(moved)
        np.testing.assert_array_equal(tri.point_adjacency(), adj)
        np.testing.assert_array_equal(tri.point_adjacency_offsets(), off)
        pts = moved
    assert repaired_any, "no motion scale exercised the repair path"


def test_native_cell_bounds_matches_numpy():
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.delaunay.native import load_native_backend
    from radfoam_tpu.ops.cellbound import cell_bounds

    backend = load_native_backend()
    if backend is None:
        pytest.skip("native backend unavailable")
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((2000, 3)).astype(np.float32)
    tri = Triangulation(pts, backend=backend)
    pts = pts[tri.permutation()]
    nb_min, nb_max, n_hull = tri.cell_bounds()
    pb_min, pb_max, p_hull = cell_bounds(pts, tri.tets())
    assert (n_hull == p_hull).all()
    # interiors must agree to f32 rounding; hull cells differ by design
    # (numpy fallback has no degenerate-fallback data; compare interiors)
    interior = ~n_hull
    np.testing.assert_allclose(
        nb_min[interior], pb_min[interior], atol=1e-4
    )
    np.testing.assert_allclose(
        nb_max[interior], pb_max[interior], atol=1e-4
    )


def test_incremental_repair_margin_cache_stress():
    """Many small sequential motions: the margin cache must keep every
    update exactly equal to a fresh rebuild (margins decay conservatively
    across scans and refresh exactly)."""
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.delaunay.native import load_native_backend

    backend = load_native_backend()
    if backend is None:
        pytest.skip("native backend unavailable")

    rng = np.random.default_rng(23)
    n = 3000
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tri = Triangulation(pts, backend=backend)
    pts = pts[tri.permutation()].copy()

    for step in range(10):
        moved = (
            pts + rng.standard_normal(pts.shape).astype(np.float32) * 3e-5
        ).astype(np.float32)
        tri.rebuild(moved, incremental=True)
        fresh = load_native_backend()
        _, adj, off = fresh.triangulate_with_adjacency(moved)
        np.testing.assert_array_equal(tri.point_adjacency(), adj)
        np.testing.assert_array_equal(tri.point_adjacency_offsets(), off)
        pts = moved


def test_incremental_repair_sparse_regime_reentry():
    """Regime transition stress (ADVICE r4 high): sparse motion (margin
    certs stored) -> NON-sparse motion (certs invalidated, most points move
    with no cert maintenance) -> sparse motion again. On re-entry the whole
    margin cache must be rebuilt from scratch; trusting resize()d stale rows
    could falsely certify non-Delaunay tets. Every update must stay exactly
    equal to a fresh rebuild."""
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.delaunay.native import load_native_backend

    backend = load_native_backend()
    if backend is None:
        pytest.skip("native backend unavailable")

    rng = np.random.default_rng(7)
    n = 4000
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tri = Triangulation(pts, backend=backend)
    pts = pts[tri.permutation()].copy()

    def verify(moved):
        tri.rebuild(moved, incremental=True)
        fresh = load_native_backend()
        _, adj, off = fresh.triangulate_with_adjacency(moved)
        np.testing.assert_array_equal(tri.point_adjacency(), adj)
        np.testing.assert_array_equal(tri.point_adjacency_offsets(), off)

    # phase 1: two sparse updates (move < n/16 points) -> certs stored
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        moved = pts.copy()
        idx = r.choice(n, size=n // 32, replace=False)
        moved[idx] += r.standard_normal((idx.size, 3)).astype(np.float32) * 1e-4
        verify(moved)
        pts = moved
    # phase 2: non-sparse update (ALL points move) -> certs invalidated,
    # and a second one so surviving tets' cached rows go doubly stale
    for seed in (3, 4):
        r = np.random.default_rng(seed)
        moved = (
            pts + r.standard_normal(pts.shape).astype(np.float32) * 2e-4
        ).astype(np.float32)
        verify(moved)
        pts = moved
    # phase 3: re-enter the sparse regime; stale-cache rows must NOT be
    # trusted (fix: cache zeroed on re-entry). Run two sparse updates so
    # the second actually USES certs stored by the first.
    for seed in (5, 6):
        r = np.random.default_rng(seed)
        moved = pts.copy()
        idx = r.choice(n, size=n // 32, replace=False)
        moved[idx] += r.standard_normal((idx.size, 3)).astype(np.float32) * 1e-4
        verify(moved)
        pts = moved
