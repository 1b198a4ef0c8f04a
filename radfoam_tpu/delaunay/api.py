"""Delaunay triangulation engine — the graph builder.

The reference maintains a 3D Delaunay triangulation incrementally on the GPU
with a sample-and-grow algorithm built on warp-cooperative searches and exact
float predicates (src/delaunay/delaunay.cu, exact_tree_ops.cuh,
shewchuk.cuh). On TPU there is no equivalent of that irregular,
data-dependent warp machinery, and the triangulation sits outside the jitted
hot path (it runs every 1..100 optimizer steps, train.py:243-249), so the
TPU-native design runs it as a *host-side* engine and ships the result to
the device as a padded neighbor table.

Backends:
  * ``native`` — the C++ engine in delaunay/native (incremental Bowyer-Watson
    with spatial ordering and adaptive-precision predicates), used when its
    shared library is available.
  * ``scipy`` — Qhull via scipy.spatial.Delaunay; full rebuilds only.

Semantics mirror the reference Triangulation interface
(src/delaunay/delaunay.h:15-44, triangulation_bindings.cpp:11-115):

  * ``rebuild(points, incremental)`` returns True iff the points were
    spatially re-sorted (callers must then apply ``permutation()`` to all
    per-point state, scene.py:191-193).
  * failures raise ``TriangulationFailedError`` (duplicate points, degenerate
    input, dropped vertices), which drives the retry-with-jitter ladder in
    the model layer (scene.py:160-189).
  * ``point_adjacency()`` / ``point_adjacency_offsets()`` expose the
    symmetric CSR over unique Delaunay edges, neighbors sorted by index
    (delaunay.cu:146-228).
"""

import numpy as np

from radfoam_tpu.utils.math import morton_argsort


class TriangulationFailedError(RuntimeError):
    """Reference: src/delaunay/delaunay.h:9-13."""


MIN_POINTS = 32  # reference delaunay.cu:277-280


def _to_numpy(points):
    arr = np.asarray(points, dtype=np.float32)
    if arr.ndim != 2 or arr.shape[1] != 3:
        raise ValueError(f"points must be (N, 3), got {arr.shape}")
    return arr


def tets_to_point_adjacency(simplices, num_points):
    """Extract the symmetric point-adjacency CSR from tetrahedra.

    Every tet contributes its 6 edges in both directions; duplicates are
    removed by a sort+unique over packed (src, dst) keys — the XLA/numpy
    equivalent of the reference's SortedMap dedup (delaunay.cu:146-228).

    Returns (adjacency (E,) uint32, offsets (N+1,) uint32).
    """
    simplices = np.asarray(simplices)
    pair_idx = np.array(
        [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
    )
    edges = simplices[:, pair_idx].reshape(-1, 2).astype(np.int64)
    keys = np.concatenate(
        [
            edges[:, 0] * num_points + edges[:, 1],
            edges[:, 1] * num_points + edges[:, 0],
        ]
    )
    keys = np.unique(keys)
    src = keys // num_points
    dst = keys % num_points
    counts = np.bincount(src, minlength=num_points)
    offsets = np.zeros(num_points + 1, dtype=np.uint32)
    np.cumsum(counts, out=offsets[1:])
    return dst.astype(np.uint32), offsets


class _ScipyBackend:
    """Full-rebuild backend on Qhull (scipy.spatial.Delaunay)."""

    name = "scipy"
    supports_incremental = False

    def triangulate(self, points):
        from scipy.spatial import Delaunay as SciDelaunay
        from scipy.spatial import QhullError

        try:
            tri = SciDelaunay(points.astype(np.float64))
        except QhullError as e:
            raise TriangulationFailedError(f"qhull failed: {e}") from e
        simplices = np.ascontiguousarray(tri.simplices, dtype=np.int32)
        # Every point must own a Voronoi cell: vertices Qhull merged or
        # classified coplanar are missing from the simplices, which the
        # reference treats as a failure (duplicate check, delaunay.cu:9-30).
        present = np.zeros(points.shape[0], dtype=bool)
        present[simplices.reshape(-1)] = True
        if not present.all():
            missing = int((~present).sum())
            raise TriangulationFailedError(
                f"{missing} points dropped from triangulation "
                "(duplicate or degenerate input)"
            )
        return simplices


def _default_backend():
    from radfoam_tpu.delaunay.native import load_native_backend

    backend = load_native_backend()
    if backend is not None:
        return backend
    return _ScipyBackend()


class Triangulation:
    """Host-side Delaunay triangulation with the reference's interface."""

    def __init__(self, points=None, backend=None):
        self._backend = backend or _default_backend()
        self._perm = None
        self._simplices = None
        self._adjacency = None
        self._offsets = None
        self._num_points = 0
        if points is not None:
            self.rebuild(points, incremental=False)

    def rebuild(self, points, incremental=False):
        """(Re)build the triangulation; returns True iff points were sorted.

        Full build: Morton-sort the points (replacing the reference's
        alternating-axis segmented sort, aabb_tree.cu:62-190), triangulate,
        extract adjacency. Incremental build (same point count): keep the
        existing order and repair/rebuild in place.
        """
        pts = _to_numpy(points)
        n = pts.shape[0]
        if n < MIN_POINTS:
            raise ValueError(f"triangulation needs >= {MIN_POINTS} points")

        incremental = (
            incremental
            and self._simplices is not None
            and n == self._num_points
        )

        if incremental and getattr(self._backend, "supports_incremental", False):
            self._simplices, self._adjacency, self._offsets, rebuilt = (
                self._backend.retriangulate_with_adjacency(pts)
            )
            if rebuilt:
                # a degenerate rebuild mid-update is surfaced by the
                # backend as TriangulationFailedError like the full path
                pass
            sorted_now = False
        elif incremental:
            # backend cannot repair: full rebuild in the existing order
            self._check_duplicates(pts)
            self._triangulate(pts)
            sorted_now = False
        else:
            order = morton_argsort(pts).astype(np.int64)
            pts = pts[order]
            self._check_duplicates(pts, sorted_hint=True)
            self._perm = order
            self._triangulate(pts)
            sorted_now = True

        self._num_points = n
        return sorted_now

    def _triangulate(self, pts):
        n = pts.shape[0]
        if getattr(self._backend, "supports_adjacency", False):
            self._simplices, self._adjacency, self._offsets = (
                self._backend.triangulate_with_adjacency(pts)
            )
        else:
            self._simplices = self._backend.triangulate(pts)
            self._adjacency, self._offsets = tets_to_point_adjacency(
                self._simplices, n
            )

    @staticmethod
    def _check_duplicates(pts, sorted_hint=False):
        # reference check_duplicates (delaunay.cu:9-30): exact-equal points
        # make the triangulation ill-defined -> fail so the caller jitters.
        pts = np.ascontiguousarray(pts)
        view = pts.view([("x", np.float32), ("y", np.float32), ("z", np.float32)])
        uniq = np.unique(view)
        if uniq.shape[0] != pts.shape[0]:
            raise TriangulationFailedError(
                f"{pts.shape[0] - uniq.shape[0]} duplicate points"
            )

    # -- accessors (triangulation_bindings.cpp:41-115) ---------------------

    def permutation(self):
        """Sorting permutation from the most recent full rebuild."""
        return self._perm

    def tets(self):
        return self._simplices

    def point_adjacency(self):
        return self._adjacency

    def point_adjacency_offsets(self):
        return self._offsets

    @property
    def num_points(self):
        return self._num_points

    def max_degree(self):
        d = self._offsets[1:].astype(np.int64) - self._offsets[:-1]
        return int(d.max()) if d.size else 0

    def cell_bounds(self, points=None):
        """Per-cell finite Voronoi AABBs + hull flags for the rasterizer.

        Uses the native engine's O(T) sequential pass when available (the
        numpy fallback needs ``points``: the coordinates this triangulation
        was built from, in triangulation order).

        Returns (bb_min (N, 3) f32, bb_max (N, 3) f32, hull (N,) bool).
        """
        if hasattr(self._backend, "cell_bounds"):
            return self._backend.cell_bounds()
        if points is None:
            raise ValueError(
                "numpy cell_bounds fallback requires the point coordinates"
            )
        from radfoam_tpu.ops.cellbound import cell_bounds

        return cell_bounds(_to_numpy(points), self._simplices)
