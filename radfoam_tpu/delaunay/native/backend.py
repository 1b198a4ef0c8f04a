"""Build + ctypes binding for the native Delaunay engine.

Compiles delaunay/native/src into a shared library with g++ on first use
(no pybind11 in this image — plain C ABI via ctypes) and exposes the
backend interface the Triangulation class consumes.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfoam_delaunay.so")
_BUILD_LOCK = threading.Lock()


class NativeError(RuntimeError):
    pass


def _build_library():
    srcs = [os.path.join(_SRC_DIR, "delaunay.cpp")]
    newest_src = max(os.path.getmtime(s) for s in srcs + [
        os.path.join(_SRC_DIR, "predicates.h")
    ])
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) > newest_src:
        return _LIB_PATH
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, *srcs,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeError(f"native build failed:\n{proc.stderr[-2000:]}")
    return _LIB_PATH


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        path = _build_library()
        lib = ctypes.CDLL(path)
        lib.foam_create.restype = ctypes.c_void_p
        lib.foam_destroy.argtypes = [ctypes.c_void_p]
        lib.foam_build.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.foam_build.restype = ctypes.c_int
        lib.foam_num_tets.argtypes = [ctypes.c_void_p]
        lib.foam_num_tets.restype = ctypes.c_int64
        lib.foam_get_tets.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.foam_adjacency_size.argtypes = [ctypes.c_void_p]
        lib.foam_adjacency_size.restype = ctypes.c_int64
        lib.foam_get_adjacency.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.foam_revalidate.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.foam_revalidate.restype = ctypes.c_int
        lib.foam_update.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.foam_update.restype = ctypes.c_int
        lib.foam_cell_bounds.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_double,
        ]
        lib.foam_cell_bounds.restype = ctypes.c_int
        _lib = lib
        return _lib


# status codes from delaunay.cpp
_OK, _DEGENERATE, _INTERNAL, _TOO_FEW = 0, 1, 2, 3


class NativeBackend:
    """Backend interface: triangulate(points) -> simplices, plus direct CSR
    adjacency extraction (faster than the numpy sort-unique path).

    The native handle is retained between calls: an incremental update
    first runs the O(T) exact validity re-check (foam_revalidate) and skips
    the rebuild entirely when the moved points leave the topology Delaunay
    — the detector half of the reference's delete-violations/regrow
    incremental mode (delaunay.cu:291-310). An invalid topology falls back
    to a full rebuild.
    """

    name = "native"
    supports_incremental = True
    supports_adjacency = True

    def __init__(self):
        self._lib = _load()
        self._handle = None
        self._cached = None  # (tets, adj, offsets)

    def __del__(self):
        try:
            if self._handle:
                self._lib.foam_destroy(self._handle)
        except Exception:
            pass

    def _build(self, pts):
        from radfoam_tpu.delaunay.api import TriangulationFailedError

        lib = self._lib
        if self._handle is None:
            self._handle = lib.foam_create()
        h = self._handle
        status = lib.foam_build(
            h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pts.shape[0],
        )
        if status == _DEGENERATE:
            self._cached = None
            raise TriangulationFailedError(
                "degenerate input (duplicate or cospherical points)"
            )
        if status != _OK:
            self._cached = None
            raise TriangulationFailedError(
                f"native triangulation failed (status {status})"
            )
        self._cached = self._fetch_arrays(pts.shape[0])
        return self._cached

    def _fetch_arrays(self, n_points):
        lib = self._lib
        h = self._handle
        n_tets = lib.foam_num_tets(h)
        tets = np.empty((n_tets, 4), np.int32)
        lib.foam_get_tets(
            h, tets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        e = lib.foam_adjacency_size(h)
        adj = np.empty(e, np.uint32)
        offsets = np.empty(n_points + 1, np.uint32)
        lib.foam_get_adjacency(
            h,
            adj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return (tets, adj, offsets)

    def triangulate(self, points):
        pts = np.ascontiguousarray(points, dtype=np.float32)
        tets, _, _ = self._build(pts)
        return tets

    def triangulate_with_adjacency(self, points):
        pts = np.ascontiguousarray(points, dtype=np.float32)
        return self._build(pts)

    def retriangulate_with_adjacency(self, points):
        """Incremental update: exact local repair, full rebuild on failure.

        foam_update moves the coordinates in place, detects the damaged
        tets, and splices in a locally rebuilt Delaunay patch when the
        certificate proves exactness (VERDICT r1 task 3; reference
        delete-violations + regrow, delaunay.cu:291-310). Statuses:
        0 = topology still valid, 3 = repaired in place, else full rebuild.

        Returns (tets, adj, offsets, rebuilt: bool). ``rebuilt`` reports
        whether a FULL rebuild happened (repairs count as incremental).
        """
        pts = np.ascontiguousarray(points, dtype=np.float32)
        if self._handle is not None and self._cached is not None:
            stats = (ctypes.c_int64 * 2)()
            status = self._lib.foam_update(
                self._handle,
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                pts.shape[0],
                stats,
            )
            self.last_update_stats = (int(stats[0]), int(stats[1]))
            if status == 0:
                return (*self._cached, False)
            if status == 3:
                self._cached = self._fetch_arrays(pts.shape[0])
                return (*self._cached, False)
        return (*self._build(pts), True)

    def cell_bounds(self, fallback=0.0):
        """Per-cell finite Voronoi AABBs + hull flags from the live mesh."""
        if self._handle is None or self._cached is None:
            raise NativeError("no triangulation built")
        n = self._cached[2].shape[0] - 1
        bbmin = np.empty((n, 3), np.float32)
        bbmax = np.empty((n, 3), np.float32)
        hull = np.empty(n, np.uint8)
        status = self._lib.foam_cell_bounds(
            self._handle,
            bbmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bbmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            hull.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            float(fallback),
        )
        if status != _OK:
            raise NativeError(f"cell_bounds failed (status {status})")
        return bbmin, bbmax, hull.astype(bool)
