"""Deterministic synthetic foam scenes.

The image ships no datasets, so benchmarks, golden-render fixtures, and
scale proofs all run on procedurally generated scenes. Two flavors:

  * ``foam_scene`` — a clustered core + diffuse shell with a dense-core
    density profile; occupancy roughly like a raw (untrained) foam.
  * ``trained_like_scene`` — matches the statistics the reference benchmark
    protocol actually measures (benchmark.py:95-139 renders *trained*
    checkpoints): most cells carry near-zero density (carved empty space)
    and a thin population of high-density "surface" cells, arranged on
    blob surfaces so rays see a few opaque hits behind mostly-empty space.

Both return (points, attrs, nbr_idx) with points already permuted into the
triangulation's spatial order and the adjacency as a padded table.
"""

import numpy as np


def _triangulate(pts):
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.ops.adjacency import csr_to_padded

    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    table = csr_to_padded(tri.point_adjacency(), tri.point_adjacency_offsets())
    return pts, table


def foam_scene(n_points=131_072, sh_degree=3, seed=0):
    """Clustered foam: dense core (sigma 2.5) inside a diffuse shell."""
    rng = np.random.default_rng(seed)
    core = rng.standard_normal((n_points // 2, 3)) * 1.0
    shell = rng.standard_normal((n_points - n_points // 2, 3)) * 4.0
    pts = np.concatenate([core, shell]).astype(np.float32)

    pts, table = _triangulate(pts)
    D = (sh_degree + 1) ** 2
    attrs = (rng.standard_normal((pts.shape[0], 1 + 3 * D)) * 0.2).astype(
        np.float32
    )
    r = np.linalg.norm(pts, axis=1)
    attrs[:, -1] = np.where(r < 1.5, 2.5, 0.02)
    return pts, attrs, table


def trained_like_scene(n_points=2_097_152, sh_degree=3, seed=0,
                       n_blobs=24, surface_frac=0.25, shell_noise=0.05,
                       return_tri=False):
    """Trained-checkpoint-like foam at a given point count.

    ``surface_frac`` of the points sit on thin shells of random blobs and
    carry high density (opaque surfaces); the rest fill space uniformly with
    near-zero density (the carved free space a trained model converges to).
    SH coefficients: strong DC per blob, small higher orders.
    """
    rng = np.random.default_rng(seed)
    n_surf = int(n_points * surface_frac)
    n_free = n_points - n_surf

    centers = rng.uniform(-3.0, 3.0, (n_blobs, 3))
    radii = rng.uniform(0.3, 1.2, n_blobs)
    blob = rng.integers(0, n_blobs, n_surf)
    u = rng.standard_normal((n_surf, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-12
    shell_jitter = 1.0 + rng.standard_normal(n_surf) * shell_noise
    surf = centers[blob] + u * (radii[blob] * shell_jitter)[:, None]

    free = rng.uniform(-5.0, 5.0, (n_free, 3))
    pts_in = np.concatenate([surf, free]).astype(np.float32)
    is_surf = np.zeros(n_points, bool)
    is_surf[:n_surf] = True

    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.ops.adjacency import csr_to_padded

    tri = Triangulation(pts_in)
    perm = tri.permutation()
    pts = pts_in[perm]
    flags = is_surf[perm]
    table = csr_to_padded(tri.point_adjacency(), tri.point_adjacency_offsets())

    n = pts.shape[0]
    D = (sh_degree + 1) ** 2
    attrs = np.zeros((n, 1 + 3 * D), np.float32)
    # DC color: position-hash palette for surface points, dim for free space
    base = 0.5 + 0.5 * np.sin(pts * np.array([2.1, 1.3, 3.7]))
    attrs[:, 0 * D] = base[:, 0]
    attrs[:, 1 * D] = base[:, 1]
    attrs[:, 2 * D] = base[:, 2]
    hi = rng.standard_normal((n, 3 * D)).astype(np.float32) * 0.02
    attrs[:, : 3 * D] += hi
    sigma = np.where(flags, rng.uniform(8.0, 40.0, n), 1e-4)
    attrs[:, -1] = sigma.astype(np.float32)
    if return_tri:
        return pts, attrs, table, tri
    return pts, attrs, table
