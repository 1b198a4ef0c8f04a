"""Tests for nn query, adjacency utilities, camera, fetcher, lr schedules."""

import numpy as np
import jax.numpy as jnp

from radfoam_tpu.ops.nn import build_aabb_tree, nn
from radfoam_tpu.ops.adjacency import (
    csr_to_padded,
    farthest_neighbor,
    farthest_neighbor_padded,
    neighbor_offsets_f16,
)
from radfoam_tpu.ops.camera import Camera, PINHOLE, FISHEYE, cast_rays, look_at
from radfoam_tpu.data.fetcher import BatchFetcher, hash_randint
from radfoam_tpu.utils.lr import get_cosine_lr_func
from radfoam_tpu.utils.math import morton_argsort


def test_nn_exact(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    queries = rng.normal(size=(7, 3)).astype(np.float32)
    tree = build_aabb_tree(pts)
    got = np.asarray(nn(pts, tree, queries))
    want = np.argmin(
        np.linalg.norm(pts[None] - queries[:, None], axis=-1), axis=1
    )
    np.testing.assert_array_equal(got, want)


def test_nn_respects_active_count(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    # the true NN of query is point 90 but only first 50 points are active
    q = pts[90:91]
    tree = build_aabb_tree(pts, n_active=50)
    got = int(nn(pts, tree, q)[0])
    assert got < 50


def test_csr_to_padded_self_padding():
    adjacency = np.array([1, 2, 0, 0], np.uint32)
    offsets = np.array([0, 2, 3, 4], np.uint32)
    table = csr_to_padded(adjacency, offsets, pad_to=4)
    np.testing.assert_array_equal(table[0], [1, 2, 0, 0])
    np.testing.assert_array_equal(table[1], [0, 1, 1, 1])
    np.testing.assert_array_equal(table[2], [0, 2, 2, 2])


def test_neighbor_offsets_zero_for_padding(rng):
    pts = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    table = jnp.asarray(
        np.array([[1, 0, 0, 0], [0, 2, 1, 1], [1, 3, 2, 2], [2, 3, 3, 3]],
                 np.int32)
    )
    off = np.asarray(neighbor_offsets_f16(pts, table))
    assert off.shape == (4, 4, 4)
    # padding slots (self index) must be exactly zero
    np.testing.assert_array_equal(off[0, 1], 0)
    np.testing.assert_array_equal(off[3, 2], 0)


def test_farthest_neighbor(rng):
    pts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 2, 0], [0, 0, 3]], np.float32
    )
    table = np.array(
        [[1, 2, 3, 0], [0, 1, 1, 1], [0, 2, 2, 2], [0, 3, 3, 3]], np.int32
    )
    far, radius = farthest_neighbor_padded(jnp.asarray(pts), jnp.asarray(table))
    assert int(far[0]) == 3
    np.testing.assert_allclose(float(radius[0]), (1 + 2 + 3) / 3 / 2, rtol=1e-6)


def test_farthest_neighbor_csr_wrapper(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    from radfoam_tpu.delaunay import Triangulation

    tri = Triangulation(pts)
    far, radius = farthest_neighbor(
        pts[tri.permutation()], tri.point_adjacency(),
        tri.point_adjacency_offsets(),
    )
    assert far.shape == (50,)
    assert np.all(np.asarray(radius) > 0)


def test_pinhole_center_ray():
    cam = look_at([0, 0, -5], [0, 0, 0], [0, 1, 0], fov=np.deg2rad(60),
                  width=64, height=48)
    rays = np.asarray(cast_rays(cam))
    assert rays.shape == (48, 64, 6)
    # ray directions are unit
    np.testing.assert_allclose(
        np.linalg.norm(rays[..., 3:], axis=-1), 1.0, atol=1e-5
    )
    # near-center pixel looks along +z
    center = rays[24, 32, 3:]
    assert center[2] > 0.99


def test_fisheye_masks_out_of_circle():
    cam = Camera(
        position=np.zeros(3, np.float32),
        forward=np.array([0, 0, 1], np.float32),
        right=np.array([1, 0, 0], np.float32),
        up=np.array([0, 1, 0], np.float32),
        fov=np.pi, width=32, height=32, model=FISHEYE,
    )
    rays = np.asarray(cast_rays(cam))
    norms = np.linalg.norm(rays[..., 3:], axis=-1)
    assert (norms[0, 0] < 0.1) or (norms[0, -1] < 0.1)  # corners masked


def test_fetcher_deterministic_and_aligned():
    data = np.arange(100, dtype=np.float32)[:, None]
    a = BatchFetcher(data, 8, shuffle=True, device_put=False, seed=1)
    b = BatchFetcher(data, 8, shuffle=True, device_put=False, seed=1)
    for _ in range(5):
        np.testing.assert_array_equal(a.next(), b.next())
    a.stop()
    b.stop()


def test_fetcher_sequential_wraps():
    data = np.arange(10, dtype=np.float32)[:, None]
    f = BatchFetcher(data, 4, shuffle=False, device_put=False)
    got = np.concatenate([f.next() for _ in range(5)]).ravel()
    want = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 1, 2, 3, 4, 5, 6, 7,
                     8, 9])
    np.testing.assert_array_equal(got, want)
    f.stop()


def test_hash_randint_in_range():
    idx = hash_randint(42, 0, 17, 1000)
    assert idx.min() >= 0 and idx.max() < 17


def test_cosine_lr_endpoints():
    f = get_cosine_lr_func(1e-2, 1e-4, warmup_steps=10, max_steps=100)
    assert f(0) == 0.0
    np.testing.assert_allclose(f(10), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(f(100), 1e-4, rtol=1e-6)
    assert f(101) == 0.0


def test_morton_sort_locality(rng):
    pts = rng.uniform(size=(1000, 3)).astype(np.float32)
    order = morton_argsort(pts)
    sorted_pts = pts[order]
    # consecutive points after sorting are much closer than random pairs
    d_sorted = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    d_random = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_sorted < 0.5 * d_random
