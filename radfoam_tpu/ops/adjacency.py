"""Adjacency-table utilities: CSR <-> fixed-degree padded tables.

The reference tracer walks a variable-degree CSR adjacency
(src/tracing/tracing_utils.cuh:31-36). TPU vector units want fixed shapes,
so the device-side representation here is a padded neighbor table
``nbr_idx (N, K) int32`` where row i holds point i's Delaunay neighbors and
padding slots hold ``i`` itself: the walk's exit-face test requires
``offset . dir > 0`` and a self-neighbor has offset exactly zero, so padding
is rejected by the same comparison that rejects backfacing faces — no
separate mask needed (SURVEY.md §7.1 item 1).

The fp16 offset table (the analog of prefetch_adjacent_diff,
src/tracing/pipeline.cu:546-586) is recomputed on-device inside the trace
call, since points move every optimizer step.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def csr_to_padded(adjacency, offsets, num_points=None, pad_to=None):
    """Convert CSR adjacency to a padded (N, K) neighbor table (host-side).

    Args:
      adjacency: (E,) int array of neighbor indices, row-major by source.
      offsets: (N+1,) int array, row i spans adjacency[offsets[i]:offsets[i+1]].
      num_points: optional capacity C >= N; extra rows are all-self padding.
      pad_to: optional K >= max degree (rounded up); default max degree
        rounded up to a multiple of 8.

    Returns:
      (C, K) int32 table, padding slots = own row index.
    """
    adjacency = np.asarray(adjacency)
    offsets = np.asarray(offsets).astype(np.int64)
    n = offsets.shape[0] - 1
    cap = int(num_points) if num_points is not None else n
    degrees = offsets[1:] - offsets[:-1]
    max_deg = int(degrees.max()) if n > 0 else 0
    if pad_to is None:
        pad_to = max(8, -(-max_deg // 8) * 8)
    if max_deg > pad_to:
        raise ValueError(f"max degree {max_deg} exceeds pad_to={pad_to}")

    table = np.repeat(
        np.arange(cap, dtype=np.int32)[:, None], pad_to, axis=1
    )
    # slot index of each CSR entry within its row
    rows = np.repeat(np.arange(n), degrees)
    slots = np.arange(adjacency.shape[0], dtype=np.int64) - np.repeat(
        offsets[:-1], degrees
    )
    table[rows, slots] = adjacency.astype(np.int32)
    return table


def padded_to_csr(table, n_active=None):
    """Inverse of csr_to_padded for checkpoint export.

    Returns (adjacency (E,) int64, offsets (N+1,) int64) with neighbors in
    slot order (which preserves the CSR order used to build the table).
    """
    table = np.asarray(table)
    n = int(n_active) if n_active is not None else table.shape[0]
    table = table[:n]
    self_idx = np.arange(n, dtype=table.dtype)[:, None]
    valid = table != self_idx
    degrees = valid.sum(axis=1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(degrees, out=offsets[1:])
    adjacency = table[valid].astype(np.int64)
    return adjacency, offsets


@partial(jax.jit, donate_argnums=())
def neighbor_offsets_f16(points, nbr_idx):
    """fp16 neighbor offset table: off[i, k] = points[nbr[i,k]] - points[i].

    The bandwidth trick that makes the walk fast — 8 bytes/neighbor instead
    of 12+ (reference stores Vec4h, pipeline.cu:546-586). Padding slots are
    exactly zero (self minus self), which the walk rejects via dp > 0.
    Returns (N, K, 4) float16 with a zero w component for 8-byte alignment.
    """
    q = jnp.take(points, nbr_idx, axis=0)  # (N, K, 3)
    off = (q - points[:, None, :]).astype(jnp.float16)
    pad = jnp.zeros((*off.shape[:-1], 1), dtype=jnp.float16)
    return jnp.concatenate([off, pad], axis=-1)


@partial(jax.jit, static_argnames=("n_active",))
def _farthest_padded(points, nbr_idx, n_active):
    self_idx = jnp.arange(nbr_idx.shape[0], dtype=nbr_idx.dtype)[:, None]
    valid = nbr_idx != self_idx
    q = jnp.take(points, nbr_idx, axis=0)
    d = jnp.linalg.norm(q - points[:, None, :], axis=-1)
    d_masked = jnp.where(valid, d, -jnp.inf)
    far_slot = jnp.argmax(d_masked, axis=-1)
    far_idx = jnp.take_along_axis(nbr_idx, far_slot[:, None], axis=1)[:, 0]
    degree = jnp.maximum(valid.sum(axis=-1), 1)
    # mean half-distance to neighbors = "cell radius"
    # (reference triangulation_ops.cu:8-44)
    radius = jnp.where(valid, d, 0.0).sum(axis=-1) / degree / 2.0
    if n_active is not None and n_active < nbr_idx.shape[0]:
        rows = jnp.arange(nbr_idx.shape[0])
        far_idx = jnp.where(rows < n_active, far_idx, rows.astype(far_idx.dtype))
        radius = jnp.where(rows < n_active, radius, 0.0)
    return far_idx.astype(jnp.int32), radius


def farthest_neighbor_padded(points, nbr_idx, n_active=None):
    """Farthest Delaunay neighbor + mean-half-distance cell radius.

    Drives densification sampling (reference radfoam_model/scene.py:433-439,
    src/delaunay/triangulation_ops.cu:8-44). Operates on the padded table.
    """
    return _farthest_padded(points, nbr_idx, n_active)


def farthest_neighbor(points, point_adjacency, point_adjacency_offsets):
    """CSR-interface parity wrapper (radfoam.farthest_neighbor)."""
    adjacency = np.asarray(point_adjacency)
    offsets = np.asarray(point_adjacency_offsets)
    table = csr_to_padded(adjacency, offsets)
    return farthest_neighbor_padded(jnp.asarray(points), jnp.asarray(table))
