"""Wavefront (compaction + refill) scheduling must produce the same results
as the plain chunked walk."""

import numpy as np
import jax.numpy as jnp
import pytest

from radfoam_tpu.delaunay import Triangulation
from radfoam_tpu.ops.adjacency import csr_to_padded
from radfoam_tpu.ops.trace import (
    TraceConfig,
    pack_layout,
    pack_trace_table,
    _trace_forward_packed,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(13)
    n = 400
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    table = csr_to_padded(
        tri.point_adjacency(), tri.point_adjacency_offsets()
    )
    sh_degree = 1
    A = 1 + 3 * (sh_degree + 1) ** 2
    attrs = rng.standard_normal((n, A)).astype(np.float32) * 0.3
    attrs[:, -1] = rng.uniform(0.2, 2.0, size=n)

    R = 500
    origins = (rng.standard_normal((R, 3)) * 0.3 + [-4, 0, 0]).astype(
        np.float32
    )
    dirs = rng.standard_normal((R, 3)).astype(np.float32) * 0.4 - origins
    rays = np.concatenate([origins, dirs], axis=-1).astype(np.float32)
    start = np.array(
        [np.argmin(np.sum((pts - o) ** 2, axis=1)) for o in origins],
        np.int32,
    )
    quant = np.sort(
        rng.uniform(0.05, 0.9, size=(R, 2)).astype(np.float32), axis=1
    )[:, ::-1].copy()
    return dict(pts=pts, table=table, attrs=attrs, rays=rays, start=start,
                quant=quant, sh_degree=sh_degree)


@pytest.mark.parametrize("num_q,contrib", [(0, False), (2, True)])
def test_wavefront_matches_chunked(scene, num_q, contrib):
    base = TraceConfig(
        sh_degree=scene["sh_degree"], num_quantiles=num_q,
        return_contribution=contrib,
    )
    pts = jnp.asarray(scene["pts"])
    attrs = jnp.asarray(scene["attrs"])
    table = jnp.asarray(scene["table"])
    lay = pack_layout(table, attrs)
    packed = pack_trace_table(pts, attrs, table)
    rays = jnp.asarray(scene["rays"])
    start = jnp.asarray(scene["start"])
    quant = (
        jnp.asarray(scene["quant"]) if num_q
        else jnp.zeros((rays.shape[0], 0), jnp.float32)
    )

    ref = _trace_forward_packed(
        base._replace(use_wavefront=False, chunk_size=1 << 20),
        lay, packed, pts.shape[0], rays, start, quant,
    )
    wf = _trace_forward_packed(
        base._replace(use_wavefront=True, chunk_size=64, compact_every=7),
        lay, packed, pts.shape[0], rays, start, quant,
    )

    np.testing.assert_allclose(
        np.asarray(wf.rgba), np.asarray(ref.rgba), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(wf.num_intersections), np.asarray(ref.num_intersections)
    )
    if num_q:
        np.testing.assert_allclose(
            np.asarray(wf.depth), np.asarray(ref.depth), rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(wf.quantile_point_indices),
            np.asarray(ref.quantile_point_indices),
        )
    if contrib:
        np.testing.assert_allclose(
            np.asarray(wf.contribution), np.asarray(ref.contribution),
            rtol=1e-4, atol=1e-5,
        )
