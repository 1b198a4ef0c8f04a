"""The per-ray-error -> per-point-error channel (reference ErrorBox,
render.py:4-8 / pipeline.cu:239-241): with unit ray error, each cell's
point_error equals its contribution weight."""

import numpy as np
import jax.numpy as jnp

from radfoam_tpu.delaunay import Triangulation
from radfoam_tpu.ops.adjacency import csr_to_padded
from radfoam_tpu.ops.trace import TraceConfig, trace, trace_point_error


def test_point_error_equals_contribution_for_unit_error(rng):
    n = 200
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    table = csr_to_padded(
        tri.point_adjacency(), tri.point_adjacency_offsets()
    )
    A = 1 + 3 * 4  # sh degree 1
    attrs = rng.standard_normal((n, A)).astype(np.float32) * 0.2
    attrs[:, -1] = rng.uniform(0.3, 2.0, n)

    R = 16
    origins = np.full((R, 3), 3.5, np.float32) + rng.standard_normal(
        (R, 3)
    ).astype(np.float32) * 0.2
    rays = np.concatenate(
        [origins, -origins + rng.standard_normal((R, 3)).astype(np.float32)
         * 0.2],
        axis=-1,
    )
    start = np.array(
        [np.argmin(np.sum((pts - o) ** 2, axis=1)) for o in origins],
        np.int32,
    )

    cfg = TraceConfig(sh_degree=1, num_quantiles=0,
                      return_contribution=True)
    out = trace(
        jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
        jnp.asarray(rays), jnp.asarray(start), config=cfg,
    )
    perr = trace_point_error(
        jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
        jnp.asarray(rays), jnp.asarray(start), out.rgba,
        jnp.ones((R,), jnp.float32), config=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(perr), np.asarray(out.contribution), rtol=1e-5,
        atol=1e-6,
    )
    assert float(np.asarray(perr).max()) > 0
