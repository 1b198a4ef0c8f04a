"""Trace forward/backward validation against the sequential reference
tracer and autodiff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radfoam_tpu.delaunay import Triangulation
from radfoam_tpu.ops.adjacency import csr_to_padded
from radfoam_tpu.ops.trace import (
    TraceConfig,
    trace,
    _trace_forward_impl,
    _trace_backward_impl,
)

from reference_tracer import trace_ray_forward, trace_ray_backward


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    n = 300
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    adj = tri.point_adjacency()
    offsets = tri.point_adjacency_offsets()
    table = csr_to_padded(adj, offsets)

    sh_degree = 2
    A = 1 + 3 * (sh_degree + 1) ** 2
    attrs = rng.normal(size=(n, A)).astype(np.float32) * 0.3
    attrs[:, -1] = rng.uniform(0.2, 2.0, size=n)  # positive densities

    # rays shooting through the cloud from outside
    R = 24
    origins = np.array([[-4.0, 0.0, 0.0]] * R, np.float32)
    origins += rng.normal(size=(R, 3)).astype(np.float32) * 0.2
    targets = rng.normal(size=(R, 3)).astype(np.float32) * 0.5
    dirs = targets - origins
    rays = np.concatenate([origins, dirs], axis=-1).astype(np.float32)
    start = np.array(
        [np.argmin(np.sum((pts - o) ** 2, axis=1)) for o in origins],
        np.int32,
    )
    quant = np.sort(
        rng.uniform(0.05, 0.9, size=(R, 2)).astype(np.float32), axis=1
    )[:, ::-1].copy()
    return dict(
        pts=pts, adj=adj, offsets=offsets, table=table, attrs=attrs,
        rays=rays, start=start, quant=quant, sh_degree=sh_degree,
    )


def test_forward_matches_sequential_reference(scene):
    cfg = TraceConfig(
        sh_degree=scene["sh_degree"], num_quantiles=2,
        return_contribution=True, chunk_size=16,
    )
    out = _trace_forward_impl(
        cfg,
        jnp.asarray(scene["pts"]), jnp.asarray(scene["attrs"]),
        jnp.asarray(scene["table"]), jnp.asarray(scene["rays"]),
        jnp.asarray(scene["start"]), jnp.asarray(scene["quant"]),
    )
    contrib_ref = np.zeros(scene["pts"].shape[0], np.float64)
    for i in range(scene["rays"].shape[0]):
        rgba, qd, qp, n = trace_ray_forward(
            scene["pts"], scene["attrs"], scene["adj"], scene["offsets"],
            scene["start"][i], scene["rays"][i], scene["quant"][i],
            sh_degree=scene["sh_degree"], contribution=contrib_ref,
        )
        np.testing.assert_allclose(
            np.asarray(out.rgba[i]), rgba, rtol=2e-4, atol=2e-4,
            err_msg=f"ray {i} rgba",
        )
        np.testing.assert_allclose(
            np.asarray(out.depth[i]), qd, rtol=2e-3, atol=2e-4,
            err_msg=f"ray {i} depth",
        )
        np.testing.assert_array_equal(
            np.asarray(out.quantile_point_indices[i]), qp,
            err_msg=f"ray {i} qpoint",
        )
        assert int(out.num_intersections[i]) == n, f"ray {i} steps"
    np.testing.assert_allclose(
        np.asarray(out.contribution), contrib_ref, rtol=1e-3, atol=1e-4
    )


def test_backward_matches_sequential_reference(scene):
    cfg = TraceConfig(
        sh_degree=scene["sh_degree"], num_quantiles=2, chunk_size=16,
        approx_next_point=False,
    )
    rng = np.random.default_rng(3)
    R = scene["rays"].shape[0]
    g_rgba = rng.normal(size=(R, 4)).astype(np.float32)
    g_depth = rng.normal(size=(R, 2)).astype(np.float32) * 0.1

    fwd = _trace_forward_impl(
        cfg,
        jnp.asarray(scene["pts"]), jnp.asarray(scene["attrs"]),
        jnp.asarray(scene["table"]), jnp.asarray(scene["rays"]),
        jnp.asarray(scene["start"]), jnp.asarray(scene["quant"]),
    )
    pg, ag, _ = _trace_backward_impl(
        cfg,
        jnp.asarray(scene["pts"]), jnp.asarray(scene["attrs"]),
        jnp.asarray(scene["table"]), jnp.asarray(scene["rays"]),
        jnp.asarray(scene["start"]), jnp.asarray(scene["quant"]),
        fwd.rgba, fwd.quantile_point_indices,
        jnp.asarray(g_rgba), jnp.asarray(g_depth),
    )

    n_pts = scene["pts"].shape[0]
    pg_ref = np.zeros((n_pts, 3), np.float64)
    ag_ref = np.zeros((n_pts, scene["attrs"].shape[1]), np.float64)
    for i in range(R):
        trace_ray_backward(
            scene["pts"], scene["attrs"], scene["adj"], scene["offsets"],
            scene["start"][i], scene["rays"][i], scene["quant"][i],
            np.asarray(fwd.quantile_point_indices[i]),
            np.asarray(fwd.rgba[i]), g_rgba[i], g_depth[i],
            sh_degree=scene["sh_degree"],
            points_grad=pg_ref, attr_grad=ag_ref,
        )
    np.testing.assert_allclose(
        np.asarray(ag), ag_ref, rtol=5e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(pg), pg_ref, rtol=5e-3, atol=5e-3
    )

    # the fast path (next_point derived from the fp16 face offset) must stay
    # close to the exact-gather gradients
    pg2, ag2, _ = _trace_backward_impl(
        cfg._replace(approx_next_point=True),
        jnp.asarray(scene["pts"]), jnp.asarray(scene["attrs"]),
        jnp.asarray(scene["table"]), jnp.asarray(scene["rays"]),
        jnp.asarray(scene["start"]), jnp.asarray(scene["quant"]),
        fwd.rgba, fwd.quantile_point_indices,
        jnp.asarray(g_rgba), jnp.asarray(g_depth),
    )
    np.testing.assert_allclose(np.asarray(ag2), ag_ref, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(pg2), pg_ref, rtol=3e-2, atol=3e-2
    )


def test_attr_gradients_match_autodiff(scene):
    """Attribute gradients from the analytic backward vs jax.grad through a
    fully differentiable unrolled forward (fixed topology)."""
    cfg = TraceConfig(sh_degree=scene["sh_degree"], num_quantiles=0)
    rng = np.random.default_rng(5)
    R = scene["rays"].shape[0]
    w = jnp.asarray(rng.normal(size=(R, 4)).astype(np.float32))
    quant = jnp.zeros((R, 0), jnp.float32)

    def loss_custom(attrs):
        out = trace(
            jnp.asarray(scene["pts"]), attrs, jnp.asarray(scene["table"]),
            jnp.asarray(scene["rays"]), jnp.asarray(scene["start"]),
            config=cfg,
        )
        return jnp.sum(out.rgba * w)

    g_custom = jax.grad(loss_custom)(jnp.asarray(scene["attrs"]))

    # differentiable replay: scan over a fixed number of steps
    from radfoam_tpu.ops.sh import sh_basis, sh_to_rgb
    from radfoam_tpu.ops.adjacency import neighbor_offsets_f16

    pts = jnp.asarray(scene["pts"])
    table = jnp.asarray(scene["table"])
    rays = jnp.asarray(scene["rays"])
    dirs = rays[:, 3:6] / jnp.linalg.norm(
        rays[:, 3:6], axis=-1, keepdims=True
    )
    origins = rays[:, :3]
    basis = sh_basis(dirs, scene["sh_degree"])
    nbr_off = neighbor_offsets_f16(pts, table)

    def replay(attrs):
        def step(carry, _):
            cell, t0, T, rgb, act = carry
            offs = jnp.take(nbr_off, cell, axis=0)[..., :3].astype(
                jnp.float32
            )
            nbrs = jnp.take(table, cell, axis=0)
            p = jnp.take(pts, cell, axis=0)
            dp = jnp.einsum("rkd,rd->rk", offs, dirs)
            num = jnp.einsum("rkd,rd->rk", offs, p - origins) + 0.5 * jnp.sum(
                offs * offs, -1
            )
            dp_safe = jnp.where(dp > 0, dp, 1.0)
            t = jnp.where(dp > 0, num / dp_safe, jnp.inf)
            face = jnp.argmin(t, -1)
            t1 = jnp.take_along_axis(t, face[:, None], 1)[:, 0]
            nxt = jnp.take_along_axis(nbrs, face[:, None], 1)[:, 0]
            has_exit = jnp.isfinite(t1)
            run = act & has_exit & (t1 > t0)
            a = jnp.take(attrs, cell, axis=0)
            s = a[:, -1]
            rgb_p = sh_to_rgb(basis, a[:, :-1])
            rgb_p = jnp.where((s > 1e-6)[:, None], rgb_p, 0.0)
            # double-where keeps NaNs out of the unselected branch's grads
            delta = jnp.where(run, jnp.maximum(t1 - t0, 0.0), 0.0)
            alpha = jnp.where(run, 1 - jnp.exp(-s * delta), 0.0)
            wgt = T * alpha
            rgb = rgb + wgt[:, None] * rgb_p
            T = T * (1 - alpha)
            cont = jnp.where(run, T > cfg.weight_threshold, True)
            mv = act & has_exit
            active = mv & cont
            cell = jnp.where(mv, nxt, cell)
            t0 = jnp.where(mv, jnp.maximum(t0, t1), t0)
            return (cell, t0, T, rgb, active), None

        init = (
            jnp.asarray(scene["start"]).astype(jnp.int32),
            jnp.zeros((R,)), jnp.ones((R,)), jnp.zeros((R, 3)),
            jnp.ones((R,), bool),
        )
        (cell, t0, T, rgb, active), _ = jax.lax.scan(
            step, init, None, length=256
        )
        rgba = jnp.concatenate([rgb, (1 - T)[:, None]], -1)
        return jnp.sum(rgba * w)

    g_auto = jax.grad(replay)(jnp.asarray(scene["attrs"]))
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=2e-2, atol=2e-3
    )


def test_trace_empty_direction_ray_is_harmless(scene):
    """Rays with zero direction (fisheye mask) terminate immediately."""
    cfg = TraceConfig(sh_degree=scene["sh_degree"], num_quantiles=0)
    rays = np.zeros((4, 6), np.float32)
    out = trace(
        jnp.asarray(scene["pts"]), jnp.asarray(scene["attrs"]),
        jnp.asarray(scene["table"]), jnp.asarray(rays),
        jnp.zeros(4, np.int32), config=cfg,
    )
    assert np.all(np.isfinite(np.asarray(out.rgba)))
    assert np.asarray(out.rgba)[:, 3].max() == 0.0
