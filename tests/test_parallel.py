"""Multi-device data-parallel training on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radfoam_tpu.delaunay import Triangulation
from radfoam_tpu.ops.adjacency import csr_to_padded
from radfoam_tpu.ops.trace import TraceConfig
from radfoam_tpu.parallel import make_mesh, make_sharded_train_step, shard_batch
from radfoam_tpu.train.step import StepConfig, init_opt_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(21)
    n = 256
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    table = csr_to_padded(
        tri.point_adjacency(), tri.point_adjacency_offsets()
    )
    params = {
        "primal_points": jnp.asarray(pts),
        "density": jnp.asarray(
            rng.uniform(-0.5, 0.5, (n, 1)).astype(np.float32)
        ),
        "att_dc": jnp.asarray(
            rng.standard_normal((n, 3)).astype(np.float32) * 0.1
        ),
        "att_sh": jnp.zeros((n, 9), jnp.float32),
    }
    R = 8 * 64
    origins = (rng.standard_normal((R, 3)) * 0.2 + [4, 0, 0]).astype(
        np.float32
    )
    dirs = -origins + rng.standard_normal((R, 3)).astype(np.float32) * 0.3
    batch = np.concatenate(
        [
            origins, dirs,
            rng.random((R, 3), dtype=np.float32),
            np.ones((R, 1), np.float32),
            np.zeros((R, 1), np.float32),
        ],
        axis=1,
    ).astype(np.float32)
    cam_starts = jnp.asarray(
        [int(np.argmin(np.sum((pts - origins[0]) ** 2, axis=1)))], jnp.int32
    )
    cfg = StepConfig(
        TraceConfig(sh_degree=1, num_quantiles=2, max_intersections=128,
                    chunk_size=1 << 12),
        1.0, jnp.float32, True,
    )
    return params, jnp.asarray(table), batch, cam_starts, cfg


def test_sharded_step_runs_and_replicates(setup):
    params, table, batch, cam_starts, cfg = setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(jax.devices()[:8])
    step = make_sharded_train_step(cfg, mesh)

    pcopy = jax.tree.map(jnp.copy, params)  # steps donate their inputs
    opt_state = init_opt_state(pcopy)
    lrs = {k: 1e-3 for k in params}
    sb = shard_batch(jnp.asarray(batch), mesh)
    new_params, opt_state, metrics = step(
        pcopy, opt_state, table, cam_starts, sb, lrs, 1e-4,
        jax.random.PRNGKey(0),
    )
    jax.block_until_ready(new_params)
    assert np.isfinite(float(metrics["loss"]))
    # parameters actually moved
    assert not np.allclose(
        np.asarray(new_params["density"]),
        np.asarray(jnp.asarray(np.asarray(params["density"]))),
    )


def test_sharded_matches_single_device(setup):
    """DP over 8 devices must reproduce the single-device step (same loss,
    same updated parameters up to reduction order)."""
    params, table, batch, cam_starts, cfg = setup
    mesh = make_mesh(jax.devices()[:8])
    sharded = make_sharded_train_step(cfg, mesh)
    single = make_train_step(cfg)

    lrs = {k: 1e-3 for k in params}
    key = jax.random.PRNGKey(0)

    pa = jax.tree.map(jnp.copy, params)
    p1, o1, m1 = sharded(
        pa, init_opt_state(params), table, cam_starts,
        shard_batch(jnp.asarray(batch), mesh), lrs, 1e-4, key,
    )
    # the sharded step folds the axis index into the quantile RNG, so exact
    # loss equality is not expected — but magnitudes and movement must agree
    pb = jax.tree.map(jnp.copy, params)
    p2, o2, m2 = single(
        pb, init_opt_state(params), table, cam_starts,
        jnp.asarray(batch), lrs, 1e-4, key,
    )
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) / max(abs(l2), 1e-6) < 0.2
    d1 = np.asarray(p1["att_dc"]) - np.asarray(params["att_dc"])
    d2 = np.asarray(p2["att_dc"]) - np.asarray(params["att_dc"])
    # update directions strongly aligned
    cos = (d1 * d2).sum() / (
        np.linalg.norm(d1) * np.linalg.norm(d2) + 1e-12
    )
    assert cos > 0.9
