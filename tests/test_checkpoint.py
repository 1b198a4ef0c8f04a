"""Mid-training checkpoint/resume roundtrip + config file parsing."""

import numpy as np
import jax.numpy as jnp
import pytest

from radfoam_tpu.models.scene import RadFoamScene
from radfoam_tpu.train.checkpoint import save_checkpoint, load_checkpoint


class Args:
    sh_degree = 1
    init_points = 128
    final_points = 512
    activation_scale = 1.0


class Opt:
    points_lr_init = 2e-4
    points_lr_final = 5e-6
    density_lr_init = 1e-1
    density_lr_final = 1e-2
    attributes_lr_init = 5e-3
    attributes_lr_final = 5e-4
    sh_factor = 0.1
    freeze_points = 100


def test_checkpoint_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((120, 3)).astype(np.float32)
    m = RadFoamScene(Args(), points=pts, seed=1)
    m.declare_optimizer(Opt(), warmup=10, max_iterations=100)
    # make moments non-trivial
    import optax
    import jax

    m.optimizer_state = optax.ScaleByAdamState(
        count=jnp.asarray(7),
        mu=jax.tree.map(lambda a: a * 0.5 + 1.0, m.params),
        nu=jax.tree.map(lambda a: jnp.abs(a) + 0.1, m.params),
    )

    path = str(tmp_path / "checkpoint.npz")
    save_checkpoint(path, m, iteration=123, extra={"period": 5})

    m2 = RadFoamScene(Args(), seed=2)
    m2.declare_optimizer(Opt(), warmup=10, max_iterations=100)
    it, extra = load_checkpoint(path, m2)
    assert it == 123
    assert extra["period"] == 5
    assert m2.n_points == m.n_points
    np.testing.assert_array_equal(
        np.asarray(m2.primal_points), np.asarray(m.primal_points)
    )
    assert int(m2.optimizer_state.count) == 7
    np.testing.assert_allclose(
        np.asarray(m2.optimizer_state.mu["density"])[: m.n_points],
        np.asarray(m.optimizer_state.mu["density"])[: m.n_points],
    )
    np.testing.assert_array_equal(m2.point_adjacency, m.point_adjacency)
    # model still renders
    rays = np.concatenate([
        np.full((8, 3), 4.0, np.float32), np.full((8, 3), -1.0, np.float32)
    ], axis=-1)
    rgba, _, _, _ = m2.forward(jnp.asarray(rays))
    assert np.isfinite(np.asarray(rgba)).all()


def test_shipped_configs_parse():
    """The three shipped YAML configs must drive the CLI parser exactly like
    the reference's (configs/*.yaml keys)."""
    import os

    from radfoam_tpu.configs import (
        ArgParser, DatasetParams, ModelParams, OptimizationParams,
        PipelineParams,
    )

    cfg_dir = os.path.join(
        os.path.dirname(__file__), "..", "radfoam_tpu", "configs"
    )
    for name, final_points, sh_factor in [
        ("mipnerf360_indoor.yaml", 2_097_152, 0.1),
        ("mipnerf360_outdoor.yaml", 4_194_304, 0.02),
        ("db.yaml", 3_145_728, 0.01),
    ]:
        parser = ArgParser()
        mp = ModelParams(parser)
        pp = PipelineParams(parser)
        op = OptimizationParams(parser)
        dp = DatasetParams(parser)
        parser.add_argument("-c", "--config", is_config_file=True)
        args = parser.parse_args(["-c", os.path.join(cfg_dir, name)])
        m = mp.extract(args)
        o = op.extract(args)
        p = pp.extract(args)
        assert m.final_points == final_points, name
        assert o.sh_factor == sh_factor, name
        assert p.iterations == 20_000
        assert o.points_lr_init == 2e-4
        # CLI override still wins over the config file
        args2 = parser.parse_args(
            ["-c", os.path.join(cfg_dir, name), "--sh_degree", "2"]
        )
        assert mp.extract(args2).sh_degree == 2
