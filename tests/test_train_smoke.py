"""End-to-end smoke training on a synthetic scene: every layer from data
fetch through trace/backward/Adam to triangulation updates and
densification, asserting the reconstruction improves (SURVEY.md §4's smoke
strategy; the reference's analog is reduced-points Blender lego)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radfoam_tpu.data.synthetic import (
    make_ground_truth_scene,
    render_views,
    SyntheticDataHandler,
)
from radfoam_tpu.models.scene import RadFoamScene
from radfoam_tpu.ops.trace import TraceConfig
from radfoam_tpu.train.loop import train, collect_error_map
from radfoam_tpu.train.loop import test_render as eval_render
from radfoam_tpu.train.step import StepConfig


SH_DEGREE = 1


class ModelArgs:
    sh_degree = SH_DEGREE
    init_points = 512
    final_points = 2048
    activation_scale = 1.0


class PipelineArgs:
    iterations = 60
    densify_from = 20
    densify_until = 50
    densify_factor = 1.15
    white_background = True
    quantile_weight = 1e-4
    experiment_name = ""
    debug = True
    viewer = False


class OptimizerArgs:
    points_lr_init = 2e-4
    points_lr_final = 5e-6
    density_lr_init = 1e-1
    density_lr_final = 1e-2
    attributes_lr_init = 5e-3
    attributes_lr_final = 5e-4
    sh_factor = 0.1
    freeze_points = 55


class DatasetArgs:
    dataset = "synthetic"
    data_path = ""
    scene = "blob"
    patch_based = False
    downsample = [1]
    downsample_iterations = [0]


@pytest.fixture(scope="module")
def synthetic():
    pts, attrs, table, _ = make_ground_truth_scene(
        n_points=400, sh_degree=SH_DEGREE
    )
    rays, rgbs, alphas = render_views(
        pts, attrs, table, SH_DEGREE, n_views=5, wh=(48, 48)
    )
    return pts, rays, rgbs, alphas


def test_smoke_train_improves_psnr(synthetic):
    pts, rays, rgbs, alphas = synthetic

    class HandlerFactory:
        def __init__(self, dataset_args, rays_per_batch, device=None):
            self.h = SyntheticDataHandler(
                rays, rgbs, alphas,
                rays_per_batch=max(rays_per_batch, 1) if rays_per_batch
                else 0,
                points3D=pts,
            )
            self.h.rays_per_batch = 4096
            self.h.batch_size = 4096

        def __getattr__(self, name):
            return getattr(self.h, name)

    model, final_psnr, _ = train(
        None, PipelineArgs(), ModelArgs(), OptimizerArgs(), DatasetArgs(),
        data_handler_cls=HandlerFactory,
    )

    # baseline: untrained model on the same data
    fresh = RadFoamScene(ModelArgs(), points=pts, seed=123)
    cfg = StepConfig(
        TraceConfig(sh_degree=SH_DEGREE, num_quantiles=2),
        1.0, jnp.float32, True,
    )
    handler = SyntheticDataHandler(rays, rgbs, alphas, points3D=pts)
    initial_psnr = eval_render(fresh, cfg, handler)

    assert np.isfinite(final_psnr)
    assert final_psnr > initial_psnr + 1.0, (
        f"training did not improve: {initial_psnr:.2f} -> {final_psnr:.2f}"
    )


def test_collect_error_map_shapes(synthetic):
    pts, rays, rgbs, alphas = synthetic
    model = RadFoamScene(ModelArgs(), points=pts, seed=5)
    cfg = StepConfig(
        TraceConfig(sh_degree=SH_DEGREE, num_quantiles=2),
        1.0, jnp.float32, True,
    )
    handler = SyntheticDataHandler(rays[:2], rgbs[:2], alphas[:2],
                                   points3D=pts)
    err, contrib = collect_error_map(model, cfg, handler)
    assert err.shape == (model.capacity,)
    assert contrib.shape == (model.capacity,)
    assert np.isfinite(err).all()
    assert (contrib >= 0).all()
    assert contrib[: model.n_points].max() > 0


def test_lazy_adam_matches_adam_on_touched_rows():
    """_lazy_adam_update == optax adam for rows touched every step;
    untouched rows keep moments verbatim and take no update."""
    import optax
    from radfoam_tpu.train.raster_step import _lazy_adam_update

    rng = np.random.default_rng(0)
    C = 16
    params = {
        "primal_points": jnp.asarray(rng.standard_normal((C, 3)),
                                     jnp.float32),
        "density": jnp.asarray(rng.standard_normal((C, 1)), jnp.float32),
    }
    adam = optax.scale_by_adam(eps=1e-15)
    st_ref = adam.init(params)
    st_lazy = adam.init(params)

    touched = np.zeros((C,), bool)
    touched[: C // 2] = True  # rows 0..7 touched every step, 8..15 never
    for i in range(3):
        g = {
            k: jnp.asarray(
                rng.standard_normal(v.shape) * touched[:, None],
                jnp.float32,
            )
            for k, v in params.items()
        }
        u_ref, st_ref = adam.update(g, st_ref, params)
        u_lazy, st_lazy = _lazy_adam_update(g, st_lazy, params)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(u_lazy[k])[: C // 2],
                np.asarray(u_ref[k])[: C // 2], rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_array_equal(
                np.asarray(u_lazy[k])[C // 2 :], 0.0
            )
            np.testing.assert_array_equal(
                np.asarray(st_lazy.mu[k])[C // 2 :], 0.0
            )
