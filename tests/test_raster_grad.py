"""Differentiable rasterizer (ops/raster_grad.py) vs a jnp reference.

The reference below re-implements the trainable composite (list order,
weight-threshold gate, OD clamp, quantile depth) in pure differentiable
jnp, so jax.grad through it is ground truth for the custom-vjp Pallas
pair. Both run through the SAME binning/relayout/gather/table-build code,
isolating the kernel math.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radfoam_tpu.ops import raster as R
from radfoam_tpu.ops import raster_grad as RG
from radfoam_tpu.ops.camera import look_at

from tests.test_raster import build_scene, cam_setup

pytestmark = pytest.mark.slow


def _ref_render(points, attrs, nbr_idx, bb_min, bb_max, cam, qlv_tiles,
                *, width, height, cfg):
    """Pure-jnp differentiable replica of raster_grad.render_train."""
    intrin = tuple(
        float(v) for v in R.fov_intrin(cam.fov, width=width, height=height)
    )
    A = attrs.shape[1]
    K = nbr_idx.shape[1]
    Q = qlv_tiles.shape[1]
    sg = jax.lax.stop_gradient
    TS = cfg.tile
    P = TS * TS
    ntx, nty = R._grid_shape(width, height, TS)
    wt = cfg.weight_threshold

    rpacked = R.pack_raster_table(points, attrs, nbr_idx)
    table = R.build_row_table(rpacked, sg(bb_min), sg(bb_max),
                              sh_degree=cfg.sh_degree)
    cell_s, _k, starts, n_pairs = R.bin_pairs(
        sg(bb_min), sg(bb_max), sg(attrs[:, -1]),
        jnp.asarray(cam.position), jnp.asarray(cam.forward),
        jnp.asarray(cam.right), jnp.asarray(cam.up), intrin,
        width=width, height=height, cfg=cfg,
    )
    assert int(n_pairs) <= cfg.max_pairs
    cell_p, nstarts, lens = R.relayout_pairs(
        cell_s, starts, width=width, height=height, cfg=cfg
    )
    rows = jnp.take(table, sg(cell_p), axis=0)

    base = 3 + 3 * K
    Wt = base + A
    D = (A - 1) // 3
    origin = tuple(jnp.float32(v) for v in np.asarray(cam.position))
    cam9 = tuple(
        jnp.float32(v)
        for v in (*np.asarray(cam.forward), *np.asarray(cam.right),
                  *np.asarray(cam.up))
    )
    lens_np = np.asarray(lens)
    nstarts_np = np.asarray(nstarts)
    intrin_j = tuple(jnp.float32(v) for v in intrin)

    tiles = []
    for t in range(ntx * nty):
        dir_rows = R._pixel_dir_rows(
            jnp.int32(t % ntx), jnp.int32(t // ntx), cam9, intrin_j,
            width=width, height=height, tile=TS,
        )
        dirx, diry, dirz = dir_rows
        basis = R._sh_basis_rows(*dir_rows, cfg.sh_degree)
        qlv = qlv_tiles[t]  # (Q, P)
        T = jnp.ones((1, P), jnp.float32)
        rr = rg = rb = jnp.zeros((1, P), jnp.float32)
        qd = jnp.full((Q, P), -1.0, jnp.float32)
        ox, oy, oz = origin
        for i in range(int(lens_np[t])):
            col = rows[int(nstarts_np[t]) + i][:, None]  # (Wrow, 1)
            px = col[0, 0] + col[Wt + 5, 0]
            py = col[1, 0] + col[Wt + 6, 0]
            pz = col[2, 0] + col[Wt + 7, 0]
            vx = col[3 : 3 + K]
            vy = col[3 + K : 3 + 2 * K]
            vz = col[3 + 2 * K : 3 + 3 * K]
            sig = col[base + 3 * D, 0]
            num = (
                vx * (px - ox) + vy * (py - oy) + vz * (pz - oz)
                + 0.5 * (vx * vx + vy * vy + vz * vz)
            )
            den = vx * dirx + vy * diry + vz * dirz
            # safe denominator: padding planes (v = 0 -> den = 0) divide
            # 0/0 and poison the VJP with 0 * inf = NaN even though the
            # where-branches exclude them
            den_s = jnp.where(den == 0.0, 1.0, den)
            tt = num / den_s
            t_out = jnp.min(jnp.where(den > 0.0, tt, jnp.inf), axis=0,
                            keepdims=True)
            t_in = jnp.maximum(
                jnp.max(jnp.where(den < 0.0, tt, 0.0), axis=0,
                        keepdims=True),
                0.0,
            )
            seg = jnp.where(
                jnp.isfinite(t_out), jnp.maximum(t_out - t_in, 0.0), 0.0
            )
            live = T > wt
            od = jnp.where(live, jnp.minimum(sig * seg, RG.OD_CLAMP), 0.0)
            T_next = T * jnp.exp(-od)
            w = T - T_next
            coeffs = col[base : base + 3 * D].reshape(3, D)
            rgb = jnp.maximum(
                0.5 + coeffs @ basis, 0.0
            )  # (3, P)
            con = sig > 1e-6
            rr = rr + w * jnp.where(con, rgb[0:1], 0.0)
            rg = rg + w * jnp.where(con, rgb[1:2], 0.0)
            rb = rb + w * jnp.where(con, rgb[2:3], 0.0)
            hit = live & (T >= qlv) & (T_next < qlv)
            dq = t_in + jnp.log(T / qlv) / sig
            qd = jnp.where(hit, dq, qd)
            T = T_next
        tiles.append(jnp.concatenate([rr, rg, rb, 1.0 - T, qd], axis=0))
    tiles = jnp.stack(tiles)
    return R.tiles_to_image(tiles, width=width, height=height, tile=TS)


def _setup(n_points=700, sh_degree=1, W=32, H=32, Q=2, seed=3):
    pts, attrs, table, bounds = build_scene(
        n_points=n_points, sh_degree=sh_degree, seed=seed, saturate=False
    )
    cam, _ = cam_setup(pts, W, H)
    cfg = R.RasterConfig(sh_degree=sh_degree, weight_threshold=0.01,
                         tile=16, max_pairs=1 << 16, interpret=True,
                         table_k=int(table.shape[1]),
                         grad_planes=int(table.shape[1]))
    ntx, nty = R._grid_shape(W, H, cfg.tile)
    rng = np.random.default_rng(0)
    qlv = -np.sort(
        -rng.uniform(0.02, 0.98, (ntx * nty, Q, cfg.tile * cfg.tile)),
        axis=1,
    ).astype(np.float32)
    return pts, attrs, table, bounds, cam, cfg, jnp.asarray(qlv)


def test_train_forward_matches_reference():
    pts, attrs, table, bounds, cam, cfg, qlv = _setup()
    W = H = 32
    args = (jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(table),
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]))
    ref = _ref_render(*args, cam, qlv, width=W, height=H, cfg=cfg)
    img, n_pairs = RG.render_train(
        *args, jnp.asarray(cam.position), jnp.asarray(cam.forward),
        jnp.asarray(cam.right), jnp.asarray(cam.up),
        R.fov_intrin(jnp.float32(cam.fov), width=W, height=H),
        qlv, width=W, height=H, cfg=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


@pytest.mark.nightly
def test_train_gradients_match_reference():
    # 636 s on one core (round-5 measurement): the full autodiff-vs-
    # manual-VJP parity sweep is the nightly exhaustive golden; the slow
    # tier keeps backward coverage via the cheaper grad_planes-default
    # parity test below (121 s).
    pts, attrs, table, bounds, cam, cfg, qlv = _setup()
    W = H = 32
    rng = np.random.default_rng(1)
    # random cotangent over all channels; qdepth cotangent only where the
    # quantile was reached (qd sentinel -1 is constant)
    wimg = jnp.asarray(
        rng.standard_normal((H, W, 4 + qlv.shape[1])).astype(np.float32)
    )
    targs = (jnp.asarray(table), jnp.asarray(bounds[0]),
             jnp.asarray(bounds[1]))

    def loss_kernel(p, a):
        img, _ = RG.render_train(
            p, a, *targs, jnp.asarray(cam.position),
            jnp.asarray(cam.forward), jnp.asarray(cam.right),
            jnp.asarray(cam.up),
            R.fov_intrin(jnp.float32(cam.fov), width=W, height=H), qlv,
            width=W, height=H, cfg=cfg,
        )
        return jnp.sum(img * wimg)

    def loss_ref(p, a):
        img = _ref_render(p, a, *targs, cam, qlv, width=W, height=H,
                          cfg=cfg)
        return jnp.sum(img * wimg)

    p0 = jnp.asarray(pts)
    a0 = jnp.asarray(attrs)
    gp_k, ga_k = jax.grad(loss_kernel, argnums=(0, 1))(p0, a0)
    gp_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(p0, a0)

    # normalize tolerance by gradient scale. Point grads sum large
    # cancelling per-plane terms; the manual-VJP neighbor scatter adds
    # them in a different order than autodiff, so a few points carry
    # ~1e-3 relative f32 association noise — bound the tail loosely and
    # the bulk tightly.
    sp = float(jnp.max(jnp.abs(gp_r))) + 1e-8
    sa = float(jnp.max(jnp.abs(ga_r))) + 1e-8
    dp_n = np.abs(np.asarray(gp_k) - np.asarray(gp_r)) / sp
    assert dp_n.max() < 2e-3, dp_n.max()
    assert np.quantile(dp_n, 0.99) < 2e-4, np.quantile(dp_n, 0.99)
    np.testing.assert_allclose(
        np.asarray(ga_k) / sa, np.asarray(ga_r) / sa, atol=2e-4
    )
    # gradients are non-trivial
    assert float(jnp.linalg.norm(gp_r)) > 0
    assert float(jnp.linalg.norm(ga_r)) > 0


def test_raster_train_smoke():
    """End-to-end raster-engine training (train_engine=raster): loss and
    eval PSNR improve on the synthetic scene, exercising the full loop
    (triangulation cadence, bounds cache, densify) through the
    differentiable raster step."""
    from radfoam_tpu.data.synthetic import (
        make_ground_truth_scene,
        render_views,
        SyntheticDataHandler,
    )
    from radfoam_tpu.models.scene import RadFoamScene
    from radfoam_tpu.ops.trace import TraceConfig
    from radfoam_tpu.train.loop import train
    from radfoam_tpu.train.loop import test_render as eval_render
    from radfoam_tpu.train.step import StepConfig

    SH = 1
    pts, attrs, table, _ = make_ground_truth_scene(n_points=400,
                                                   sh_degree=SH)
    rays, rgbs, alphas, cams = render_views(
        pts, attrs, table, SH, n_views=4, wh=(48, 48), return_cams=True
    )

    class ModelArgs:
        sh_degree = SH
        init_points = 512
        final_points = 1024
        activation_scale = 1.0

    class PipelineArgs:
        iterations = 20
        densify_from = 8
        densify_until = 16
        densify_factor = 1.1
        white_background = True
        quantile_weight = 1e-4
        experiment_name = ""
        debug = True
        viewer = False
        train_engine = "raster"

    class OptimizerArgs:
        points_lr_init = 2e-4
        points_lr_final = 5e-6
        density_lr_init = 1e-1
        density_lr_final = 1e-2
        attributes_lr_init = 5e-3
        attributes_lr_final = 5e-4
        sh_factor = 0.1
        freeze_points = 18

    class DatasetArgs:
        dataset = "synthetic"
        data_path = ""
        scene = "blob"
        patch_based = False
        downsample = [1]
        downsample_iterations = [0]

    class HandlerFactory:
        def __init__(self, dataset_args, rays_per_batch, device=None):
            self.h = SyntheticDataHandler(
                rays, rgbs, alphas, rays_per_batch=0, points3D=pts,
                cams=cams,
            )

        def __getattr__(self, name):
            return getattr(self.h, name)

    model, final_psnr, _ = train(
        None, PipelineArgs(), ModelArgs(), OptimizerArgs(), DatasetArgs(),
        data_handler_cls=HandlerFactory,
    )

    fresh = RadFoamScene(ModelArgs(), points=pts, seed=123)
    cfg = StepConfig(
        TraceConfig(sh_degree=SH, num_quantiles=2), 1.0, jnp.float32, True
    )
    handler = SyntheticDataHandler(rays, rgbs, alphas, points3D=pts,
                                   cams=cams)
    initial_psnr = eval_render(fresh, cfg, handler)
    assert np.isfinite(final_psnr)
    assert final_psnr > initial_psnr + 0.5, (
        f"raster training did not improve: "
        f"{initial_psnr:.2f} -> {final_psnr:.2f}"
    )


def test_train_gradients_grad_planes_default():
    """The SHIPPED default (grad_planes=8, configs/__init__.py) against the
    exact S=K gradients: S only gates sub-top-8 NEIGHBOR-side plane
    gradients per pair, so attribute gradients are bit-identical and point
    gradients stay within a small cosine/relative-L2 budget (measured
    chip-scale numbers in DEVNOTES "grad_planes A/B")."""
    pts, attrs, table, bounds, cam, cfg, qlv = _setup()
    W = H = 32
    rng = np.random.default_rng(4)
    wimg = jnp.asarray(
        rng.standard_normal((H, W, 4 + qlv.shape[1])).astype(np.float32)
    )
    targs = (jnp.asarray(table), jnp.asarray(bounds[0]),
             jnp.asarray(bounds[1]))

    def loss(p, a, c):
        img, _ = RG.render_train(
            p, a, *targs, jnp.asarray(cam.position),
            jnp.asarray(cam.forward), jnp.asarray(cam.right),
            jnp.asarray(cam.up),
            R.fov_intrin(jnp.float32(cam.fov), width=W, height=H), qlv,
            width=W, height=H, cfg=c,
        )
        return jnp.sum(img * wimg)

    p0 = jnp.asarray(pts)
    a0 = jnp.asarray(attrs)
    cfg8 = cfg._replace(grad_planes=8)
    gp_k, ga_k = jax.grad(loss, argnums=(0, 1))(p0, a0, cfg)
    gp_8, ga_8 = jax.grad(loss, argnums=(0, 1))(p0, a0, cfg8)

    # attribute grads: exactly unaffected by the plane cap
    np.testing.assert_array_equal(np.asarray(ga_8), np.asarray(ga_k))

    # point grads: high directional fidelity, bounded relative L2
    v8 = np.asarray(gp_8).ravel()
    vk = np.asarray(gp_k).ravel()
    cos = float(v8 @ vk / (np.linalg.norm(v8) * np.linalg.norm(vk) + 1e-30))
    rel = float(np.linalg.norm(v8 - vk) / (np.linalg.norm(vk) + 1e-30))
    assert cos > 0.995, cos
    assert rel < 0.1, rel


def test_multiview_step_matches_single_view():
    """views=2 with two crops tiling ONE camera's image must equal the
    views=1 full-image step: a row-crop is a pure intrinsics shift
    (v = ay*(y' + y0) + by) and the multi-view loss averages per-crop
    pixel means, which equals the full-image pixel mean for equal-size
    crops. w_depth = 0 removes the per-view quantile RNG from the loss.
    (train/raster_step.py multi-view — the raster analog of the
    reference's mixed-image ray batches, reference train.py:60-62)."""
    from radfoam_tpu.train.raster_step import (
        RasterStepConfig, make_raster_train_step,
    )
    from radfoam_tpu.train.step import init_opt_state

    SH = 1
    pts, attrs, table, bounds, cam, cfg, _qlv = _setup(sh_degree=SH)
    W = H = 32
    Hc = 16
    intrin = np.asarray(
        R.fov_intrin(float(cam.fov), width=W, height=H), np.float32
    )
    basis = np.stack([
        np.asarray(cam.position), np.asarray(cam.forward),
        np.asarray(cam.right), np.asarray(cam.up),
    ]).astype(np.float32)

    D = (SH + 1) ** 2
    n = pts.shape[0]
    rng = np.random.default_rng(7)
    params = {
        "primal_points": jnp.asarray(pts),
        "density": jnp.asarray(
            np.log(np.expm1(np.maximum(attrs[:, -1:], 1e-4)))
        ),
        "att_dc": jnp.asarray(attrs[:, :3]),
        "att_sh": jnp.asarray(attrs[:, 3 : 3 * D]),
    }
    gt = rng.uniform(0.0, 1.0, (H, W, 3)).astype(np.float32)
    gt_alpha = np.ones((H, W, 1), np.float32)
    lrs = {k: 1e-3 for k in params}
    key = jax.random.PRNGKey(0)

    single = make_raster_train_step(
        RasterStepConfig(cfg, 1.0, jnp.float32, True, W, H)
    )
    p1, _, m1 = single(
        jax.tree.map(jnp.copy, params), init_opt_state(params),
        jnp.asarray(table), jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        jnp.asarray(basis), jnp.asarray(intrin), jnp.asarray(gt),
        jnp.asarray(gt_alpha), lrs, 0.0, key,
    )

    ax, bx, ay, by = (float(v) for v in intrin)
    intrin2 = np.asarray(
        [[ax, bx, ay, by], [ax, bx, ay, by + ay * Hc]], np.float32
    )
    multi = make_raster_train_step(
        RasterStepConfig(cfg, 1.0, jnp.float32, True, W, Hc, views=2)
    )
    p2, _, m2 = multi(
        jax.tree.map(jnp.copy, params), init_opt_state(params),
        jnp.asarray(table), jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
        jnp.asarray(np.broadcast_to(basis, (2, 4, 3)).copy()),
        jnp.asarray(intrin2),
        jnp.asarray(np.stack([gt[:Hc], gt[Hc:]])),
        jnp.asarray(np.stack([gt_alpha[:Hc], gt_alpha[Hc:]])),
        lrs, 0.0, key,
    )

    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) < 1e-5 * max(abs(l1), 1.0), (l1, l2)
    # Adam-update comparison: the crop pair scatters gradients in a
    # different float-addition order than the full frame, and one Adam
    # step amplifies near-zero grads to O(lr) (g/sqrt(g^2) ~ sign(g)),
    # so exact update equality only holds where grads are not ~0. Bound
    # the mismatch instead: updates agree within 20% of lr everywhere,
    # and to 0.2% where the update is a meaningful fraction of lr.
    lr = 1e-3
    for k in params:
        d1 = np.asarray(p1[k]) - np.asarray(params[k])
        d2 = np.asarray(p2[k]) - np.asarray(params[k])
        np.testing.assert_allclose(d2, d1, rtol=0.0, atol=0.2 * lr,
                                   err_msg=k)
        big = np.abs(d1) > 0.5 * lr
        np.testing.assert_allclose(d2[big], d1[big], rtol=2e-3,
                                   atol=1e-7, err_msg=k)
