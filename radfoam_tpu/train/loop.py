"""Host-side training orchestration.

Reproduces the reference training loop (train.py:29-313): multi-resolution
downsample schedule, triangulation-update cadence (period 1 growing by 2 up
to 100), linear-growth densification schedule targeting final_points by
densify_until, point freeze, periodic eval, TensorBoard scalars, and final
checkpoint export.
"""

import gc
import os

import numpy as np
import jax
import jax.numpy as jnp
import tqdm

from radfoam_tpu.models.scene import RadFoamScene
from radfoam_tpu.ops.trace import TraceConfig
from radfoam_tpu.train.step import (
    StepConfig,
    init_opt_state,
    make_train_step,
    make_eval_render,
    make_error_map_step,
)
from radfoam_tpu.utils.math import psnr


def pair_capacity(capacity, width, height):
    """Static pair-buffer capacity for the raster engine.

    Pairs scale with BOTH the live point count (dense scenes) and the image
    area (sparse scenes: each cell covers many pixels — measured 0.7-1.3
    pairs/pixel from 32k to 2M points, but up to 8.5 pairs/point at 131k on
    800x800), so the cap floors at 1.5x the pixel count and 12x the point
    capacity; 2M pairs bounds the step's dominant buffers inside HBM at the
    2M-point worst case.
    """
    return int(
        min(2 << 20, max(1 << 18, 12 * capacity, (width * height * 3) // 2))
    )


def camera_start_points(model, data_handler):
    """Per-image trace start cells from each camera origin."""
    origins = np.asarray(data_handler.rays[:, 0, 0, :3])
    return model.get_starting_point(jnp.asarray(origins))


class RasterSceneCtx:
    """Per-triangulation raster-engine scene state for eval and error
    maps: the activated attributes, the scene row table, clamped bounds,
    and the dataset's exact camera (VERDICT r2 task 7 — these paths
    previously re-walked every ray at ~105 s/view at 2M points).

    Build one per use site (eval pass / densify epoch); everything is
    derived from the CURRENT params + triangulation and must not outlive
    them.
    """

    def __init__(self, model, handler, *, with_nbr_ids=False):
        from radfoam_tpu.models.scene import activate_attributes
        from radfoam_tpu.ops.raster import build_scene_table

        self.model = model
        self.handler = handler
        self.width = int(handler.img_wh[0])
        self.height = int(handler.img_wh[1])
        self.attrs = jax.jit(
            lambda p: activate_attributes(
                p, model.activation_scale, model.attr_dtype
            ).astype(jnp.float32)
        )(model.params)
        self.bb_min, self.bb_max = model.raster_bounds()
        self.density = self.attrs[:, -1]
        dir_grid_np, intrin_np, self.pad_px = handler.raster_dir_grid()
        self.intrin = np.asarray(intrin_np, np.float32)
        self.dir_grid = (
            jax.device_put(dir_grid_np) if dir_grid_np is not None
            else None
        )
        self.with_nbr_ids = with_nbr_ids
        if not with_nbr_ids:
            # inference row table (eval); the error map builds its own
            # inside render_error_map
            chunks = 8 if model.capacity > 1 << 20 else None
            self.table = jax.jit(
                lambda p, a, t, b0, b1: build_scene_table(
                    p, a, t, b0, b1, sh_degree=model.sh_degree,
                    chunks=chunks,
                )
            )(model.params["primal_points"], self.attrs, model.nbr_idx,
              self.bb_min, self.bb_max)

    def camera(self, i):
        basis, _ = self.handler.raster_camera(i)
        return jnp.asarray(basis)

    def eval_cfg(self, max_pairs):
        from radfoam_tpu.ops.raster import RasterConfig

        return RasterConfig(
            sh_degree=self.model.sh_degree, weight_threshold=1e-3,
            tile=16, max_pairs=max_pairs, alpha_cull=0.0,
            table_k=int(self.model.pad_degree), reorder_window=8,
        )


def raster_test_render(model, pipeline_args, test_data_handler,
                       out_dir=None, save_images=False, max_views=None):
    """test_render through the raster engine (parity-tested against the
    walk at 37.6 dB; reference train.py:104-147)."""
    from radfoam_tpu.ops.raster import render_frame_staged

    ctx = RasterSceneCtx(model, test_data_handler)
    cap = pair_capacity(model.capacity, ctx.width, ctx.height)
    cfg = ctx.eval_cfg(cap)
    rays = test_data_handler.rays
    n_views = rays.shape[0] if max_views is None else min(
        rays.shape[0], max_views
    )
    psnr_list = []
    for i in range(n_views):
        basis = ctx.camera(i)
        # pair-capacity overflow truncates the image silently inside the
        # kernel — never report a PSNR for a truncated render: retry with
        # a doubled cap (recompiles; overflow is rare) and warn.
        for _attempt in range(4):
            img, n_pairs, _forced = render_frame_staged(
                ctx.table, ctx.bb_min, ctx.bb_max, ctx.density,
                basis[0], basis[1], basis[2], basis[3], jnp.float32(1.0),
                width=ctx.width, height=ctx.height, cfg=cfg,
                dir_grid=ctx.dir_grid, pad_px=ctx.pad_px,
                intrin=tuple(jnp.float32(v) for v in ctx.intrin),
            )
            if int(n_pairs) <= cfg.max_pairs:
                break
            print(
                f"warning: view {i} overflowed the pair capacity "
                f"({int(n_pairs)} > {cfg.max_pairs}); retrying with a "
                f"doubled cap"
            )
            cfg = cfg._replace(max_pairs=2 * cfg.max_pairs)
        else:
            raise RuntimeError(
                f"view {i}: pair capacity still exceeded at "
                f"{cfg.max_pairs} — refusing to write a truncated PSNR"
            )
        img = np.asarray(img)
        rgb = img[..., :3]
        if pipeline_args.white_background:
            rgb = rgb + (1.0 - img[..., 3:4])
        rgb = np.clip(rgb, 0.0, 1.0)
        gt = np.asarray(test_data_handler.rgbs[i])
        img_psnr = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))
        psnr_list.append(img_psnr)
        if save_images and out_dir is not None:
            from PIL import Image

            error = np.uint8(np.abs(rgb - gt) * 255)
            trip = np.concatenate(
                [np.uint8(rgb * 255), np.uint8(gt * 255), error], axis=1
            )
            Image.fromarray(trip).save(
                f"{out_dir}/test/rgb_{i:03d}_psnr_{img_psnr:.3f}.png"
            )
    average_psnr = sum(psnr_list) / len(psnr_list)
    if save_images and out_dir is not None:
        with open(f"{out_dir}/metrics.txt", "w") as f:
            f.write(f"Average PSNR: {average_psnr}")
    return average_psnr


def collect_error_map_raster(model, pipeline_args, data_handler):
    """Densify-epoch error map through the raster engine: one fwd +
    reverse sweep per train view instead of the ~105 s/view walk
    (VERDICT r2 task 7; reference scene.py:497-548)."""
    from functools import partial

    from radfoam_tpu.ops.raster import RasterConfig
    from radfoam_tpu.ops.raster_grad import render_error_map

    ctx = RasterSceneCtx(model, data_handler, with_nbr_ids=True)
    cap = pair_capacity(model.capacity, ctx.width, ctx.height)
    cfg = RasterConfig(
        sh_degree=model.sh_degree, weight_threshold=1e-3, tile=16,
        max_pairs=cap, alpha_cull=0.0, table_k=int(model.pad_degree),
        reorder_window=0, emit_contrib=True,
    )
    W, H = ctx.width, ctx.height
    has_dirs = ctx.dir_grid is not None

    @partial(jax.jit, static_argnames=("has_dirs",))
    def one_view(params, attrs, nbr_idx, bmin, bmax, basis, gt,
                 dir_grid=None, has_dirs=False):
        intrin_t = tuple(jnp.float32(v) for v in ctx.intrin)
        return render_error_map(
            params["primal_points"], attrs, nbr_idx, bmin, bmax,
            basis[0], basis[1], basis[2], basis[3], intrin_t, gt,
            width=W, height=H, cfg=cfg,
            white_background=pipeline_args.white_background,
            dir_grid=dir_grid if has_dirs else None, pad_px=ctx.pad_px,
        )

    C = model.capacity
    err = np.zeros((C,), np.float32)
    contrib = np.zeros((C,), np.float32)
    for i in range(data_handler.rgbs.shape[0]):
        gt = jnp.asarray(data_handler.rgbs[i])
        e_v, c_v = one_view(
            model.params, ctx.attrs, model.nbr_idx, ctx.bb_min,
            ctx.bb_max, ctx.camera(i), gt, dir_grid=ctx.dir_grid,
            has_dirs=has_dirs,
        )
        err += np.asarray(e_v)
        contrib = np.maximum(contrib, np.asarray(c_v))
    return err, contrib


def test_render(model, step_cfg, test_data_handler, out_dir=None,
                save_images=False, iteration=None, max_views=None):
    """Render the test split, return average PSNR
    (reference train.py:104-147)."""
    render = make_eval_render(step_cfg)
    rays = test_data_handler.rays
    starts = np.asarray(camera_start_points(model, test_data_handler))

    n_views = rays.shape[0] if max_views is None else min(
        rays.shape[0], max_views
    )
    psnr_list = []
    for i in range(n_views):
        ray_batch = jnp.asarray(rays[i])
        rgb_batch = jnp.asarray(test_data_handler.rgbs[i])
        rgb_out = render(
            model.params, model.nbr_idx, ray_batch, int(starts[i])
        )
        img_psnr = float(psnr(rgb_out, rgb_batch))
        psnr_list.append(img_psnr)

        if save_images and out_dir is not None:
            from PIL import Image

            rgb_np = np.asarray(rgb_out)
            gt_np = np.asarray(rgb_batch)
            error = np.uint8(np.abs(rgb_np - gt_np) * 255)
            trip = np.concatenate(
                [np.uint8(rgb_np * 255), np.uint8(gt_np * 255), error],
                axis=1,
            )
            Image.fromarray(trip).save(
                f"{out_dir}/test/rgb_{i:03d}_psnr_{img_psnr:.3f}.png"
            )

    average_psnr = sum(psnr_list) / len(psnr_list)
    if save_images and out_dir is not None:
        with open(f"{out_dir}/metrics.txt", "w") as f:
            f.write(f"Average PSNR: {average_psnr}")
    return average_psnr


def collect_error_map(model, step_cfg, data_handler, downsample=2, rng=None):
    """Accumulate per-point error (position-grad norm) and max contribution
    over all train views (reference scene.py:497-548)."""
    rng = rng or np.random.default_rng(0)
    err_step = make_error_map_step(step_cfg)
    rays = data_handler.rays
    rgbs = data_handler.rgbs
    starts = np.asarray(camera_start_points(model, data_handler))

    C = model.capacity
    err = jnp.zeros((C,), jnp.float32)
    contrib = jnp.zeros((C,), jnp.float32)
    H, W = rays.shape[1], rays.shape[2]
    h2, w2 = H // downsample, W // downsample

    for i in range(rays.shape[0]):
        d0, d1 = rng.integers(0, downsample, size=2)
        sub_rays = rays[i, d0 : d0 + h2 * downsample : downsample,
                        d1 : d1 + w2 * downsample : downsample]
        sub_rgbs = rgbs[i, d0 : d0 + h2 * downsample : downsample,
                        d1 : d1 + w2 * downsample : downsample]
        err, contrib = err_step(
            model.params, model.nbr_idx,
            jnp.asarray(sub_rays), jnp.asarray(sub_rgbs),
            int(starts[i]), err, contrib,
        )
    return np.asarray(err), np.asarray(contrib)


def _raster_step(model, pipeline_args, handler, cam_rng, lrs, w_depth,
                 key):
    """One raster-engine training iteration (train/raster_step.py).

    train_views = 1: a random camera's full image. train_views = G > 1:
    G full-width strip crops from G random cameras, losses averaged —
    the raster analog of the reference's mixed-image 1M-ray batches
    (reference train.py:60-62); the single-view step's one-viewpoint
    gradients measured 1.47 dB worse on the engine-A/B schedule
    (DEVNOTES "engine convergence A/B").
    """
    from radfoam_tpu.ops.raster import RasterConfig
    from radfoam_tpu.train.raster_step import (
        RasterStepConfig,
        make_raster_train_step,
    )

    Wd, Hd = int(handler.img_wh[0]), int(handler.img_wh[1])
    # exact camera: per-tile direction grid when the dataset's lens
    # departs from the affine model (distorted COLMAP cameras), with the
    # fitted affine intrinsics + conservative margin for binning
    dir_grid_np, intrin_np, pad_px = handler.raster_dir_grid()
    dir_grid_dev = None
    if dir_grid_np is not None:
        # one HtoD upload per reload, not per step (the grid is shared by
        # every view — camera-frame directions are pose-independent)
        dir_grid_dev = getattr(handler, "_dir_grid_dev", None)
        if dir_grid_dev is None:
            dir_grid_dev = jax.device_put(dir_grid_np)
            handler._dir_grid_dev = dir_grid_dev

    views = int(getattr(pipeline_args, "train_views", 1))
    full_views = views == 0
    if full_views:
        # auto: G FULL frames per step so the step's pixel budget matches
        # the walk engine's rays_per_batch (reference train.py:61 draws
        # 1M mixed-image rays per step; one 400x400 view is 6x less data
        # per update — measured 4.6 dB worse on the probe schedule,
        # DEVNOTES "engine convergence A/B round 5, batch size").
        rpb = int(getattr(pipeline_args, "rays_per_batch", 1_000_000))
        views = max(1, min(int(round(rpb / float(Wd * Hd))),
                           int(handler.rgbs.shape[0]), 8))
    views = max(1, views)
    tile = 16
    if views > 1 and (full_views
                      or (dir_grid_np is None and Hd // views >= tile)):
        # multi-view strip crops: the affine intrinsics make a row-crop a
        # pure principal-point shift (v = ay*(y' + y0) + by); per-tile
        # dir grids are full-frame arrays, so distorted cameras fall back
        # to single view for CROPS — full-frame views reuse the shared
        # grid as-is
        Hc = Hd if full_views else (Hd // views) // tile * tile
        cams = cam_rng.integers(handler.rgbs.shape[0], size=views)
        y0s = (np.zeros(views, np.int64) if full_views
               else cam_rng.integers(0, Hd - Hc + 1, size=views))
        ax, bx, ay, by = (float(v) for v in intrin_np)
        gt_rgb = jnp.asarray(np.stack(
            [handler.rgbs[c, y0 : y0 + Hc] for c, y0 in zip(cams, y0s)]
        ))
        gt_alpha = jnp.asarray(np.stack(
            [handler.alphas[c].reshape(Hd, Wd, 1)[y0 : y0 + Hc]
             for c, y0 in zip(cams, y0s)]
        ))
        cam_basis = jnp.asarray(np.stack(
            [handler.raster_camera(int(c))[0] for c in cams]
        ))
        intrin = jnp.asarray(np.stack(
            [[ax, bx, ay, by + ay * float(y0)] for y0 in y0s]
        ).astype(np.float32))
        step_h = Hc
    else:
        views = 1
        i_cam = int(cam_rng.integers(handler.rgbs.shape[0]))
        gt_rgb = jnp.asarray(handler.rgbs[i_cam])
        gt_alpha = jnp.asarray(
            handler.alphas[i_cam].reshape(*handler.rgbs.shape[1:3], 1)
        )
        basis_np, _ = handler.raster_camera(i_cam)
        cam_basis = jnp.asarray(basis_np)
        intrin = jnp.asarray(intrin_np)
        step_h = Hd

    bb_min, bb_max = model.raster_bounds()
    # pair cap sizes the step's dominant buffers (rows is aliased into
    # its gradient, plus the dnbr channel); overflow truncates with a
    # warning at the periodic sync below
    cap = pair_capacity(model.capacity, Wd, step_h)
    gp = int(getattr(pipeline_args, "grad_planes", 8))
    if gp <= 0:
        gp = int(model.pad_degree)  # exact: keep every neighbor plane
    rcfg = RasterConfig(
        sh_degree=model.sh_degree, weight_threshold=1e-3, tile=tile,
        max_pairs=cap, alpha_cull=0.0, table_k=int(model.pad_degree),
        reorder_window=0, grad_planes=gp,
    )
    rstep = make_raster_train_step(
        RasterStepConfig(
            rcfg, model.activation_scale, model.attr_dtype,
            pipeline_args.white_background, Wd, step_h, views=views,
            lazy_adam=bool(getattr(pipeline_args, "lazy_adam", False)),
        )
    )
    params, opt_state, metrics = rstep(
        model.params, model.optimizer_state, model.nbr_idx, bb_min,
        bb_max, cam_basis, intrin, gt_rgb, gt_alpha, lrs, w_depth, key,
        dir_grid=dir_grid_dev,
        pad_px=jnp.float32(pad_px),
        has_dirs=dir_grid_dev is not None,
    )
    metrics["pair_cap"] = cap  # checked at the periodic sync points
    return params, opt_state, metrics


def train(args, pipeline_args, model_args, optimizer_args, dataset_args,
          data_handler_cls=None, writer=None, resume_from=None,
          checkpoint_every=0, async_triangulation=True):
    """Full training run; returns (model, final average PSNR, out_dir).

    Extensions over the reference loop: optional mid-training resume
    (resume_from = path to a snapshot written by checkpoint_every > 0),
    the HTTP viewer when pipeline_args.viewer is set, and asynchronous
    triangulation rebuilds overlapped with device steps
    (async_triangulation=False restores the reference's synchronous
    cadence).
    """
    from radfoam_tpu.data import DataHandler

    handler_cls = data_handler_cls or DataHandler

    out_dir = None
    if not pipeline_args.debug:
        import uuid
        import yaml

        if len(pipeline_args.experiment_name) == 0:
            experiment_name = f"{dataset_args.scene}@{str(uuid.uuid4())[:8]}"
        else:
            experiment_name = pipeline_args.experiment_name
        out_dir = f"output/{experiment_name}"
        os.makedirs(f"{out_dir}/test", exist_ok=True)
        with open(f"{out_dir}/config.yaml", "w") as f:
            yaml.dump(vars(args), f, default_flow_style=False)
        if writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                writer = SummaryWriter(out_dir, purge_step=0)
            except Exception:
                writer = None

    iter2downsample = dict(
        zip(dataset_args.downsample_iterations, dataset_args.downsample)
    )
    train_data_handler = handler_cls(
        dataset_args,
        rays_per_batch=int(getattr(pipeline_args, "rays_per_batch",
                                   1_000_000)),
    )
    downsample = iter2downsample[0]
    train_data_handler.reload(split="train", downsample=downsample)

    test_data_handler = handler_cls(dataset_args, rays_per_batch=0)
    test_data_handler.reload(
        split="test", downsample=min(dataset_args.downsample)
    )

    model = RadFoamScene(
        args=model_args,
        points=train_data_handler.points3D,
        points_colors=train_data_handler.points3D_colors,
    )
    model.declare_optimizer(
        args=optimizer_args,
        warmup=pipeline_args.densify_from,
        max_iterations=pipeline_args.iterations,
    )

    trace_cfg = TraceConfig(
        sh_degree=model.sh_degree, num_quantiles=2,
        weight_threshold=0.001, max_intersections=1024,
    )
    step_cfg = StepConfig(
        trace_cfg, model.activation_scale, model.attr_dtype,
        pipeline_args.white_background,
    )
    step_fn = make_train_step(step_cfg)

    # train_engine=raster runs each iteration as one camera's full image
    # through the differentiable tile rasterizer (3DGS-style SGD) instead
    # of the reference's mixed-image ray batches — ~10x step throughput on
    # TPU. Eval, error maps, and the parity surface stay on the walk.
    engine = getattr(pipeline_args, "train_engine", "walk")
    cam_rng = np.random.default_rng(23)

    data_iterator = (
        train_data_handler.get_iter() if engine == "walk" else None
    )

    triangulation_update_period = 1
    iters_since_update = 1
    iters_since_densification = 0
    next_densification_after = 1
    start_iter = 0
    key = jax.random.PRNGKey(42)

    densify_rng = np.random.default_rng(17)

    if resume_from:
        from radfoam_tpu.train.checkpoint import load_checkpoint

        start_iter, extra = load_checkpoint(resume_from, model)
        triangulation_update_period = extra.get("period", 1)
        iters_since_update = extra.get("since_update", 1)
        iters_since_densification = extra.get("since_densify", 0)
        next_densification_after = extra.get("next_densify", 1)
        key = jax.random.fold_in(key, start_iter)
        # rejoin the downsample schedule at the right level
        past = [
            it for it in dataset_args.downsample_iterations
            if it <= start_iter
        ]
        if past:
            level = iter2downsample[max(past)]
            if level != downsample:
                downsample = level
                train_data_handler.stop()
                train_data_handler.reload(
                    split="train", downsample=downsample
                )
                data_iterator = train_data_handler.get_iter()
        print(f"resumed from {resume_from} at iteration {start_iter}")

    cam_starts = camera_start_points(model, train_data_handler)

    http_viewer = None
    if getattr(pipeline_args, "viewer", False):
        from radfoam_tpu.viewer import Viewer, ViewerOptions
        from radfoam_tpu.viewer.viewer import serve_viewer

        opts = ViewerOptions()
        opts.camera_pos = np.asarray(
            train_data_handler.viewer_pos, np.float32
        )
        opts.camera_forward = np.asarray(
            train_data_handler.viewer_forward, np.float32
        )
        opts.camera_up = np.asarray(train_data_handler.viewer_up, np.float32)
        http_viewer = Viewer(model.sh_degree, opts)
        http_viewer.total_iterations = pipeline_args.iterations
        serve_viewer(http_viewer)

    with tqdm.trange(start_iter, pipeline_args.iterations) as bar:
        for i in bar:
            if http_viewer is not None:
                if i % 20 == 0:
                    http_viewer.update_scene(*model.get_trace_data())
                http_viewer.step(i)
                if http_viewer.is_closed():
                    break
            if i in iter2downsample and i:
                downsample = iter2downsample[i]
                train_data_handler.stop()
                train_data_handler.reload(
                    split="train", downsample=downsample
                )
                if engine == "walk":
                    data_iterator = train_data_handler.get_iter()
                cam_starts = camera_start_points(model, train_data_handler)

            key, sub = jax.random.split(key)
            lrs = model.learning_rates(i)
            w_depth = pipeline_args.quantile_weight * min(
                2 * i / pipeline_args.iterations, 1
            )
            if engine == "raster":
                model.params, model.optimizer_state, metrics = (
                    _raster_step(
                        model, pipeline_args, train_data_handler,
                        cam_rng, lrs, w_depth, sub,
                    )
                )
            else:
                rays, rgbs, alphas, img_idx = next(data_iterator)
                batch = jnp.concatenate(
                    [
                        jnp.reshape(rays, (-1, 6)),
                        jnp.reshape(rgbs, (-1, 3)),
                        jnp.reshape(alphas, (-1, 1)),
                        jnp.reshape(img_idx, (-1, 1)),
                    ],
                    axis=-1,
                )
                model.params, model.optimizer_state, metrics = step_fn(
                    model.params, model.optimizer_state, model.nbr_idx,
                    cam_starts, batch, lrs, w_depth, sub,
                )

            if i % 10 == 9:
                bar.set_postfix(
                    color_loss=f"{float(metrics['color_loss']):.5f}"
                )
                if "n_pairs" in metrics and (
                    int(metrics["n_pairs"]) > metrics["pair_cap"]
                ):
                    print(
                        f"warning: raster pair capacity overflow "
                        f"({int(metrics['n_pairs'])} > "
                        f"{metrics['pair_cap']}), image truncated"
                    )

            if i % 100 == 99 and writer is not None:
                writer.add_scalar(
                    "train/rgb_loss", float(metrics["color_loss"]), i
                )
                writer.add_scalar("test/num_points", model.n_points, i)
                if engine == "raster":
                    test_psnr = raster_test_render(
                        model, pipeline_args, test_data_handler
                    )
                else:
                    test_psnr = test_render(
                        model, step_cfg, test_data_handler
                    )
                writer.add_scalar("test/psnr", test_psnr, i)
                writer.add_scalar("lr/points_lr", lrs["primal_points"], i)
                writer.add_scalar("lr/density_lr", lrs["density"], i)
                writer.add_scalar("lr/attr_lr", lrs["att_dc"], i)

            if iters_since_update >= triangulation_update_period:
                if async_triangulation:
                    # host rebuild overlaps device compute; the new table
                    # installs a few steps stale (VERDICT r1 task 4)
                    model.update_triangulation_async()
                else:
                    model.update_triangulation(incremental=True)
                    cam_starts = camera_start_points(
                        model, train_data_handler
                    )
                iters_since_update = 0
                if triangulation_update_period < 100:
                    triangulation_update_period += 2
            if async_triangulation and model.poll_triangulation():
                cam_starts = camera_start_points(model, train_data_handler)

            iters_since_update += 1
            if i + 1 >= pipeline_args.densify_from:
                iters_since_densification += 1

            if (
                iters_since_densification == next_densification_after
                and model.n_points < 0.9 * model.num_final_points
            ):
                if async_triangulation and model.poll_triangulation(
                    wait=True
                ):
                    cam_starts = camera_start_points(
                        model, train_data_handler
                    )
                if engine == "raster":
                    # raster reverse sweep per view: minutes, not hours,
                    # at 2M points (VERDICT r2 task 7)
                    point_error, point_contribution = (
                        collect_error_map_raster(
                            model, pipeline_args, train_data_handler
                        )
                    )
                elif jax.device_count() > 1:
                    # spread the per-view renders over the mesh: the
                    # densification epoch is embarrassingly parallel in
                    # views (VERDICT r1 task 7)
                    from radfoam_tpu.parallel.train import (
                        collect_error_map_sharded, make_mesh,
                    )

                    point_error, point_contribution = (
                        collect_error_map_sharded(
                            model, step_cfg, train_data_handler,
                            make_mesh(), rng=densify_rng,
                        )
                    )
                else:
                    point_error, point_contribution = collect_error_map(
                        model, step_cfg, train_data_handler,
                        rng=densify_rng,
                    )
                model.prune_and_densify(
                    point_error, point_contribution,
                    pipeline_args.densify_factor,
                )
                model.update_triangulation(incremental=False)
                cam_starts = camera_start_points(model, train_data_handler)
                triangulation_update_period = 1
                gc.collect()

                iters_since_densification = 0
                next_densification_after = max(
                    int(
                        (pipeline_args.densify_factor - 1)
                        * model.n_points
                        * (
                            pipeline_args.densify_until
                            - pipeline_args.densify_from
                        )
                        / (model.num_final_points - model.num_init_points)
                    ),
                    100,
                )

            if i == optimizer_args.freeze_points:
                model.update_triangulation(incremental=False)
                cam_starts = camera_start_points(model, train_data_handler)

            if (
                checkpoint_every
                and out_dir is not None
                and i % checkpoint_every == checkpoint_every - 1
            ):
                from radfoam_tpu.train.checkpoint import save_checkpoint

                save_checkpoint(
                    f"{out_dir}/checkpoint.npz", model, i + 1,
                    extra={
                        "period": triangulation_update_period,
                        "since_update": iters_since_update,
                        "since_densify": iters_since_densification,
                        "next_densify": next_densification_after,
                    },
                )

    if http_viewer is not None:
        http_viewer.close()
    if out_dir is not None:
        model.save_ply(f"{out_dir}/scene.ply")
        model.save_pt(f"{out_dir}/model.pt")
    train_data_handler.stop()

    if engine == "raster":
        final_psnr = raster_test_render(
            model, pipeline_args, test_data_handler, out_dir=out_dir,
            save_images=not pipeline_args.debug,
        )
    else:
        final_psnr = test_render(
            model, step_cfg, test_data_handler, out_dir=out_dir,
            save_images=not pipeline_args.debug,
        )
    if writer is not None:
        writer.close()
    return model, final_psnr, out_dir
