"""Multi-chip data-parallel training over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.3): its only parallelism
is CUDA threads within one device. The TPU-native scaling axis for this
workload is the ray batch — rays are embarrassingly parallel in the
forward walk (each reads the replicated scene) and meet only in the
gradient reduction. So the multi-chip design is:

  * mesh axis "data" over all chips;
  * scene parameters, neighbor tables, and optimizer state replicated;
  * the 1M-ray batch sharded along rays;
  * per-shard forward+backward inside shard_map, one gradient pmean over
    ICI per step, replicated Adam update.

This is the sharding layout with the minimum collective traffic: exactly
one all-reduce of (N, attr) + (N, 3) gradients per step, which rides ICI
and overlaps with the next batch's host feed.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radfoam_tpu.models.scene import activate_attributes
from radfoam_tpu.ops.trace import trace
from radfoam_tpu.train.losses import smooth_l1
from radfoam_tpu.train.step import StepConfig, _adam, scrub_grads


def make_mesh(devices=None, axis="data"):
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def shard_batch(batch, mesh, axis="data"):
    """Place a (R, C) batch sharded along rays on the mesh."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis, None)))


def make_sharded_train_step(cfg: StepConfig, mesh, axis="data"):
    """Data-parallel version of train.step.make_train_step.

    Identical math: the global loss is the mean over the global ray batch,
    reproduced as a pmean of per-shard means (shards are equal-sized).
    """
    tcfg = cfg.trace_config

    def local_grads(params, nbr_idx, cam_starts, batch, w_depth, key):
        # decorrelate per-shard quantiles
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))

        rays = batch[:, :6]
        rgbs = batch[:, 6:9]
        alphas = batch[:, 9:10]
        img_idx = batch[:, 10].astype(jnp.int32)
        start = jnp.take(cam_starts, img_idx)

        R = rays.shape[0]
        quant = jax.random.uniform(key, (R, 2))
        quant = -jnp.sort(-quant, axis=-1)

        def loss_fn(p):
            attrs = activate_attributes(
                p, cfg.activation_scale, cfg.attr_dtype
            )
            out = trace(
                p["primal_points"], attrs, nbr_idx, rays, start, quant,
                config=tcfg,
            )
            rgba = out.rgba.astype(jnp.float32)
            opacity = rgba[:, 3:]
            rgb = rgba[:, :3] + (1.0 - opacity) if cfg.white_background \
                else rgba[:, :3]
            color_loss = smooth_l1(rgb, rgbs).mean()
            opacity_loss = jnp.mean((alphas - opacity) ** 2)
            valid = jnp.all(out.depth > 0, axis=-1)
            quant_loss = jnp.mean(
                jnp.abs(out.depth[:, 0] - out.depth[:, 1]) * valid
            )
            return color_loss + opacity_loss + w_depth * quant_loss, \
                color_loss

        (loss, color_loss), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = scrub_grads(grads)
        # the one collective: gradient + metric all-reduce over ICI
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        color_loss = jax.lax.pmean(color_loss, axis)
        return grads, loss, color_loss

    sharded_grads = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis, None), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, nbr_idx, cam_starts, batch, lrs, w_depth,
             key):
        grads, loss, color_loss = sharded_grads(
            params, nbr_idx, cam_starts, batch, w_depth, key
        )
        updates, opt_state = _adam.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u, lr: p - lr * u, params, updates,
            {k: lrs[k] for k in params},
        )
        return params, opt_state, {"loss": loss, "color_loss": color_loss}

    return step


def make_sharded_error_map(cfg: StepConfig, mesh, axis="data"):
    """Densification error collection sharded over train views.

    ``collect_error_map`` renders every train view to accumulate per-point
    position-gradient norms + max contribution (reference scene.py:497-548)
    and dominates densification epochs; views are embarrassingly parallel,
    so each device scans its view shard and the results meet in ONE
    psum/pmax pair (VERDICT r1 task 7).

    Returns ``fn(params, nbr_idx, rays, rgbs, starts, valid) ->
    (err (C,), contrib (C,))`` where rays is (V, R, 6) with V a multiple of
    the mesh size and ``valid`` masks padding views.
    """
    tcfg = cfg.trace_config._replace(
        num_quantiles=0, return_contribution=True
    )

    def local_accum(params, nbr_idx, rays, rgbs, starts, valid):
        attrs = activate_attributes(params, cfg.activation_scale,
                                    cfg.attr_dtype)
        C = params["primal_points"].shape[0]

        def body(carry, xs):
            err, contrib = carry
            r, c, s, v = xs
            starts_r = jnp.full((r.shape[0],), s, jnp.int32)

            def loss_fn(points):
                out = trace(points, attrs, nbr_idx, r, starts_r, None,
                            config=tcfg)
                rgba = out.rgba.astype(jnp.float32)
                opacity = rgba[:, 3:]
                if cfg.white_background:
                    rgb = rgba[:, :3] + (1.0 - opacity)
                else:
                    rgb = rgba[:, :3]
                loss = jnp.abs(c - rgb).mean(axis=-1).sum()
                return loss, out.contribution

            (_, contribution), pg = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params["primal_points"])
            vf = v.astype(jnp.float32)
            err = err + vf * jnp.linalg.norm(pg, axis=-1)
            contrib = jnp.maximum(contrib, jnp.where(v, contribution, 0.0))
            return (err, contrib), None

        init = (jnp.zeros((C,), jnp.float32), jnp.zeros((C,), jnp.float32))
        (err, contrib), _ = jax.lax.scan(
            body, init, (rays, rgbs, starts, valid)
        )
        err = jax.lax.psum(err, axis)
        contrib = jax.lax.pmax(contrib, axis)
        return err, contrib

    sharded = jax.shard_map(
        local_accum,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def collect_error_map_sharded(model, step_cfg, data_handler, mesh,
                              downsample=2, rng=None, axis="data"):
    """Drop-in replacement for train.loop.collect_error_map that spreads
    the views over the mesh. Wall time ~ 1/n_devices of the serial epoch."""
    import numpy as np
    from radfoam_tpu.train.loop import camera_start_points

    rng = rng or np.random.default_rng(0)
    n_dev = mesh.devices.size
    rays = data_handler.rays
    rgbs = data_handler.rgbs
    starts = np.asarray(camera_start_points(model, data_handler))

    V, H, W = rays.shape[:3]
    h2, w2 = H // downsample, W // downsample
    sub_r, sub_c = [], []
    for i in range(V):
        d0, d1 = rng.integers(0, downsample, size=2)
        sub_r.append(rays[i, d0 : d0 + h2 * downsample : downsample,
                          d1 : d1 + w2 * downsample : downsample]
                     .reshape(-1, 6))
        sub_c.append(rgbs[i, d0 : d0 + h2 * downsample : downsample,
                          d1 : d1 + w2 * downsample : downsample]
                     .reshape(-1, 3))
    pad = (-V) % n_dev
    for _ in range(pad):
        sub_r.append(sub_r[0])
        sub_c.append(sub_c[0])
    valid = np.concatenate([np.ones(V, bool), np.zeros(pad, bool)])
    starts = np.concatenate([starts, np.zeros(pad, starts.dtype)])

    fn = make_sharded_error_map(step_cfg, mesh, axis)
    err, contrib = fn(
        model.params, model.nbr_idx,
        jnp.asarray(np.stack(sub_r)), jnp.asarray(np.stack(sub_c)),
        jnp.asarray(starts.astype(np.int32)), jnp.asarray(valid),
    )
    return np.asarray(err), np.asarray(contrib)


def make_sharded_raster_step(cfg, mesh, axis="data"):
    """Camera-sharded raster training step (VERDICT r2 task 5).

    The raster engine trains one camera's full image per step
    (train/raster_step.py); across a mesh the natural data-parallel axis
    is CAMERAS: every device renders its own view through the
    differentiable rasterizer against the replicated scene, and the
    gradients meet in one pmean — the same single-collective layout as
    the walk DP step, and closer to the reference's mixed-image 1M-ray
    batches than single-camera SGD.

    ``cfg`` is a train.raster_step.RasterStepConfig. The returned step
    takes per-device leading axes on (cam_basis (D, 4, 3), gt_rgb
    (D, H, W, 3), gt_alpha (D, H, W, 1)) with everything else
    replicated: step(params, opt_state, nbr_idx, bb_min, bb_max,
    cam_basis, intrin, gt_rgb, gt_alpha, lrs, w_depth, key) ->
    (params, opt_state, metrics).
    """
    from radfoam_tpu.ops.raster import _grid_shape
    from radfoam_tpu.train.raster_step import make_raster_loss

    rcfg = cfg.raster_config
    W, H = cfg.width, cfg.height
    ntx, nty = _grid_shape(W, H, rcfg.tile)
    P_lanes = rcfg.tile * rcfg.tile
    loss_core = make_raster_loss(cfg)

    def local_grads(params, nbr_idx, bb_min, bb_max, cam_basis, intrin,
                    gt_rgb, gt_alpha, w_depth, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        quant = jax.random.uniform(key, (ntx * nty, 2, P_lanes))
        quant = -jnp.sort(-quant, axis=1)
        intrin_t = tuple(intrin[i] for i in range(4))
        dummy_dirs = jnp.zeros((1,), jnp.float32)

        def loss_fn(p):
            return loss_core(
                p, nbr_idx, bb_min, bb_max, cam_basis[0], intrin_t,
                gt_rgb[0], gt_alpha[0], quant, w_depth, dummy_dirs,
                0.0, False,
            )

        (loss, (color_loss, n_pairs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = scrub_grads(grads)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        color_loss = jax.lax.pmean(color_loss, axis)
        n_pairs = jax.lax.pmax(n_pairs, axis)
        return grads, loss, color_loss, n_pairs

    sharded_grads = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis, None, None), P(),
                  P(axis, None, None, None), P(axis, None, None, None),
                  P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, nbr_idx, bb_min, bb_max, cam_basis,
             intrin, gt_rgb, gt_alpha, lrs, w_depth, key):
        grads, loss, color_loss, n_pairs = sharded_grads(
            params, nbr_idx, bb_min, bb_max, cam_basis, intrin, gt_rgb,
            gt_alpha, w_depth, key,
        )
        updates, opt_state = _adam.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u, lr: p - lr * u, params, updates,
            {k: lrs[k] for k in params},
        )
        return params, opt_state, {
            "loss": loss, "color_loss": color_loss, "n_pairs": n_pairs,
        }

    return step
