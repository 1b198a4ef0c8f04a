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
from radfoam_tpu.train.step import StepConfig, _adam


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
