"""The jitted training step and per-view evaluation/error-map kernels.

Everything here is a pure function of (params, opt_state, batch, scalars),
jitted once per (capacity, degree, batch-shape) bucket; the host loop feeds
learning rates and loss ramps as traced scalars so schedule changes never
recompile (SURVEY.md §7.2 step 5).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import optax

from radfoam_tpu.models.scene import activate_attributes
from radfoam_tpu.ops.trace import TraceConfig, trace
from radfoam_tpu.train.losses import smooth_l1

_adam = optax.scale_by_adam(eps=1e-15)


def scrub_grads(grads):
    """Zero non-finite gradient entries before the optimizer touches
    them (reference render.py:98-99 — without this, one degenerate
    backward value, e.g. a near-parallel bisector-plane division,
    permanently poisons the Adam moments)."""
    return jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
    )


def init_opt_state(params):
    return _adam.init(params)


class StepConfig:
    """Hashable static config for make_train_step."""

    def __init__(self, trace_config, activation_scale, attr_dtype,
                 white_background):
        self.trace_config = trace_config
        self.activation_scale = float(activation_scale)
        self.attr_dtype = jnp.dtype(attr_dtype)
        self.white_background = bool(white_background)
        self._key = (trace_config, self.activation_scale,
                     str(self.attr_dtype), self.white_background)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, StepConfig) and self._key == other._key


@lru_cache(maxsize=8)
def make_train_step(cfg: StepConfig):
    """Build the jitted train step.

    Step semantics match one iteration of the reference loop
    (train.py:176-216): random descending depth-quantile pairs, white-bg
    SmoothL1 color loss + MSE opacity loss + ramped quantile-spread loss,
    Adam with per-group LRs.
    """
    tcfg = cfg.trace_config

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, nbr_idx, cam_starts, batch, lrs, w_depth,
             key):
        rays = batch[:, :6]
        rgbs = batch[:, 6:9]
        alphas = batch[:, 9:10]
        img_idx = batch[:, 10].astype(jnp.int32)
        start = jnp.take(cam_starts, img_idx)

        R = rays.shape[0]
        quant = jax.random.uniform(key, (R, 2))
        quant = -jnp.sort(-quant, axis=-1)  # descending (train.py:176-180)

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
            if cfg.white_background:
                rgb = rgba[:, :3] + (1.0 - opacity)
            else:
                rgb = rgba[:, :3]

            color_loss = smooth_l1(rgb, rgbs).mean()
            opacity_loss = jnp.mean((alphas - opacity) ** 2)

            valid = jnp.all(out.depth > 0, axis=-1)
            quant_loss = jnp.abs(out.depth[:, 0] - out.depth[:, 1])
            quant_loss = jnp.mean(quant_loss * valid)

            loss = color_loss + opacity_loss + w_depth * quant_loss
            return loss, color_loss

        (loss, color_loss), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = scrub_grads(grads)
        updates, opt_state = _adam.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u, lr: p - lr * u, params, updates,
            {k: lrs[k] for k in params},
        )
        return params, opt_state, {"loss": loss, "color_loss": color_loss}

    return step


@lru_cache(maxsize=8)
def make_eval_render(cfg: StepConfig):
    """Full-view render for eval: returns white-bg composited rgb
    (reference test_render, train.py:104-147)."""
    tcfg = cfg.trace_config._replace(
        num_quantiles=0, return_contribution=False
    )

    @jax.jit
    def render(params, nbr_idx, rays, start):
        attrs = activate_attributes(params, cfg.activation_scale,
                                    cfg.attr_dtype)
        flat = rays.reshape(-1, 6)
        starts = jnp.full((flat.shape[0],), start, jnp.int32)
        out = trace(
            params["primal_points"], attrs, nbr_idx, flat, starts, None,
            config=tcfg,
        )
        rgba = out.rgba.astype(jnp.float32)
        rgb = rgba[:, :3] + (1.0 - rgba[:, 3:])
        return jnp.clip(rgb, 0.0, 1.0).reshape(*rays.shape[:-1], 3)

    return render


@lru_cache(maxsize=8)
def make_error_map_step(cfg: StepConfig):
    """Per-view error collection (reference collect_error_map,
    scene.py:497-548): L1 color loss backward, accumulate per-point
    position-gradient norms + max contribution."""
    tcfg = cfg.trace_config._replace(
        num_quantiles=0, return_contribution=True
    )

    @jax.jit
    def step(params, nbr_idx, rays, rgbs, start, err_accum, contrib_accum):
        attrs = activate_attributes(params, cfg.activation_scale,
                                    cfg.attr_dtype)
        flat = rays.reshape(-1, 6)
        starts = jnp.full((flat.shape[0],), start, jnp.int32)

        def loss_fn(points):
            out = trace(points, attrs, nbr_idx, flat, starts, None,
                        config=tcfg)
            rgba = out.rgba.astype(jnp.float32)
            opacity = rgba[:, 3:]
            if cfg.white_background:
                rgb = rgba[:, :3] + (1.0 - opacity)
            else:
                rgb = rgba[:, :3]
            loss = jnp.abs(rgbs.reshape(-1, 3) - rgb).mean(axis=-1).sum()
            return loss, out.contribution

        (_, contribution), pg = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params["primal_points"])
        err_accum = err_accum + jnp.linalg.norm(pg, axis=-1)
        contrib_accum = jnp.maximum(contrib_accum, contribution)
        return err_accum, contrib_accum

    return step
