"""Raster-engine training step: one camera's full image per iteration.

The walk step (train/step.py) reproduces the reference's random-ray SGD
exactly but is bound by the serial gather chain (~9 s at 1M rays on a
v5e). This step trades the reference's mixed-image ray batches for
3DGS-style image-per-step SGD so the whole iteration runs through the
differentiable tile rasterizer (ops/raster_grad.py): one bin + one bulk
gather + fwd/bwd Pallas composites instead of ~150 dependent gathers.

Loss terms match train/step.py (reference train.py:176-216): white-bg
SmoothL1 color, MSE opacity, and the ramped quantile-spread loss over two
descending random transmittance quantiles — here drawn per PIXEL instead
of per ray, same distribution.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import optax

from radfoam_tpu.models.scene import activate_attributes
from radfoam_tpu.ops.raster import RasterConfig, _grid_shape
from radfoam_tpu.ops.raster_grad import render_train
from radfoam_tpu.train.losses import smooth_l1
from radfoam_tpu.train.step import scrub_grads

_adam = optax.scale_by_adam(eps=1e-15)


def _lazy_adam_update(grads, state, params):
    """Touched-row-masked Adam (TF LazyAdam semantics, global-count bias
    correction): rows of a parameter table that received NO gradient this
    step keep their first/second moments verbatim and take no update.

    Why: a raster step only touches the cells inside its cameras'
    frusta, so under plain Adam every untouched cell's momentum decays
    (b1^k) and its second moment drifts between visits — per-cell
    optimizer dynamics the walk engine's iid 1M-ray batches never see
    (every walk step touches essentially every cell; DEVNOTES "engine
    convergence A/B round 5"). Masking makes each cell's Adam trajectory
    a function of its own visit sequence, like a sparse-embedding
    optimizer, instead of the global step count.

    All four parameter tables are row-per-cell (models/scene.py:39), so
    one (C, 1) touched mask — any nonzero gradient component in any
    table — gates them all.
    """
    b1, b2, eps = 0.9, 0.999, 1e-15
    touched = None
    for g in grads.values():
        t = jnp.any(g != 0.0, axis=-1, keepdims=True)
        touched = t if touched is None else (touched | t)

    mu = jax.tree.map(
        lambda m, g: jnp.where(touched, b1 * m + (1.0 - b1) * g, m),
        state.mu, grads,
    )
    nu = jax.tree.map(
        lambda v, g: jnp.where(touched, b2 * v + (1.0 - b2) * g * g, v),
        state.nu, grads,
    )
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)
    updates = jax.tree.map(
        lambda m, v: jnp.where(
            touched, (m / c1) / (jnp.sqrt(v / c2) + eps), 0.0
        ),
        mu, nu,
    )
    return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)


class RasterStepConfig:
    """Hashable static config for make_raster_train_step.

    ``views`` > 1 selects the multi-view step: each iteration renders
    ``views`` random CROPS (full-width, ``height``-row strips) from
    ``views`` different cameras and averages the losses — the raster
    analog of the reference's mixed-image ray batches
    (reference train.py:60-62, 1M rays drawn across all images). With
    views = 1 a step's gradient sees a single viewpoint, which measured
    1.47 dB worse than the walk engine's mixed batches on the same
    schedule (DEVNOTES "engine convergence A/B"); ``width``/``height``
    are then the CROP dimensions, not the full image's.
    """

    def __init__(self, raster_config: RasterConfig, activation_scale,
                 attr_dtype, white_background, width, height, views=1,
                 lazy_adam=False):
        self.raster_config = raster_config
        self.activation_scale = float(activation_scale)
        self.attr_dtype = jnp.dtype(attr_dtype)
        self.white_background = bool(white_background)
        self.width = int(width)
        self.height = int(height)
        self.views = int(views)
        self.lazy_adam = bool(lazy_adam)
        self._key = (raster_config, self.activation_scale,
                     str(self.attr_dtype), self.white_background,
                     self.width, self.height, self.views, self.lazy_adam)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return (isinstance(other, RasterStepConfig)
                and self._key == other._key)


def make_raster_loss(cfg: RasterStepConfig):
    """The raster step's loss as a standalone closure (shared by the
    single-chip step and the camera-sharded multi-chip step).

    loss_fn(params, nbr_idx, bb_min, bb_max, cam_basis (4, 3), intrin
    (4,), gt_rgb, gt_alpha, quant (n_tiles, 2, P), w_depth, dir_grid,
    pad_px, has_dirs) -> (loss, (color_loss, n_pairs)).
    """
    rcfg = cfg.raster_config
    W, H = cfg.width, cfg.height

    def loss_fn(p, nbr_idx, bb_min, bb_max, cam_basis, intrin_t, gt_rgb,
                gt_alpha, quant, w_depth, dir_grid, pad_px, has_dirs):
        attrs = activate_attributes(
            p, cfg.activation_scale, cfg.attr_dtype
        ).astype(jnp.float32)
        img, n_pairs = render_train(
            p["primal_points"], attrs, nbr_idx, bb_min, bb_max,
            cam_basis[0], cam_basis[1], cam_basis[2], cam_basis[3],
            intrin_t, quant, width=W, height=H, cfg=rcfg,
            dir_grid=dir_grid if has_dirs else None, pad_px=pad_px,
        )
        img = img.astype(jnp.float32)
        opacity = img[..., 3:4]
        if cfg.white_background:
            rgb = img[..., :3] + (1.0 - opacity)
        else:
            rgb = img[..., :3]

        color_loss = smooth_l1(rgb, gt_rgb).mean()
        opacity_loss = jnp.mean((gt_alpha - opacity) ** 2)

        d0, d1 = img[..., 4], img[..., 5]
        valid = (d0 > 0) & (d1 > 0)
        quant_loss = jnp.mean(jnp.abs(d0 - d1) * valid)

        loss = color_loss + opacity_loss + w_depth * quant_loss
        return loss, (color_loss, n_pairs)

    return loss_fn


@lru_cache(maxsize=8)
def make_raster_train_step(cfg: RasterStepConfig):
    """Build the jitted raster train step.

    step(params, opt_state, nbr_idx, bb_min, bb_max, cam_basis (4, 3)
    [pos fwd rgt up], intrin (4,), gt_rgb (H, W, 3), gt_alpha (H, W, 1),
    lrs, w_depth, key) -> (params, opt_state, metrics).
    """
    rcfg = cfg.raster_config
    W, H = cfg.width, cfg.height
    ntx, nty = _grid_shape(W, H, rcfg.tile)
    P = rcfg.tile * rcfg.tile
    G = cfg.views
    loss_core = make_raster_loss(cfg)

    @partial(jax.jit, donate_argnums=(0, 1),
             static_argnames=("has_dirs",))
    def step(params, opt_state, nbr_idx, bb_min, bb_max, cam_basis,
             intrin, gt_rgb, gt_alpha, lrs, w_depth, key, dir_grid=None,
             pad_px=0.0, has_dirs=False):
        if G == 1:
            quant = jax.random.uniform(key, (ntx * nty, 2, P))
            # descending (train.py:176-180)
            quant = -jnp.sort(-quant, axis=1)
            intrin_t = tuple(intrin[i] for i in range(4))

            def loss_fn(p):
                return loss_core(p, nbr_idx, bb_min, bb_max, cam_basis,
                                 intrin_t, gt_rgb, gt_alpha, quant,
                                 w_depth, dir_grid, pad_px, has_dirs)

        else:
            # multi-view: cam_basis (G, 4, 3), intrin (G, 4),
            # gt_rgb (G, H, W, 3), gt_alpha (G, H, W, 1) — one crop per
            # camera, losses averaged so the step's pixel count matches
            # the single-view step's. Each view is rematerialized
            # (jax.checkpoint): unrolled VJPs would keep all G crops'
            # pair buffers + intersection residuals live simultaneously
            # through the backward pass (~G full-frame renders of HBM —
            # measured OOM at 131k points, G=4, on the 16 GB chip);
            # remat recomputes each view's forward inside its own VJP so
            # the peak is ONE view's residuals, same as the single-view
            # step the chip already handles at 262k points.
            keys = jax.random.split(key, G)

            def view_loss(g, p):
                quant = jax.random.uniform(keys[g], (ntx * nty, 2, P))
                quant = -jnp.sort(-quant, axis=1)
                intrin_t = tuple(intrin[g, i] for i in range(4))
                return loss_core(
                    p, nbr_idx, bb_min, bb_max, cam_basis[g],
                    intrin_t, gt_rgb[g], gt_alpha[g], quant,
                    w_depth, dir_grid, pad_px, has_dirs,
                )

            def loss_fn(p):
                loss = color_loss = 0.0
                n_pairs = jnp.int32(0)
                for g in range(G):
                    l_g, (cl_g, np_g) = jax.checkpoint(
                        partial(view_loss, g)
                    )(p)
                    loss = loss + l_g
                    color_loss = color_loss + cl_g
                    n_pairs = jnp.maximum(n_pairs, np_g)
                return loss / G, (color_loss / G, n_pairs)

        (loss, (color_loss, n_pairs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = scrub_grads(grads)
        if cfg.lazy_adam:
            updates, opt_state = _lazy_adam_update(grads, opt_state,
                                                   params)
        else:
            updates, opt_state = _adam.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u, lr: p - lr * u, params, updates,
            {k: lrs[k] for k in params},
        )
        return params, opt_state, {
            "loss": loss, "color_loss": color_loss, "n_pairs": n_pairs,
        }

    return step
