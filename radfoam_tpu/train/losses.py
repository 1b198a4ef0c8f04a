"""Training losses (reference train.py:87, 194-204)."""

import jax.numpy as jnp


def smooth_l1(pred, target, beta=1.0):
    """Elementwise SmoothL1 / Huber, matching torch.nn.SmoothL1Loss:
    0.5 x^2 / beta for |x| < beta else |x| - 0.5 beta."""
    diff = jnp.abs(pred - target)
    return jnp.where(
        diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta
    )
