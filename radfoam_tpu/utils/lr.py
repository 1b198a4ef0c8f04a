"""Learning-rate schedules.

Implements the reference's two decay laws (radfoam_model/utils.py:18-83):
log-linear ("exponential") and cosine, each with an optional linear warmup
and a hard zero past max_steps. Both are built from one generic scheduler
parameterized by the interpolation curve; they return plain ``step -> lr``
callables evaluated on host each iteration, so the lr enters the jitted
train step as a scalar argument and never forces a recompile.
"""

import math


def _warmup_then(curve, lr_init, warmup_steps, max_steps):
    """Generic schedule: linear warmup to lr_init, then ``curve(t)`` over
    t in [0, 1], then 0 past max_steps."""

    span = max(max_steps - warmup_steps, 1)

    def schedule(step):
        if warmup_steps and step < warmup_steps:
            return lr_init * step / warmup_steps
        if step > max_steps:
            return 0.0
        t = min(max((step - warmup_steps) / span, 0.0), 1.0)
        return curve(t)

    return schedule


def get_expon_lr_func(lr_init, lr_final, warmup_steps=0, max_steps=1_000):
    """Log-linear decay lr_init -> lr_final (reference utils.py:18-48)."""

    log_i, log_f = math.log(lr_init), math.log(lr_final)
    curve = lambda t: math.exp(log_i + (log_f - log_i) * t)
    return _warmup_then(curve, lr_init, warmup_steps, max_steps)


def get_cosine_lr_func(lr_init, lr_final, warmup_steps=0, max_steps=10_000):
    """Cosine decay lr_init -> lr_final (reference utils.py:51-83)."""

    amp = 0.5 * (lr_init - lr_final)
    curve = lambda t: lr_final + amp * (1.0 + math.cos(math.pi * t))
    return _warmup_then(curve, lr_init, warmup_steps, max_steps)
