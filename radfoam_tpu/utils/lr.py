"""Learning-rate schedules.

Matches the reference schedules (radfoam_model/utils.py:18-83): cosine decay
with linear warmup, and log-linear ("exponential") decay. Both return plain
Python callables ``step -> lr`` evaluated on host each iteration; the lr is
fed into the jitted train step as a scalar argument, so no recompilation.
"""

import numpy as np


def get_expon_lr_func(lr_init, lr_final, warmup_steps=0, max_steps=1_000):
    """Log-linear decay from lr_init to lr_final with optional linear warmup.

    Reference: radfoam_model/utils.py:18-48 (adapted from Plenoxels/JaxNeRF).
    """

    def helper(step):
        if warmup_steps and step < warmup_steps:
            return lr_init * step / warmup_steps
        elif step > max_steps:
            return 0.0
        t = np.clip((step - warmup_steps) / (max_steps - warmup_steps), 0, 1)
        return float(np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t))

    return helper


def get_cosine_lr_func(lr_init, lr_final, warmup_steps=0, max_steps=10_000):
    """Cosine decay from lr_init to lr_final with optional linear warmup.

    Reference: radfoam_model/utils.py:51-83.
    """

    def helper(step):
        if warmup_steps and step < warmup_steps:
            return lr_init * step / warmup_steps
        elif step > max_steps:
            return 0.0
        lr_cos = lr_final + 0.5 * (lr_init - lr_final) * (
            1
            + np.cos(np.pi * (step - warmup_steps) / (max_steps - warmup_steps))
        )
        return float(lr_cos)

    return helper
