from radfoam_tpu.utils.lr import get_cosine_lr_func, get_expon_lr_func
from radfoam_tpu.utils.math import (
    inverse_softplus,
    psnr,
    morton_codes,
    morton_argsort,
)

__all__ = [
    "get_cosine_lr_func",
    "get_expon_lr_func",
    "inverse_softplus",
    "psnr",
    "morton_codes",
    "morton_argsort",
]
