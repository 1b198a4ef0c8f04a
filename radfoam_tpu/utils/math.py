"""Small numeric helpers: psnr, inverse softplus, Morton codes.

psnr / inverse_softplus mirror the reference (radfoam_model/utils.py:5-15).
Morton codes replace the reference's alternating-axis segmented radix sort
(src/aabb_tree/aabb_tree.cu:62-190) as the spatial ordering that gives the
trace kernel gather locality; both produce a space-filling-curve-like order,
and ours is a plain argsort of interleaved-bit keys, which is XLA/numpy
friendly.
"""

import numpy as np
import jax.numpy as jnp


def psnr(img1, img2):
    """Per-channel-mean PSNR, matching radfoam_model/utils.py:13-15."""
    mse = ((img1 - img2) ** 2).reshape(-1, img1.shape[-1]).mean(0)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse.mean()))


def inverse_softplus(x, beta, scale=1.0):
    """Inverse of scale*softplus(beta*x)/... ; radfoam_model/utils.py:5-10."""
    x = np.asarray(x, dtype=np.float64)
    out = x / scale
    mask = x * beta < 20 * scale
    out = np.where(
        mask, np.log(np.expm1(np.maximum(beta * out, 1e-30)) + 1e-10) / beta, out
    )
    return out.astype(np.float32)


def _part1by2_64(x):
    """Spread the low 21 bits of x so there are two zero bits between each."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_codes(points):
    """64-bit Morton codes (21 bits/axis) for an (N, 3) float array.

    Coordinates are normalized to the AABB of the point set. Host-side numpy
    (triangulation updates run on host anyway).
    """
    pts = np.asarray(points, dtype=np.float64)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    span = np.maximum(hi - lo, 1e-12)
    q = ((pts - lo) / span * ((1 << 21) - 1)).astype(np.uint64)
    return (
        _part1by2_64(q[:, 0])
        | (_part1by2_64(q[:, 1]) << np.uint64(1))
        | (_part1by2_64(q[:, 2]) << np.uint64(2))
    )


def morton_argsort(points):
    """Permutation that sorts points into Morton (Z-curve) order.

    Replacement for the reference's sort_points spatial ordering
    (src/aabb_tree/aabb_tree.cu:62-190): gives the walk kernel's gathers
    spatial locality. Stable so duplicate codes keep input order.
    """
    return np.argsort(morton_codes(points), kind="stable")
