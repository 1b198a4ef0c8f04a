"""Spherical-harmonics basis evaluation (degrees 0..3).

Matches the reference SH convention (src/tracing/sh_utils.cuh:8-83): real SH
basis with the standard "Gaussian-splatting" constants, colors decoded as
``rgb = max(0.5 + B(dir) . sh_coeffs, 0)``. Vectorized over rays; the basis
is a pure VPU computation that XLA fuses into the trace loop.
"""

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def sh_dimension(degree: int) -> int:
    return (degree + 1) * (degree + 1)


def sh_basis(dirs, degree: int):
    """Evaluate the SH basis for unit directions.

    Args:
      dirs: (..., 3) unit direction vectors.
      degree: static int in [0, 3].

    Returns:
      (..., (degree+1)^2) basis values, ordered as the reference
      (sh_utils.cuh:34-70).
    """
    if degree not in (0, 1, 2, 3):
        raise ValueError(f"Unsupported SH degree {degree}")
    x = dirs[..., 0]
    y = dirs[..., 1]
    z = dirs[..., 2]

    one = jnp.ones_like(x)
    out = [C0 * one]

    if degree > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree > 2:
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]

    return jnp.stack(out, axis=-1)


def sh_to_rgb(basis, sh_vals):
    """Decode per-point SH color attributes against a precomputed basis.

    Args:
      basis: (..., D) basis values where D = (degree+1)^2.
      sh_vals: (..., 3*D) interleaved coefficients laid out channel-fastest
        like the reference attribute memory (sh_utils.cuh:72-83): entry i
        multiplies basis[i // 3] and contributes to channel i % 3. With the
        scene storing [dc(3), sh_rest(3*(D-1))], this matches the reference's
        concat(att_dc, att_sh) layout only for the DC term; the reference's
        att_sh is also interleaved per-basis, which we preserve in the scene
        state, so the two layouts coincide.

    Returns:
      (..., 3) rgb, clamped at 0 after the +0.5 shift.
    """
    D = basis.shape[-1]
    coeffs = sh_vals.reshape(*sh_vals.shape[:-1], D, 3)
    rgb = 0.5 + jnp.einsum("...d,...dc->...c", basis, coeffs)
    return jnp.maximum(rgb, 0.0)


def rgb_grad_to_sh(basis, grad_rgb):
    """Transpose of sh_to_rgb's linear part (sh_utils.cuh:85-92).

    Args:
      basis: (..., D)
      grad_rgb: (..., 3)
    Returns:
      (..., 3*D) gradient wrt the interleaved coefficients.
    """
    g = jnp.einsum("...d,...c->...dc", basis, grad_rgb)
    return g.reshape(*g.shape[:-2], -1)
