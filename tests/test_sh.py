"""Golden-value tests for the SH basis (reference sh_utils.cuh:8-92)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radfoam_tpu.ops.sh import sh_basis, sh_to_rgb, rgb_grad_to_sh, C0, C1


def _ref_basis(d, degree):
    """Independent scalar implementation of the reference constants."""
    x, y, z = d
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    out = [C0]
    if degree > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        out += [C2[0] * x * y, C2[1] * y * z, C2[2] * (2 * zz - xx - yy),
                C2[3] * x * z, C2[4] * (xx - yy)]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        out += [C3[0] * y * (3 * xx - yy), C3[1] * x * y * z,
                C3[2] * y * (4 * zz - xx - yy),
                C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
                C3[6] * x * (xx - 3 * yy)]
    return np.array(out)


@pytest.mark.parametrize("degree", [0, 1, 2, 3])
def test_sh_basis_matches_reference_formulas(degree, rng):
    dirs = rng.normal(size=(16, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = np.asarray(sh_basis(jnp.asarray(dirs, jnp.float32), degree))
    want = np.stack([_ref_basis(d, degree) for d in dirs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sh_dc_only_gives_expected_gray():
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    basis = sh_basis(dirs, 3)
    sh_vals = np.zeros((1, 48), np.float32)
    sh_vals[0, :3] = 1.0  # DC term, all channels
    rgb = np.asarray(sh_to_rgb(basis, jnp.asarray(sh_vals)))
    np.testing.assert_allclose(rgb[0], 0.5 + C0, rtol=1e-6)


def test_rgb_grad_transpose(rng):
    """rgb_grad_to_sh must be the exact transpose of sh_to_rgb's linear map."""
    dirs = rng.normal(size=(4, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    basis = sh_basis(jnp.asarray(dirs, jnp.float32), 2)
    sh_vals = jnp.asarray(rng.normal(size=(4, 27)), jnp.float32)
    g_rgb = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)

    # <g, A x> == <A^T g, x> for the linear (un-clamped) part
    rgb_lin = sh_to_rgb(basis, sh_vals) - 0.0  # may clamp; use raw einsum
    D = basis.shape[-1]
    coeffs = sh_vals.reshape(4, D, 3)
    rgb_raw = jnp.einsum("rd,rdc->rc", basis, coeffs)
    lhs = jnp.sum(g_rgb * rgb_raw)
    rhs = jnp.sum(rgb_grad_to_sh(basis, g_rgb) * sh_vals)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)
