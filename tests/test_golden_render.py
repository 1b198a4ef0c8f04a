"""Golden render-parity anchor (VERDICT round-1 task 6).

Pins the walk tracer's full-frame output on a 131k-point scene to committed
fixtures so that hot-path rewrites (the tile rasterizer, Pallas kernels,
packing changes) can be validated against the round-1 renderer. Regenerate
with ``python tests/make_goldens.py`` ONLY for an intentional semantic
change, and note why in the commit message.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tests.make_goldens import (
    build_inputs, render, WIDTH, HEIGHT, N_POINTS, SH_DEGREE,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def inputs():
    return build_inputs()


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else -10.0 * np.log10(mse)


@pytest.mark.parametrize("name,dtype", [("f32", jnp.float32),
                                        ("f16", jnp.float16)])
def test_trace_matches_golden(inputs, name, dtype):
    golden = np.load(
        os.path.join(GOLDEN_DIR, f"trace_131k_320x240_{name}.npz")
    )
    res = render(*inputs[:6], dtype)

    # rgba: essentially bitwise on the same backend; allow a whisker for
    # XLA scheduling differences across versions.
    assert psnr(res["rgba"], golden["rgba"]) > 60.0
    np.testing.assert_allclose(
        res["rgba"], golden["rgba"], atol=2e-3, rtol=0
    )

    # depth quantiles: -1 sentinels must match exactly; values closely.
    g_d, r_d = golden["depth"], res["depth"]
    assert ((g_d < 0) == (r_d < 0)).mean() > 0.9999
    both = (g_d >= 0) & (r_d >= 0)
    np.testing.assert_allclose(r_d[both], g_d[both], atol=1e-2, rtol=1e-3)

    # step counts: identical walks up to rare borderline exits.
    same = (res["num_intersections"] == golden["num_intersections"]).mean()
    assert same > 0.999
