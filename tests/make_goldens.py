"""Generate golden render fixtures (VERDICT round-1 task 6).

Renders the 131k-point clustered foam with the round-1 while-loop walk
tracer at f32 and f16 attribute dtypes, a full 320x240 frame with Q=2
depth quantiles, and stores rgba/depth/num_intersections. The golden test
(test_golden_render.py) pins every subsequent tracer/rasterizer rewrite to
these outputs.

Run on the CPU backend (same as the test suite):

    python tests/make_goldens.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


WIDTH, HEIGHT = 320, 240
N_POINTS = 131_072
SH_DEGREE = 3
SEED = 0


def build_inputs():
    import jax.numpy as jnp

    from radfoam_tpu.ops.camera import look_at, cast_rays
    from radfoam_tpu.utils.synthetic import foam_scene

    pts, attrs, table = foam_scene(N_POINTS, SH_DEGREE, SEED)
    eye = np.array([6.0, 2.0, 2.0])
    cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=1.0,
                  width=WIDTH, height=HEIGHT)
    rays = np.asarray(cast_rays(cam)).reshape(-1, 6)
    start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
    quant = np.tile(
        np.array([[0.5, 0.1]], np.float32), (rays.shape[0], 1)
    )
    return pts, attrs, table, rays, start, quant, cam


def render(pts, attrs, table, rays, start, quant, attr_dtype):
    import jax
    import jax.numpy as jnp

    from radfoam_tpu.ops.trace import TraceConfig, trace

    cfg = TraceConfig(sh_degree=SH_DEGREE, num_quantiles=2,
                      weight_threshold=0.05, max_intersections=1024)
    out = trace(
        jnp.asarray(pts), jnp.asarray(attrs, dtype=attr_dtype),
        jnp.asarray(table), jnp.asarray(rays),
        jnp.full((rays.shape[0],), start, jnp.int32),
        jnp.asarray(quant), config=cfg,
    )
    return dict(
        rgba=np.asarray(out.rgba, np.float32),
        depth=np.asarray(out.depth, np.float32),
        num_intersections=np.asarray(out.num_intersections, np.int32),
    )


def main():
    import jax.numpy as jnp

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "goldens")
    os.makedirs(out_dir, exist_ok=True)
    pts, attrs, table, rays, start, quant, cam = build_inputs()
    for name, dt in (("f32", jnp.float32), ("f16", jnp.float16)):
        res = render(pts, attrs, table, rays, start, quant, dt)
        path = os.path.join(out_dir, f"trace_131k_320x240_{name}.npz")
        np.savez_compressed(path, **res)
        print(f"wrote {path}: rgba mean {res['rgba'].mean():.6f}, "
              f"steps mean {res['num_intersections'].mean():.2f}")


if __name__ == "__main__":
    main()
