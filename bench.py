"""Driver benchmark: pure-inference render FPS on the real TPU chip.

Mirrors the reference benchmark protocol (benchmark.py:95-139): fp16
attributes, weight_threshold=0.05, max_intersections=1024, warmup pass then
5 timed repetitions, FPS = n_reps * n_frames / total_seconds. The scene is
a deterministic synthetic foam (no external datasets in the image) at the
reference's init_points scale, rendered at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 30 FPS "real-time at 1080p" north star from
BASELINE.md (the reference repo publishes no numbers).
"""

import json
import sys
import time

import numpy as np


def build_scene(n_points=131_072, sh_degree=3, seed=0):
    from radfoam_tpu.delaunay import Triangulation
    from radfoam_tpu.ops.adjacency import csr_to_padded

    rng = np.random.default_rng(seed)
    # clustered foam: a dense core plus shells, similar occupancy profile
    # to a trained indoor scene
    core = rng.standard_normal((n_points // 2, 3)) * 1.0
    shell = rng.standard_normal((n_points // 2, 3)) * 4.0
    pts = np.concatenate([core, shell]).astype(np.float32)

    tri = Triangulation(pts)
    pts = pts[tri.permutation()]
    table = csr_to_padded(
        tri.point_adjacency(), tri.point_adjacency_offsets()
    )

    D = (sh_degree + 1) ** 2
    attrs = (rng.standard_normal((pts.shape[0], 1 + 3 * D)) * 0.2).astype(
        np.float32
    )
    r = np.linalg.norm(pts, axis=1)
    attrs[:, -1] = np.where(r < 1.5, 2.5, 0.02)
    return pts, attrs, table


def main():
    import jax
    import jax.numpy as jnp

    from radfoam_tpu.ops.camera import look_at, cast_rays_device
    from radfoam_tpu.ops.trace import (
        TraceConfig,
        pack_rgba8,
        pack_layout,
        pack_trace_table,
        _trace_forward_packed,
    )

    sh_degree = 3
    width, height = 1920, 1080
    n_frames = 4
    n_reps = 5

    pts, attrs, table = build_scene(sh_degree=sh_degree)
    points = jnp.asarray(pts)
    attrs_dev = jnp.asarray(attrs, dtype=jnp.float16)
    nbr_idx = jnp.asarray(table)

    # packed row table hoisted out of the render loop, the analog of the
    # reference benchmark's precomputed adjacent_offsets (benchmark.py:41-54)
    lay = pack_layout(nbr_idx, attrs_dev)
    packed = jax.jit(pack_trace_table)(points, attrs_dev, nbr_idx)
    packed.block_until_ready()
    n_points = pts.shape[0]

    cfg = TraceConfig(
        sh_degree=sh_degree, num_quantiles=0, weight_threshold=0.05,
        max_intersections=1024, chunk_size=width * height,
    )

    @jax.jit
    def render(pos, fwd, rgt, up, start):
        # rays materialize on device (no 48MB host->device ray buffers)
        rays = cast_rays_device(
            pos, fwd, rgt, up, jnp.float32(2 * np.arctan(1 / 1.6)),
            width, height,
        )
        out = _trace_forward_packed(
            cfg, lay, packed, n_points, rays,
            jnp.full((rays.shape[0],), start, jnp.int32),
            jnp.zeros((rays.shape[0], 0), jnp.float32),
        )
        return pack_rgba8(out.rgba[:, :3].astype(jnp.float32))

    # cameras: orbit at radius 6 looking at the core (every-8th-pose analog)
    frames = []
    for v in range(n_frames):
        ang = 2 * np.pi * v / n_frames
        eye = np.array([6 * np.cos(ang), 6 * np.sin(ang), 2.0])
        cam = look_at(eye, [0, 0, 0], [0, 0, 1], fov=1.0,
                      width=width, height=height)
        start = int(np.argmin(np.sum((pts - eye) ** 2, axis=1)))
        frames.append(tuple(
            jnp.asarray(np.asarray(x, np.float32)) for x in
            (cam.position, cam.forward, cam.right, cam.up)
        ) + (start,))

    # warmup (compile + cache)
    for f in frames:
        render(*f).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(n_reps):
        imgs = [render(*f) for f in frames]
        jax.block_until_ready(imgs)
    t1 = time.perf_counter()

    fps = n_reps * n_frames / (t1 - t0)
    print(json.dumps({
        "metric": "render_fps_1080p_131k_points",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
