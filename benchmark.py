"""FPS benchmark CLI — the reference protocol (benchmark.py:95-139): fp16
attributes, every 8th test pose, weight_threshold=0.05, 1 warmup + 5 timed
repetitions over all frames."""

import os
import time
import warnings

warnings.filterwarnings("ignore")

import numpy as np

from radfoam_tpu.configs import (
    ArgParser,
    DatasetParams,
    ModelParams,
    OptimizationParams,
    PipelineParams,
)

seed = 42
np.random.seed(seed)


def benchmark(args, pipeline_args, model_args, optimizer_args, dataset_args):
    import jax
    import jax.numpy as jnp

    from radfoam_tpu.data import DataHandler
    from radfoam_tpu.models.scene import RadFoamScene
    from radfoam_tpu.ops.camera import look_at
    from radfoam_tpu.ops.camera import Camera, cast_rays
    from radfoam_tpu.ops.trace import TraceConfig, pack_rgba8
    from radfoam_tpu.ops import trace as trace_mod

    checkpoint = args.config.replace("/config.yaml", "")
    os.makedirs(os.path.join(checkpoint, "test"), exist_ok=True)

    test_data_handler = DataHandler(dataset_args, rays_per_batch=0)
    test_data_handler.reload(
        split="test", downsample=min(dataset_args.downsample)
    )

    model = RadFoamScene(args=model_args, attr_dtype=jnp.float16)
    model.load_pt(f"{checkpoint}/model.pt")
    points, attrs, nbr_idx = model.get_trace_data()

    c2w = test_data_handler.c2ws
    width, height = test_data_handler.img_wh
    fy = test_data_handler.fy
    fov = float(2 * np.arctan(height / (2 * fy)))
    engine = getattr(args, "engine", "raster")

    cams = []
    for i in range(c2w.shape[0]):
        if i % 8 == 0:
            cams.append(Camera(
                position=np.asarray(c2w[i, :3, 3]),
                forward=np.asarray(c2w[i, :3, 2]),
                right=np.asarray(c2w[i, :3, 0]),
                up=-np.asarray(c2w[i, :3, 1]),
                fov=fov, width=width, height=height,
            ))
    n_frames = len(cams)

    if engine == "raster":
        # tile rasterizer (ops/raster.py): re-triangulate for cell bounds,
        # keep points/attrs in the triangulation's spatial order
        from radfoam_tpu.delaunay import Triangulation
        from radfoam_tpu.ops import raster as R
        from radfoam_tpu.ops.adjacency import csr_to_padded

        n_active = int(model.n_points)
        pts_np = np.asarray(points, np.float32)[:n_active]
        tri = Triangulation(pts_np)
        perm = tri.permutation()
        pts_np = pts_np[perm]
        attrs_np = np.asarray(attrs)[:n_active][perm]
        table = csr_to_padded(
            tri.point_adjacency(), tri.point_adjacency_offsets()
        )
        bb_min, bb_max, _ = tri.cell_bounds()
        from radfoam_tpu.ops.cellbound import clamp_bounds

        bb_min, bb_max, _ = clamp_bounds(pts_np, bb_min, bb_max)

        # scene-static visibility compaction: alpha_cull is camera-
        # independent, so cull once and reorder visible-first — binning
        # then touches only the visible prefix (raster.visibility_compact)
        (pts_np, attrs_np, table, bb_min, bb_max, dens_np,
         n_vis) = R.visibility_compact(
            pts_np, attrs_np, table, bb_min, bb_max,
            attrs_np[:, -1].astype(np.float32), 1e-3,
        )

        # tuned inference config (tools/raster_ab.py, DEVNOTES round 4):
        # 32px tiles halve the pair count and quarter the per-tile kernel
        # floor; list-order compositing (reorder_window=0) and the 384-
        # entry tile cap are 49.5 dB vs the exact sorted-merge render —
        # the fp16-attrs-analog inference tradeoff (reference
        # benchmark.py:35-54). bf16 rows halve table + DMA bytes.
        # capacities are DERIVED per checkpoint, not hand-tuned: a stats
        # sizing pass (generous caps) bins every benchmark pose, then
        # max_pairs = measured max + 30% and tile_list_cap = 2x the
        # deepest early-exit consumption (raster.size_caps). The generous
        # sizing cap itself scales with BOTH point count and image area
        # (pair_capacity: measured up to 8.5 pairs/point at 131k on
        # 800x800 — a point-count-only cap truncates mid-size scenes).
        from radfoam_tpu.train.loop import pair_capacity

        base_cfg = dict(
            sh_degree=model.sh_degree, weight_threshold=0.05,
            alpha_cull=1e-3, table_k=int(table.shape[1]),
            tile=32, reorder_window=0,
        )
        sizing_cfg = R.RasterConfig(
            max_pairs=2 * pair_capacity(pts_np.shape[0], width, height),
            tile_list_cap=0, stats=True, **base_cfg,
        )
        rtable = jax.jit(
            lambda p, a, t, b0, b1: R.build_scene_table(
                p, a, t, b0, b1, sh_degree=model.sh_degree,
                dtype=jnp.bfloat16,
            )
        )(
            jnp.asarray(pts_np), jnp.asarray(attrs_np), jnp.asarray(table),
            jnp.asarray(bb_min), jnp.asarray(bb_max),
        )
        bbmin_d = jnp.asarray(bb_min[:n_vis])
        bbmax_d = jnp.asarray(bb_max[:n_vis])
        dens_d = jnp.asarray(dens_np[:n_vis])

        frames = [
            tuple(jnp.asarray(np.asarray(x, np.float32)) for x in
                  (c.position, c.forward, c.right, c.up))
            for c in cams
        ]

        # sizing pass over every benchmark pose (overflow is
        # pose-dependent: each pose bins a different frustum). Derives
        # per-pose PER-TILE gather caps from the composite's measured
        # early-exit consumption (consumption-sized gather) and keeps
        # each pose's image to assert the capped render is identical.
        render_sz = lambda pos, fwd, rgt, up: R.render_frame_staged(
            rtable, bbmin_d, bbmax_d, dens_d, pos, fwd, rgt, up,
            jnp.float32(fov), width=width, height=height, cfg=sizing_cfg)
        tile_caps, mp_cap, max_pairs, ref_imgs = R.size_tile_caps(
            frames, render_sz, sizing_cfg.entry_chunk
        )
        print(f"derived caps: max_pairs={max_pairs} mp_cap={mp_cap}")
        rcfg = R.RasterConfig(max_pairs=max_pairs, **base_cfg)
        caps_d = [jnp.asarray(c) for c in tile_caps]

        # staged frame: a fresh fused-frame compile can exceed HBM on
        # multi-million-point checkpoints (see raster.render_frame_staged)
        raster_fn = lambda pos, fwd, rgt, up, caps: R.render_frame_staged(
            rtable, bbmin_d, bbmax_d, dens_d, pos, fwd, rgt, up,
            jnp.float32(fov), width=width, height=height, cfg=rcfg,
            tile_caps=caps, mp_cap=mp_cap)

        # derived caps must hold on the timed pass — refuse truncation
        # and refuse any consumption-cap divergence from the sizing image
        for fi, fr in enumerate(frames):
            img, n_pairs, _ = raster_fn(*fr, caps_d[fi])
            img = np.asarray(jax.device_get(img))
            if int(n_pairs) > rcfg.max_pairs:
                raise SystemExit(
                    f"pair overflow on pose {fi} ({int(n_pairs)} > "
                    f"{rcfg.max_pairs}): derived caps failed"
                )
            maxdiff = float(np.max(np.abs(img - ref_imgs[fi])))
            if maxdiff > 1e-5:
                raise SystemExit(
                    f"consumption-capped render diverged on pose {fi}: "
                    f"maxdiff={maxdiff}"
                )
        render = lambda i: raster_fn(*frames[i], caps_d[i])[0]
    else:
        cfg = TraceConfig(
            sh_degree=model.sh_degree, num_quantiles=0,
            weight_threshold=0.05, max_intersections=1024,
            chunk_size=1 << 17,
        )

        @jax.jit
        def walk_fn(rays, start):
            out = trace_mod._trace_forward_impl(
                cfg, points, attrs, nbr_idx, rays, start,
                jnp.zeros((rays.shape[0], 0), jnp.float32),
            )
            return pack_rgba8(out.rgba[:, :3].astype(jnp.float32))

        positions = np.stack([c.position for c in cams])
        start_points = np.asarray(
            model.get_starting_point(jnp.asarray(positions))
        )
        frames = [
            jax.device_put(
                jnp.asarray(np.asarray(cast_rays(c)).reshape(-1, 6))
            )
            for c in cams
        ]
        starts = [
            jax.device_put(jnp.full(
                (frames[i].shape[0],), int(start_points[i]), jnp.int32
            ))
            for i in range(n_frames)
        ]
        render = lambda i: walk_fn(frames[i], starts[i])

    # warmup
    for i in range(n_frames):
        jax.block_until_ready(render(i))

    n_reps = 5
    t0 = time.perf_counter()
    for _ in range(n_reps):
        outs = [render(i) for i in range(n_frames)]
        jax.block_until_ready(outs)
    t1 = time.perf_counter()

    total_time = (t1 - t0) * 1000.0
    framerate = n_reps * n_frames / (total_time / 1000.0)
    print(f"Total time: {total_time} ms")
    print(f"FPS: {framerate}")


def main():
    parser = ArgParser()

    model_params = ModelParams(parser)
    dataset_params = DatasetParams(parser)
    pipeline_params = PipelineParams(parser)
    optimization_params = OptimizationParams(parser)

    parser.add_argument(
        "-c", "--config", is_config_file=True, help="Path to config file"
    )
    parser.add_argument(
        "--engine", default="raster", choices=["raster", "walk"],
        help="render engine: tile rasterizer (default) or adjacency walk",
    )

    args = parser.parse_args()

    benchmark(
        args,
        pipeline_params.extract(args),
        model_params.extract(args),
        optimization_params.extract(args),
        dataset_params.extract(args),
    )


if __name__ == "__main__":
    main()
