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

    cfg = TraceConfig(
        sh_degree=model.sh_degree, num_quantiles=0, weight_threshold=0.05,
        max_intersections=1024, chunk_size=1 << 17,
    )

    @jax.jit
    def render(rays, start):
        out = trace_mod._trace_forward_impl(
            cfg, points, attrs, nbr_idx, rays, start,
            jnp.zeros((rays.shape[0], 0), jnp.float32),
        )
        return pack_rgba8(out.rgba[:, :3].astype(jnp.float32))

    frames = []
    positions = []
    for i in range(c2w.shape[0]):
        if i % 8 == 0:
            position = np.asarray(c2w[i, :3, 3])
            fov = float(2 * np.arctan(height / (2 * fy)))
            cam = Camera(
                position=position,
                forward=np.asarray(c2w[i, :3, 2]),
                right=np.asarray(c2w[i, :3, 0]),
                up=-np.asarray(c2w[i, :3, 1]),
                fov=fov, width=width, height=height,
            )
            positions.append(position)
            rays = np.asarray(cast_rays(cam)).reshape(-1, 6)
            frames.append(jax.device_put(jnp.asarray(rays)))

    start_points = np.asarray(
        model.get_starting_point(jnp.asarray(np.stack(positions)))
    )
    starts = [
        jax.device_put(
            jnp.full((frames[i].shape[0],), int(start_points[i]), jnp.int32)
        )
        for i in range(len(frames))
    ]
    n_frames = len(frames)

    # warmup
    for i in range(n_frames):
        render(frames[i], starts[i]).block_until_ready()

    n_reps = 5
    t0 = time.perf_counter()
    for _ in range(n_reps):
        outs = [render(frames[i], starts[i]) for i in range(n_frames)]
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
