"""Checkpoint viewer CLI — loads model.pt (fp16 attributes like the
reference viewer.py) and serves the interactive HTTP viewer; --turntable
renders an offline orbit instead."""

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


def viewer(args, pipeline_args, model_args, optimizer_args, dataset_args):
    import jax.numpy as jnp

    from radfoam_tpu.data import DataHandler
    from radfoam_tpu.models.scene import RadFoamScene
    from radfoam_tpu.viewer import TurntableRenderer, run_with_viewer

    checkpoint = args.config.replace("/config.yaml", "")

    model = RadFoamScene(args=model_args, attr_dtype=jnp.float16)
    model.load_pt(f"{checkpoint}/model.pt")

    if args.turntable:
        out = f"{checkpoint}/turntable"
        paths = TurntableRenderer(model).render(out, n_frames=args.frames)
        print(f"wrote {len(paths)} frames to {out}")
        return

    camera_kwargs = {}
    try:
        handler = DataHandler(dataset_args, rays_per_batch=0)
        handler.reload(split="test", downsample=min(dataset_args.downsample))
        camera_kwargs = dict(
            camera_pos=handler.viewer_pos,
            camera_forward=handler.viewer_forward,
            camera_up=handler.viewer_up,
        )
    except Exception as e:
        print(f"(no dataset cameras: {e})")

    def loop(v):
        import time

        while not v.is_closed():
            time.sleep(0.2)

    run_with_viewer(model, loop, port=args.port, **camera_kwargs)


def main():
    parser = ArgParser()

    model_params = ModelParams(parser)
    dataset_params = DatasetParams(parser)
    pipeline_params = PipelineParams(parser)
    optimization_params = OptimizationParams(parser)

    parser.add_argument(
        "-c", "--config", is_config_file=True, help="Path to config file"
    )
    parser.add_argument("--turntable", action="store_true",
                        help="render an offline orbit instead of serving")
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--port", type=int, default=8090)

    args = parser.parse_args()

    viewer(
        args,
        pipeline_params.extract(args),
        model_params.extract(args),
        optimization_params.extract(args),
        dataset_params.extract(args),
    )


if __name__ == "__main__":
    main()
