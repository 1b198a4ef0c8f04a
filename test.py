"""Evaluation CLI — loads <checkpoint>/model.pt (checkpoint dir inferred
from -c <dir>/config.yaml like the reference test.py), renders every test
view with white background, writes PSNR triptychs + metrics.txt."""

import os
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


def test(args, pipeline_args, model_args, optimizer_args, dataset_args):
    import jax.numpy as jnp

    from radfoam_tpu.data import DataHandler
    from radfoam_tpu.models.scene import RadFoamScene
    from radfoam_tpu.ops.trace import TraceConfig
    from radfoam_tpu.train.loop import raster_test_render, test_render
    from radfoam_tpu.train.step import StepConfig

    checkpoint = args.config.replace("/config.yaml", "")
    os.makedirs(os.path.join(checkpoint, "test"), exist_ok=True)

    test_data_handler = DataHandler(dataset_args, rays_per_batch=0)
    test_data_handler.reload(
        split="test", downsample=min(dataset_args.downsample)
    )

    model = RadFoamScene(args=model_args)
    model.load_pt(f"{checkpoint}/model.pt")

    # engine: the raster engine evaluates a 2M-point checkpoint in
    # minutes (reference test.py:55-87 pace); the walk engine is the
    # exact-parity oracle (~105 s/view at 2M points). Defaults to the
    # pipeline's train_engine.
    engine = args.engine or pipeline_args.train_engine
    if engine == "raster":
        avg = raster_test_render(
            model, pipeline_args, test_data_handler, out_dir=checkpoint,
            save_images=True,
        )
    else:
        step_cfg = StepConfig(
            TraceConfig(sh_degree=model.sh_degree, num_quantiles=0),
            model.activation_scale, jnp.float32, True,
        )
        avg = test_render(
            model, step_cfg, test_data_handler, out_dir=checkpoint,
            save_images=True,
        )
    print(f"Average PSNR: {avg}")


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
        "--engine", choices=["raster", "walk"], default=None,
        help="render engine (default: the pipeline's train_engine)",
    )

    args = parser.parse_args()

    test(
        args,
        pipeline_params.extract(args),
        model_params.extract(args),
        optimization_params.extract(args),
        dataset_params.extract(args),
    )


if __name__ == "__main__":
    main()
