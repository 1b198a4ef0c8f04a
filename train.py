"""Training CLI — same flags, configs, and outputs as the reference
train.py (python train.py -c configs/X.yaml)."""

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


def main():
    parser = ArgParser()

    model_params = ModelParams(parser)
    pipeline_params = PipelineParams(parser)
    optimization_params = OptimizationParams(parser)
    dataset_params = DatasetParams(parser)

    parser.add_argument(
        "-c", "--config", is_config_file=True, help="Path to config file"
    )
    # extensions over the reference CLI: mid-training resume
    parser.add_argument("--resume", type=str, default=None,
                        help="path to a checkpoint.npz to resume from")
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="write a resumable snapshot every N iters")

    args = parser.parse_args()

    from radfoam_tpu.train.loop import train

    train(
        args,
        pipeline_params.extract(args),
        model_params.extract(args),
        optimization_params.extract(args),
        dataset_params.extract(args),
        resume_from=args.resume,
        checkpoint_every=args.checkpoint_every,
    )


if __name__ == "__main__":
    main()
