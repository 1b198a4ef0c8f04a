"""Config system: parameter groups + YAML configs.

Keeps the reference's config *schema* (same group names, same keys, same
defaults — configs/__init__.py:41-90) so the three shipped YAML configs work
unchanged, but the plumbing is declarative: each group is a table of
``key -> default`` entries registered onto argparse by ``_register`` and read
back by ``extract``. The only schema difference is that the default device is
"tpu" instead of "cuda" (any value is accepted; JAX picks the platform).
"""

from radfoam_tpu.utils.args import ArgParser


class GroupParams:
    """Plain attribute bag returned by ``ParamGroup.extract``."""


def _register(group, key, default):
    """Add one CLI flag for a (key, default) spec entry.

    bools become store_true flags, lists become nargs="+" with the element
    type, everything else is a typed scalar option.
    """
    flag = "--" + key
    if isinstance(default, bool):
        group.add_argument(flag, default=default, action="store_true")
    elif isinstance(default, list):
        elem_t = type(default[0])
        group.add_argument(flag, nargs="+", type=elem_t, default=default,
                           help=f"List of {elem_t.__name__}")
    else:
        group.add_argument(flag, default=default, type=type(default))


class ParamGroup:
    """A named block of config keys with defaults.

    Subclasses define ``SPEC`` (tuple of (key, default) pairs) and ``TITLE``.
    Constructing one registers every key as a CLI/YAML option; ``extract``
    pulls the parsed values back out into a GroupParams bag.
    """

    SPEC = ()
    TITLE = ""

    def __init__(self, parser, fill_none=False):
        dest = parser.add_argument_group(self.TITLE)
        for key, default in self.SPEC:
            self._keys = getattr(self, "_keys", set())
            self._keys.add(key)
            setattr(self, key, default)
            _register(dest, key, None if fill_none else default)

    def extract(self, args):
        out = GroupParams()
        for key in self._keys:
            if hasattr(args, key):
                setattr(out, key, getattr(args, key))
        return out


class PipelineParams(ParamGroup):
    """Training-pipeline schedule knobs (reference configs/__init__.py:41-53)."""

    TITLE = "Setting Pipeline parameters"
    SPEC = (
        ("iterations", 20_000),
        ("densify_from", 2_000),
        ("densify_until", 11_000),
        ("densify_factor", 1.15),
        ("white_background", True),
        ("quantile_weight", 1e-4),
        # raster is the only engine that trains at reference scale on TPU
        # (the walk step is ~105 s/iter at 2M points; raster is ~17x
        # faster and parity-tested against the walk) — walk remains
        # available for exact-parity experiments via --train_engine walk
        ("train_engine", "raster"),
        # raster backward: keep the top-S |dv| neighbor-plane gradients
        # per pair (0 = exact, S=K). A/B numbers: tools/grad_planes_ab.py,
        # results in DEVNOTES "grad_planes A/B"
        ("grad_planes", 8),
        # raster engine: cameras per step (losses averaged). 0 = auto:
        # G FULL frames with G*W*H ~ rays_per_batch, the raster analog of
        # the reference's 1M mixed-image ray batches (train.py:60-62).
        # G>1 selects G strip CROPS totalling one frame's pixels — that
        # arm measured WORSE than one full camera (15.71 vs 17.33 dB).
        # The lever is per-step CELL COVERAGE, not pixel count or view
        # mixing: on the probe schedule walk@160k rays = walk@1M rays
        # (15.03/15.02 dB) but 1 full view = 10.45 and 6 full views =
        # 14.16 (DEVNOTES "engine convergence A/B round 5"). Auto full
        # frames is the default; costs ~G x the single-view step.
        ("train_views", 0),
        # walk engine: rays per SGD step (reference train.py:61 hardcodes
        # 1M mixed-image rays). Exposed as a knob for engine A/Bs that
        # equalize the per-step pixel budget between engines.
        ("rays_per_batch", 1_000_000),
        # raster engine: touched-row-masked Adam (LazyAdam semantics) —
        # cells outside the step's camera frusta keep their moments and
        # take no update, emulating the per-cell optimizer dynamics of
        # the walk engine's iid ray batches (every walk step touches
        # every cell). A/B numbers in DEVNOTES "engine convergence A/B".
        ("lazy_adam", False),
        ("experiment_name", ""),
        ("debug", False),
        ("viewer", False),
    )


class ModelParams(ParamGroup):
    """Scene-model shape knobs (reference configs/__init__.py:56-64)."""

    TITLE = "Setting Model parameters"
    SPEC = (
        ("sh_degree", 3),
        ("init_points", 131_072),
        ("final_points", 2_097_152),
        ("activation_scale", 1.0),
        ("device", "tpu"),
    )


class OptimizationParams(ParamGroup):
    """Optimizer schedule knobs (reference configs/__init__.py:67-78)."""

    TITLE = "Setting Optimization parameters"
    SPEC = (
        ("points_lr_init", 2e-4),
        ("points_lr_final", 5e-6),
        ("density_lr_init", 1e-1),
        ("density_lr_final", 1e-2),
        ("attributes_lr_init", 5e-3),
        ("attributes_lr_final", 5e-4),
        ("sh_factor", 0.1),
        ("freeze_points", 18_000),
    )


class DatasetParams(ParamGroup):
    """Dataset selection knobs (reference configs/__init__.py:81-90)."""

    TITLE = "Setting Dataset parameters"
    SPEC = (
        ("dataset", "colmap"),
        ("data_path", "data/mipnerf360"),
        ("scene", "bonsai"),
        ("patch_based", False),
        ("downsample", [4, 2, 1]),
        ("downsample_iterations", [0, 150, 500]),
    )


__all__ = [
    "ArgParser",
    "GroupParams",
    "ParamGroup",
    "PipelineParams",
    "ModelParams",
    "OptimizationParams",
    "DatasetParams",
]
