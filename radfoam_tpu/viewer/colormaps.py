"""Colormap tables for the visualization modes.

The reference uploads gray/viridis/inferno/turbo lookup tables to the GPU
(CMapTable, src/utils/typing.h:136-146, applied by the lerp in
tracing_utils.cuh:117-130). Here the tables are sampled from matplotlib
when available (cached as 64-entry arrays) with a hardcoded fallback, and
applied with the same linear interpolation.
"""

from functools import lru_cache

import numpy as np

_FALLBACK_ANCHORS = {
    # coarse anchors, linearly interpolated if matplotlib is unavailable
    "viridis": [
        (0.267, 0.005, 0.329), (0.283, 0.141, 0.458),
        (0.254, 0.265, 0.530), (0.207, 0.372, 0.553),
        (0.164, 0.471, 0.558), (0.128, 0.567, 0.551),
        (0.135, 0.659, 0.518), (0.267, 0.749, 0.441),
        (0.478, 0.821, 0.318), (0.741, 0.873, 0.150),
        (0.993, 0.906, 0.144),
    ],
    "inferno": [
        (0.001, 0.000, 0.014), (0.078, 0.042, 0.206),
        (0.258, 0.039, 0.406), (0.417, 0.090, 0.433),
        (0.578, 0.148, 0.404), (0.735, 0.215, 0.330),
        (0.866, 0.317, 0.226), (0.954, 0.462, 0.100),
        (0.988, 0.645, 0.040), (0.964, 0.844, 0.273),
        (0.988, 0.998, 0.645),
    ],
    "turbo": [
        (0.190, 0.072, 0.232), (0.276, 0.408, 0.883),
        (0.213, 0.718, 0.976), (0.098, 0.937, 0.706),
        (0.446, 0.999, 0.369), (0.780, 0.937, 0.203),
        (0.980, 0.730, 0.222), (0.962, 0.412, 0.074),
        (0.792, 0.166, 0.011), (0.480, 0.016, 0.011),
    ],
    "gray": [(0.0, 0.0, 0.0), (1.0, 1.0, 1.0)],
}

COLORMAPS = ("gray", "viridis", "inferno", "turbo")


@lru_cache(maxsize=8)
def colormap_table(name, size=64):
    """(size, 3) float32 colormap LUT."""
    if name not in COLORMAPS:
        raise ValueError(f"unknown colormap {name}")
    try:
        if name == "gray":
            raise ImportError  # gray is exact via fallback
        import matplotlib.cm as cm

        table = cm.get_cmap(name)(np.linspace(0, 1, size))[:, :3]
        return table.astype(np.float32)
    except Exception:
        anchors = np.asarray(_FALLBACK_ANCHORS[name], np.float32)
        x = np.linspace(0, 1, size)
        xa = np.linspace(0, 1, anchors.shape[0])
        return np.stack(
            [np.interp(x, xa, anchors[:, c]) for c in range(3)], axis=-1
        ).astype(np.float32)


def apply_colormap(values, name="viridis"):
    """Lerp-lookup like the reference colormap() (tracing_utils.cuh:117-130).

    Args:
      values: array in [0, 1] (clipped).
      name: one of COLORMAPS.
    Returns float32 rgb array with a trailing 3-axis.
    """
    table = colormap_table(name)
    m = table.shape[0]
    v = np.clip(np.asarray(values, np.float32), 0.0, 1.0) * (m - 1)
    i0 = np.clip(v.astype(np.int32), 0, m - 1)
    i1 = np.clip(i0 + 1, 0, m - 1)
    t = (v - i0)[..., None]
    return table[i0] * (1.0 - t) + table[i1] * t
