"""Input validation with clear errors.

The reference validates dtype/device/shape exhaustively at every binding
entry point (torch_bindings/pipeline_bindings.cpp:8-71,
triangulation_bindings.cpp:12-24). These helpers give the same guardrails
at the Python API boundary — cheap host-side checks on array metadata, no
device sync.
"""

import numpy as np
import jax.numpy as jnp


class ValidationError(ValueError):
    pass


def _shape_ok(shape, spec):
    if len(shape) != len(spec):
        return False
    return all(s is None or s == d for s, d in zip(spec, shape))


def check_array(name, arr, shape=None, dtypes=None):
    """shape: tuple with None wildcards; dtypes: iterable of acceptable."""
    a_shape = tuple(arr.shape)
    if shape is not None and not _shape_ok(a_shape, shape):
        raise ValidationError(
            f"{name}: expected shape {shape}, got {a_shape}"
        )
    if dtypes is not None:
        dt = jnp.dtype(arr.dtype)
        accepted = tuple(jnp.dtype(d) for d in dtypes)
        if dt not in accepted:
            raise ValidationError(
                f"{name}: expected dtype in {[str(d) for d in accepted]}, "
                f"got {dt}"
            )
    return arr


def check_trace_inputs(points, attrs, point_adjacency,
                       point_adjacency_offsets, rays, sh_degree):
    """The trace_forward contract (pipeline_bindings.cpp:107-175)."""
    n = points.shape[0]
    a = 1 + 3 * (1 + sh_degree) ** 2
    check_array("points", points, shape=(n, 3), dtypes=["float32"])
    check_array("attributes", attrs, shape=(n, a),
                dtypes=["float32", "float16"])
    check_array("point_adjacency", point_adjacency, shape=(None,),
                dtypes=["uint32", "int32", "int64"])
    check_array("point_adjacency_offsets", point_adjacency_offsets,
                shape=(n + 1,), dtypes=["uint32", "int32", "int64"])
    if rays.shape[-1] != 6:
        raise ValidationError(
            f"rays: last dimension must be 6 ([origin, direction]), "
            f"got {rays.shape[-1]}"
        )


def check_points_finite(points):
    """NaN parameter guard (reference scene.py:161-162)."""
    pts = np.asarray(points)
    if not np.isfinite(pts).all():
        raise RuntimeError("NaN in points")
    return pts
