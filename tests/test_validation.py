"""Binding-boundary validation parity tests."""

import numpy as np
import pytest

from radfoam_tpu import create_pipeline
from radfoam_tpu.utils.validation import (
    ValidationError,
    check_array,
    check_points_finite,
)


def test_check_array_shape_and_dtype():
    a = np.zeros((4, 3), np.float32)
    check_array("a", a, shape=(None, 3), dtypes=["float32"])
    with pytest.raises(ValidationError):
        check_array("a", a, shape=(None, 4))
    with pytest.raises(ValidationError):
        check_array("a", a, dtypes=["float16"])


def test_nan_guard():
    pts = np.zeros((8, 3), np.float32)
    check_points_finite(pts)
    pts[3, 1] = np.nan
    with pytest.raises(RuntimeError):
        check_points_finite(pts)


def test_pipeline_rejects_bad_attr_width(rng):
    pipe = create_pipeline(2, "float32")  # expects 1 + 27 = 28 attrs
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    attrs = rng.standard_normal((64, 10)).astype(np.float32)
    adjacency = np.zeros((10,), np.uint32)
    offsets = np.zeros((65,), np.uint32)
    rays = np.zeros((4, 6), np.float32)
    with pytest.raises(ValidationError):
        pipe.trace_forward(pts, attrs, adjacency, offsets, rays,
                           np.zeros(4, np.int32))
