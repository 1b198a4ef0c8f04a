"""radfoam_tpu — a TPU-native reimplementation of Radiant Foam.

The public surface mirrors the reference pybind module ``radfoam``
(reference: torch_bindings/pipeline_bindings.cpp:626-693,
torch_bindings/triangulation_bindings.cpp:219-249) so that the entry
scripts (train/test/benchmark/viewer) keep the same call structure, while
the implementation is JAX/XLA/Pallas on TPU.

Key exports:
  - ``Triangulation`` / ``TriangulationFailedError`` — Delaunay graph builder
    (host-side engine; reference src/delaunay/delaunay.cu)
  - ``build_aabb_tree`` / ``nn`` — nearest-neighbor start-cell query
    (reference src/aabb_tree/aabb_tree.cu; here an MXU brute-force / sorted
    query, see ops/nn.py)
  - ``Pipeline`` via ``create_pipeline`` — the differentiable ray tracer
    (reference src/tracing/pipeline.cu; here ops/trace.py)
  - ``BatchFetcher`` — async host data pipeline (reference
    src/utils/batch_fetcher.cpp; here data/fetcher.py)
  - ``farthest_neighbor`` — densification helper
    (reference src/delaunay/triangulation_ops.cu)
"""

import os as _os

# Honor an explicit JAX_PLATFORMS environment choice even when an ambient
# sitecustomize pre-forces another platform list (e.g. a TPU-tunnel
# backend): subprocess CLI runs with JAX_PLATFORMS=cpu must actually run on
# CPU — both for determinism and because only one process may own the TPU
# tunnel at a time.
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms:
    try:
        import jax as _jax

        if str(_jax.config.jax_platforms or "") != _env_platforms:
            _jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass

from radfoam_tpu.delaunay import Triangulation, TriangulationFailedError
from radfoam_tpu.ops.nn import build_aabb_tree, nn
from radfoam_tpu.ops.adjacency import farthest_neighbor
from radfoam_tpu.ops.pipeline import Pipeline, create_pipeline
from radfoam_tpu.data.fetcher import BatchFetcher

__version__ = "0.1.0"


def run_with_viewer(model, loop_fn, total_iterations=None, **kwargs):
    """API parity with radfoam.run_with_viewer
    (torch_bindings/pipeline_bindings.cpp:592-624); serves the HTTP viewer
    while running the training callback."""
    from radfoam_tpu.viewer import run_with_viewer as _impl

    return _impl(model, loop_fn, total_iterations=total_iterations, **kwargs)


__all__ = [
    "Triangulation",
    "TriangulationFailedError",
    "build_aabb_tree",
    "nn",
    "farthest_neighbor",
    "Pipeline",
    "create_pipeline",
    "BatchFetcher",
    "run_with_viewer",
    "__version__",
]
