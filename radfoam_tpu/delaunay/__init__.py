from radfoam_tpu.delaunay.api import (
    Triangulation,
    TriangulationFailedError,
)

__all__ = ["Triangulation", "TriangulationFailedError"]
