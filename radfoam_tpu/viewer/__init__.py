from radfoam_tpu.viewer.viewer import (
    Viewer,
    ViewerOptions,
    run_with_viewer,
    TurntableRenderer,
)

__all__ = [
    "Viewer", "ViewerOptions", "run_with_viewer", "TurntableRenderer",
]
