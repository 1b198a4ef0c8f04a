"""Native (C++) Delaunay engine loader.

The engine is built from delaunay/native/src into a shared library and bound
via ctypes (this image has no pybind11; see repo guidelines). Until the
library is present, ``load_native_backend`` returns None and the scipy/Qhull
backend is used.
"""

import os


def load_native_backend():
    try:
        from radfoam_tpu.delaunay.native.backend import NativeBackend
    except Exception:
        return None
    try:
        return NativeBackend()
    except Exception:
        return None
