"""Minimal binary-little-endian PLY writer/reader.

Replaces the third-party ``plyfile`` dependency the reference uses
(radfoam_model/scene.py:5). Supports exactly what the scene checkpoint
format needs (scene.py:550-612): multiple elements with scalar properties
of mixed dtypes.
"""

import numpy as np

_PLY_TYPES = {
    np.dtype("float32"): "float",
    np.dtype("float64"): "double",
    np.dtype("uint8"): "uchar",
    np.dtype("int8"): "char",
    np.dtype("uint16"): "ushort",
    np.dtype("int16"): "short",
    np.dtype("uint32"): "uint",
    np.dtype("int32"): "int",
}
_PLY_TYPES_INV = {v: k for k, v in _PLY_TYPES.items()}
_PLY_TYPES_INV.update({
    "float32": np.dtype("float32"),
    "float64": np.dtype("float64"),
    "uint8": np.dtype("uint8"),
    "int8": np.dtype("int8"),
    "uint16": np.dtype("uint16"),
    "int16": np.dtype("int16"),
    "uint32": np.dtype("uint32"),
    "int32": np.dtype("int32"),
})


def write_ply(path, elements):
    """Write a binary PLY file.

    Args:
      path: output path.
      elements: list of (name, structured_array) in file order; each array's
        dtype fields become PLY properties.
    """
    header = ["ply", "format binary_little_endian 1.0"]
    for name, arr in elements:
        header.append(f"element {name} {arr.shape[0]}")
        for field in arr.dtype.names:
            ftype = _PLY_TYPES[arr.dtype.fields[field][0]]
            header.append(f"property {ftype} {field}")
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for _, arr in elements:
            f.write(arr.tobytes())


def read_ply(path):
    """Read a binary or ascii PLY file -> dict name -> structured array."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError("not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop, dtype)])
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            parts = line.decode("ascii").strip().split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    raise ValueError("list properties not supported")
                elements[-1][2].append((parts[2], _PLY_TYPES_INV[parts[1]]))
            elif parts[0] == "end_header":
                break

        out = {}
        for name, count, props in elements:
            dtype = np.dtype([(p, d) for p, d in props])
            if fmt == "binary_little_endian":
                data = np.frombuffer(
                    f.read(dtype.itemsize * count), dtype=dtype, count=count
                )
            elif fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                data = np.array(
                    [tuple(r) for r in rows], dtype=dtype
                )
            else:
                raise ValueError(f"unsupported PLY format {fmt}")
            out[name] = data
        return out
