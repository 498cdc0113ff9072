"""Minimal PCD (Point Cloud Data) reader/writer.

Supports the subset the reference stack produces/consumes (PCL `pcd` v0.7:
ascii and binary encodings, xyz / xyzi float fields) so that maps and pose
graphs saved by the reference's pcdSaver (`mapOptimization.h:91`) can be
loaded directly. Pure NumPy on the host — point clouds enter device memory
as padded jnp arrays downstream.
"""
from __future__ import annotations

import numpy as np


def read_pcd(path: str) -> np.ndarray:
    """Read a PCD file, returning an (N, F) float32 array with columns in
    header FIELDS order (typically x, y, z[, intensity])."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, value = line.partition(" ")
            header[key] = value
            if key == "DATA":
                break
        fields = header.get("FIELDS", "x y z").split()
        sizes = [int(s) for s in header.get("SIZE", "4 4 4").split()]
        types = header.get("TYPE", "F F F").split()
        counts = [int(c) for c in header.get("COUNT", " ".join(["1"] * len(fields))).split()]
        n_points = int(header.get("POINTS", header.get("WIDTH", "0")))
        data_kind = header["DATA"]

        np_types = []
        for t, s in zip(types, sizes):
            np_types.append({"F": f"f{s}", "I": f"i{s}", "U": f"u{s}"}[t])

        if data_kind == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, max_rows=n_points)
            raw = np.atleast_2d(raw)
            return raw.astype(np.float32)
        elif data_kind == "binary":
            dtype = np.dtype({
                "names": [f"f{i}" for i in range(len(fields))],
                "formats": [f"{c}{t}" if c > 1 else t for c, t in zip(counts, np_types)],
            })
            buf = f.read(dtype.itemsize * n_points)
            rec = np.frombuffer(buf, dtype=dtype, count=n_points)
            cols = [rec[f"f{i}"].reshape(n_points, -1).astype(np.float32)
                    for i in range(len(fields))]
            return np.concatenate(cols, axis=1)
        elif data_kind == "binary_compressed":
            import lzf  # pragma: no cover - not in image; gate gracefully
            raise NotImplementedError("binary_compressed PCD not supported")
        else:
            raise ValueError(f"unknown PCD DATA kind: {data_kind}")


def write_pcd(path: str, points: np.ndarray, fields=("x", "y", "z"),
              binary: bool = True) -> None:
    """Write an (N, F) array as PCD v0.7 (float32 fields)."""
    points = np.asarray(points, dtype=np.float32)
    n, f_count = points.shape
    assert f_count == len(fields)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {' '.join(fields)}\n"
        f"SIZE {' '.join(['4'] * f_count)}\n"
        f"TYPE {' '.join(['F'] * f_count)}\n"
        f"COUNT {' '.join(['1'] * f_count)}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        if binary:
            fh.write(np.ascontiguousarray(points).tobytes())
        else:
            np.savetxt(fh, points, fmt="%.6f")
