"""Minimal PCD -> KITTI .bin converter (x, y, z, intensity float32).

Replaces the reference's pypcd dependency
(/root/reference/scripts/data_converter/gen_kitti/utils.py pcd2bin); supports
ASCII and binary PCD v0.7 files.
"""
from __future__ import annotations

import numpy as np

_DTYPES = {("F", 4): np.float32, ("F", 8): np.float64,
           ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
           ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32}


def read_pcd(path: str) -> tuple[np.ndarray, list[str]]:
    """Returns (points (N, num_fields) float32, field names)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition(" ")
            header[key] = value
            if key == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = [int(s) for s in header["SIZE"].split()]
        types = header["TYPE"].split()
        counts = [int(c) for c in header.get(
            "COUNT", " ".join(["1"] * len(fields))).split()]
        n = int(header["POINTS"])
        if header["DATA"] == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n)
            data = rows.reshape(n, -1)
        elif header["DATA"] == "binary":
            dtype = np.dtype([
                (name, _DTYPES[(t, s)], (cnt,) if cnt > 1 else ())
                for name, s, t, cnt in zip(fields, sizes, types, counts)])
            raw = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype, count=n)
            data = np.stack(
                [raw[name].reshape(n, -1)[:, 0] for name in fields], axis=1)
        else:
            raise ValueError(f"unsupported PCD DATA {header['DATA']}")
    return data.astype(np.float32), fields


def pcd2bin(pcd_path: str, bin_path: str) -> None:
    """Write KITTI velodyne .bin: (N, 4) float32 x, y, z, intensity."""
    data, fields = read_pcd(pcd_path)
    cols = {name: i for i, name in enumerate(fields)}
    out = np.zeros((data.shape[0], 4), np.float32)
    for j, name in enumerate(("x", "y", "z")):
        out[:, j] = data[:, cols[name]]
    if "intensity" in cols:
        inten = data[:, cols["intensity"]]
        if inten.max() > 1.0:
            inten = inten / 255.0
        out[:, 3] = inten
    out.tofile(bin_path)
