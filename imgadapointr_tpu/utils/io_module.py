"""Point-cloud file IO: .npy/.npz/.pcd/.ply/.h5/.txt readers.

Reference utils/io_module.py:8-51 delegates .pcd/.ply to open3d; here they
are self-contained parsers (ASCII + the binary layouts PCN ships) with no
native dependency.
"""

from __future__ import annotations

import os
import struct

import numpy as np


class IO:
    use_native = True  # native/pcio.cpp fast path when built

    @classmethod
    def get(cls, file_path: str) -> np.ndarray:
        ext = os.path.splitext(file_path)[-1].lower()
        if cls.use_native and ext in (".pcd", ".ply", ".npy"):
            from ..datasets.native_io import read_cloud

            arr = read_cloud(file_path)
            if arr is not None:
                return arr
        if ext in (".npy",):
            return cls._read_npy(file_path)
        if ext in (".npz",):
            return np.load(file_path)["pts"]
        if ext in (".pcd",):
            return cls._read_pcd(file_path)
        if ext in (".ply",):
            return cls._read_ply(file_path)
        if ext in (".h5",):
            return cls._read_h5(file_path)
        if ext in (".txt", ".dat", ".xyz"):
            return cls._read_txt(file_path)
        raise ValueError(f"Unsupported file extension: {ext}")

    @classmethod
    def put(cls, file_path: str, arr: np.ndarray):
        ext = os.path.splitext(file_path)[-1].lower()
        if ext == ".npy":
            np.save(file_path, arr)
        elif ext == ".txt" or ext == ".xyz":
            np.savetxt(file_path, arr)
        elif ext == ".ply":
            cls._write_ply(file_path, arr)
        else:
            raise ValueError(f"Unsupported file extension: {ext}")

    @classmethod
    def _read_npy(cls, path):
        return np.load(path).astype(np.float32)

    @classmethod
    def _read_txt(cls, path):
        return np.loadtxt(path).astype(np.float32)

    @classmethod
    def _read_h5(cls, path):
        import h5py

        with h5py.File(path, "r") as f:
            return f["data"][()].astype(np.float32)

    @classmethod
    def _read_pcd(cls, path):
        """PCD v0.7: ASCII and binary, xyz fields."""
        with open(path, "rb") as f:
            header = {}
            while True:
                raw = f.readline()
                if not raw:  # EOF before DATA — a bare `continue` would spin
                    raise ValueError(f"truncated PCD header (no DATA line): {path}")
                line = raw.decode("ascii", errors="replace").strip()
                if line.startswith("#") or not line:
                    continue
                key, _, val = line.partition(" ")
                header[key.upper()] = val
                if key.upper() == "DATA":
                    break
            fields = header.get("FIELDS", "x y z").split()
            sizes = [int(s) for s in header.get("SIZE", "4 4 4").split()]
            types = header.get("TYPE", "F F F").split()
            counts = [int(c) for c in header["COUNT"].split()] if "COUNT" in header else [1] * len(fields)
            n = int(header.get("POINTS", header.get("WIDTH", "0")))
            data_kind = header["DATA"].split()[0]
            xyz_idx = [fields.index(c) for c in ("x", "y", "z")]

            if data_kind == "ascii":
                body = np.loadtxt(f, dtype=np.float32, max_rows=n)
                body = body.reshape(n, -1)
                return body[:, xyz_idx].astype(np.float32)

            # binary: build a numpy structured dtype
            np_types = {("F", 4): "f4", ("F", 8): "f8", ("U", 1): "u1",
                        ("U", 2): "u2", ("U", 4): "u4", ("I", 1): "i1",
                        ("I", 2): "i2", ("I", 4): "i4"}
            dt = []
            for i, name in enumerate(fields):
                base = np_types[(types[i], sizes[i])]
                cnt = counts[i] if i < len(counts) else 1
                dt.append((name if cnt == 1 else f"{name}", base, (cnt,) if cnt > 1 else ()))
            if data_kind == "binary":
                raw = np.frombuffer(f.read(), dtype=np.dtype(dt), count=n)
            elif data_kind == "binary_compressed":
                import lzf  # pragma: no cover - not shipped; PCN uses plain binary/ascii

                raise NotImplementedError("binary_compressed PCD not supported")
            else:
                raise ValueError(f"unknown PCD DATA {data_kind}")
            return np.stack(
                [raw["x"], raw["y"], raw["z"]], axis=-1
            ).astype(np.float32)

    @classmethod
    def _read_ply(cls, path):
        """PLY: ascii or binary_little_endian, vertex x/y/z properties."""
        with open(path, "rb") as f:
            assert f.readline().strip() == b"ply", "not a PLY file"
            fmt = None
            n_vertex = 0
            props = []
            while True:
                raw = f.readline()
                if not raw:  # EOF before end_header — would loop forever
                    raise ValueError(f"truncated PLY header: {path}")
                line = raw.decode("ascii").strip()
                if line.startswith("format"):
                    fmt = line.split()[1]
                elif line.startswith("element vertex"):
                    n_vertex = int(line.split()[-1])
                    props = []
                elif line.startswith("element"):
                    props = None  # later elements: stop collecting
                elif line.startswith("property") and props is not None:
                    parts = line.split()
                    props.append((parts[-1], parts[1]))
                elif line == "end_header":
                    break
            type_map = {"float": "f4", "float32": "f4", "double": "f8",
                        "uchar": "u1", "uint8": "u1", "int": "i4", "int32": "i4",
                        "short": "i2", "ushort": "u2"}
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(n_vertex)]
                arr = np.array(rows, dtype=np.float32)
                names = [p[0] for p in props]
                xyz = [names.index(c) for c in ("x", "y", "z")]
                return arr[:, xyz]
            dt = np.dtype([(name, "<" + type_map[t]) for name, t in props])
            raw = np.frombuffer(f.read(dt.itemsize * n_vertex), dtype=dt, count=n_vertex)
            return np.stack([raw["x"], raw["y"], raw["z"]], -1).astype(np.float32)

    @classmethod
    def _write_ply(cls, path, arr):
        with open(path, "wb") as f:
            header = (
                "ply\nformat binary_little_endian 1.0\n"
                f"element vertex {len(arr)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n"
            )
            f.write(header.encode("ascii"))
            f.write(np.ascontiguousarray(arr, dtype="<f4").tobytes())
