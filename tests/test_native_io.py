"""Native IO (native/pcio.cpp) parity against the pure-Python readers."""

import numpy as np
import pytest

from imgadapointr_tpu.datasets import native_io
from imgadapointr_tpu.utils.io_module import IO


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _write_pcd_binary(path, pts):
    with open(path, "wb") as f:
        header = (
            "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
            "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {len(pts)}\nDATA binary\n"
        )
        f.write(header.encode())
        f.write(np.ascontiguousarray(pts, "<f4").tobytes())


def _write_pcd_ascii(path, pts):
    with open(path, "w") as f:
        f.write(
            "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
            f"WIDTH {len(pts)}\nHEIGHT 1\nPOINTS {len(pts)}\nDATA ascii\n"
        )
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def test_native_matches_python_readers(tmp_path, lib):
    rng = np.random.RandomState(0)
    pts = rng.randn(137, 3).astype(np.float32)

    pcd_b = str(tmp_path / "b.pcd")
    pcd_a = str(tmp_path / "a.pcd")
    npy = str(tmp_path / "c.npy")
    ply = str(tmp_path / "d.ply")
    _write_pcd_binary(pcd_b, pts)
    _write_pcd_ascii(pcd_a, pts)
    np.save(npy, pts)
    IO._write_ply(ply, pts)

    for path, atol in ((pcd_b, 0), (pcd_a, 1e-4), (npy, 0), (ply, 0)):
        got = native_io.read_cloud(path)
        assert got is not None, path
        np.testing.assert_allclose(got, pts, atol=atol, err_msg=path)
        # IO.get dispatches through native and must agree with python fallback
        IO.use_native = False
        want = IO.get(path)
        IO.use_native = True
        np.testing.assert_allclose(got, want, atol=atol, err_msg=path)


def test_native_batch_load(tmp_path, lib):
    rng = np.random.RandomState(1)
    paths = []
    for i in range(6):
        pts = rng.randn(200 + i, 3).astype(np.float32)
        p = str(tmp_path / f"{i}.npy")
        np.save(p, pts)
        paths.append(p)
    batch = native_io.load_batch(paths, n_points=128, seed=7)
    assert batch is not None and batch.shape == (6, 128, 3)
    # sampled points must come from the source clouds (or zero-pad)
    src0 = np.load(paths[0])
    for row in batch[0]:
        assert (np.abs(src0 - row).sum(-1) < 1e-6).any() or (row == 0).all()


def test_native_sample_pads_short_clouds(lib):
    import ctypes

    pts = np.arange(9, dtype=np.float32).reshape(3, 3)
    out = np.empty((5, 3), np.float32)
    lib.pcio_sample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 3,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 5, 0,
    )
    assert (out[3:] == 0).all()
    assert {tuple(r) for r in out[:3]} == {tuple(r) for r in pts}


def test_native_missing_file_returns_none(lib):
    assert native_io.read_cloud("/nonexistent/file.pcd") is None
