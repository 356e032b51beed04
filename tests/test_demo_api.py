"""Serving-API test: demo.PCReconstructor end to end (reference
demo/pcreconstructor.py:25-88) — config + checkpoint from disk, pcd decode,
fixed-shape preprocessing, jitted forward."""

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo.pcreconstructor import PCReconstructor
from imgadapointr_tpu.tools.runner import Runner
from imgadapointr_tpu.utils.checkpoint import save_checkpoint
from imgadapointr_tpu.utils.config import cfg_from_yaml_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_pcd(path, pts):
    with open(path, "wb") as f:
        f.write(
            (
                "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                f"COUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n"
                f"POINTS {len(pts)}\nDATA binary\n"
            ).encode()
        )
        f.write(np.ascontiguousarray(pts, "<f4").tobytes())


def test_pcreconstructor_predict(tmp_path):
    cfg_path = os.path.join(REPO, "cfgs", "PCN_models", "AdaPoinTr-tiny.yaml")
    cfg = cfg_from_yaml_file(cfg_path, root=REPO)
    runner = Runner(types.SimpleNamespace(tp=1), cfg)
    state = runner.init_state({"partial": np.zeros((1, 2048, 3), np.float32)})
    save_checkpoint(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        None, None, 0, "ckpt-best", str(tmp_path), None,
    )

    rng = np.random.RandomState(0)
    pcd = str(tmp_path / "partial.pcd")
    # 700 points: exercises the tile-up-to-2048 fixed-shape path
    _write_pcd(pcd, (rng.randn(700, 3) * 0.3).astype(np.float32))

    rec = PCReconstructor(cfg_path, str(tmp_path / "ckpt-best.ckpt"))
    fine = rec.predict(pcd)
    n_out = int(cfg.model.num_points)
    assert fine.shape == (n_out, 3)
    assert np.isfinite(fine).all()

    # deterministic serving: same input → same completion
    fine2 = rec.predict(pcd)
    np.testing.assert_array_equal(fine, fine2)
