"""Round-4 fix coverage: env-flag parsing, num_points-less ShapeNet gate."""

import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.utils.envflags import env_flag


def test_env_flag_falsy_values(monkeypatch):
    """FLAG=0/false/off must read as OFF (ADVICE r3: the bare truthiness
    test made IMGADAPOINTR_ENABLE_MXU_EVAL_CHAMFER=0 enable the kernel)."""
    for v in ("0", "false", "False", "no", "off", "", " 0 "):
        monkeypatch.setenv("IMGADAPOINTR_TEST_FLAG", v)
        assert env_flag("IMGADAPOINTR_TEST_FLAG") is False, v
    for v in ("1", "true", "yes", "on", "anything"):
        monkeypatch.setenv("IMGADAPOINTR_TEST_FLAG", v)
        assert env_flag("IMGADAPOINTR_TEST_FLAG") is True, v
    monkeypatch.delenv("IMGADAPOINTR_TEST_FLAG")
    assert env_flag("IMGADAPOINTR_TEST_FLAG") is False
    assert env_flag("IMGADAPOINTR_TEST_FLAG", default=True) is True


def test_mxu_eval_gate_respects_zero(monkeypatch):
    """The opt-in gate itself: =0 disables even at MXU-eligible sizes."""
    from imgadapointr_tpu.ops.chamfer import mxu_eval_chamfer_active

    monkeypatch.setenv("IMGADAPOINTR_ENABLE_MXU_EVAL_CHAMFER", "0")
    assert mxu_eval_chamfer_active(16384, 16384) is False


def test_shapenet55_gate_tolerates_missing_num_points():
    """_test_shapenet55's F-band gate must not TypeError when the model
    config omits the optional num_points (ADVICE r3 item 2). Covered at
    the expression level: the hint falls back to the gt size."""
    from imgadapointr_tpu.utils.config import AttrDict

    config = AttrDict({"model": {"NAME": "AdaPoinTr"}})
    gt_rep = jnp.zeros((4, 8192, 3))
    n_pred_hint = config.model.get("num_points", None) or gt_rep.shape[1]
    assert int(n_pred_hint) == 8192
    config2 = AttrDict({"model": {"NAME": "AdaPoinTr", "num_points": 16384}})
    assert int(config2.model.get("num_points", None) or gt_rep.shape[1]) == 16384


def test_env_flag_imported_where_referenced():
    """The kernel gates call env_flag inside `backend=='tpu' and ...`
    conjunctions, so a missing import is INVISIBLE to the CPU suite (the
    conjunction short-circuits) and only crashes on real TPU — caught live
    in round 4. Assert every module that references env_flag binds it."""
    import importlib

    for modname in (
        "imgadapointr_tpu.ops.pointops",
        "imgadapointr_tpu.ops.chamfer",
        "imgadapointr_tpu.ops.emd",
        "imgadapointr_tpu.models.gdanet",
    ):
        mod = importlib.import_module(modname)
        assert hasattr(mod, "env_flag"), f"{modname} references env_flag without importing it"
        assert mod.env_flag("IMGADAPOINTR_NOT_SET_XYZ", default=False) is False
