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


def test_normals_grad_finite_on_degenerate_neighborhoods():
    """arccos at the r=±1 clip boundary has an infinite derivative; clouds
    with coplanar-circle / collapsed neighborhoods (two equal covariance
    eigenvalues) saturate it. Caught live in round 4: the seg-superset
    convergence arm (normals on mid-training coarse clouds) went NaN at
    epoch 1. Both value and gradient must stay finite on such clouds."""
    import jax

    from imgadapointr_tpu.ops.normals import estimate_pointcloud_normals

    t = jnp.linspace(0, 2 * jnp.pi, 33)[:-1]
    circle = jnp.stack([jnp.cos(t), jnp.sin(t), jnp.zeros_like(t)], -1)
    collapsed = jnp.zeros((8, 3))  # exactly duplicated points
    pts = jnp.concatenate([circle, collapsed])[None]  # (1, 40, 3)

    n = estimate_pointcloud_normals(pts, 16)
    assert np.isfinite(np.asarray(n)).all()

    g = jax.grad(lambda p: jnp.sum(estimate_pointcloud_normals(p, 16) ** 2))(pts)
    assert np.isfinite(np.asarray(g)).all(), "NaN/inf gradient on degenerate cloud"
