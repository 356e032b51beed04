"""Round-2 correctness fixes: scheduler warmup semantics, crop/dropping
augmentation parity, ball_query slot order, masked-chamfer gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from imgadapointr_tpu import ops
from imgadapointr_tpu.utils.schedulers import gradual_warmup_lr


def test_gradual_warmup_multiplier_one_reference_semantics():
    """Reference GradualWarmupScheduler (utils/misc.py:287-346) with
    multiplier=1, total_epoch=200, after=StepLR(50, 0.5) — SnowFlakeNet.yaml:
    lr ramps 0→base over 200 epochs with NO StepLR decay during warmup, then
    StepLR decays on (epoch - 200)."""
    base = 0.001
    f = lambda e: float(gradual_warmup_lr(e, base, 1.0, 200, 50, 0.5))
    assert f(0) == 0.0
    np.testing.assert_allclose(f(100), base * 0.5, rtol=1e-6)
    np.testing.assert_allclose(f(200), base, rtol=1e-6)  # warmup complete
    np.testing.assert_allclose(f(201), base, rtol=1e-6)  # StepLR epoch 1
    np.testing.assert_allclose(f(250), base * 0.5, rtol=1e-6)  # floor(50/50)=1
    np.testing.assert_allclose(f(449), base * 0.5 ** 4, rtol=1e-6)


def test_gradual_warmup_multiplier_gt_one():
    base = 0.01
    f = lambda e: float(gradual_warmup_lr(e, base, 2.0, 10, 5, 0.1))
    np.testing.assert_allclose(f(0), base, rtol=1e-6)  # ramp starts at base
    np.testing.assert_allclose(f(5), base * 1.5, rtol=1e-6)
    np.testing.assert_allclose(f(10), base * 2.0, rtol=1e-6)
    np.testing.assert_allclose(f(16), base * 2.0 * 0.1, rtol=1e-6)


def test_separate_point_cloud_fixed_viewpoint_not_normalized():
    """The fixed corner viewpoints (e.g. (1,1,1)) must be used RAW — the
    reference only F.normalize's the random center (utils/misc.py:172-179)."""
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    vp = jnp.asarray([1.0, 1.0, 1.0])
    num_crop = 16
    inp, crop = ops.separate_point_cloud(xyz, num_crop, fixed_point=vp)
    # reference: crop = num_crop points nearest to the raw viewpoint
    d = np.linalg.norm(np.asarray(xyz) - np.asarray(vp)[None, None], axis=-1)
    order = np.argsort(d, axis=-1)
    for b in range(2):
        want = set(map(tuple, np.asarray(xyz)[b][order[b][:num_crop]]))
        got = set(map(tuple, np.asarray(crop)[b]))
        assert want == got


def test_ball_query_index_order_fill():
    """pointnet2 CUDA semantics: first nsample IN-RADIUS points in index
    order; short lists repeat the first in-radius point; empty lists keep 0."""
    # points at distances ordered against index order
    pts = np.zeros((1, 5, 3), np.float32)
    pts[0, 0] = [0.30, 0, 0]
    pts[0, 1] = [0.10, 0, 0]
    pts[0, 2] = [5.00, 0, 0]  # out of radius
    pts[0, 3] = [0.20, 0, 0]
    pts[0, 4] = [0.05, 0, 0]
    q = np.zeros((1, 1, 3), np.float32)
    idx = np.asarray(ops.ball_query(0.35, 3, jnp.asarray(pts), jnp.asarray(q)))[0, 0]
    assert list(idx) == [0, 1, 3]  # index order, NOT distance order
    idx6 = np.asarray(ops.ball_query(0.35, 6, jnp.asarray(pts), jnp.asarray(q)))[0, 0]
    assert list(idx6) == [0, 1, 3, 4, 0, 0]  # short → repeat first in-radius
    none = np.asarray(ops.ball_query(0.01, 3, jnp.asarray(pts), jnp.asarray(q)))[0, 0]
    assert list(none) == [0, 0, 0]  # nothing in radius → zero-init kept


def test_masked_chamfer_grad_does_not_raise():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 48, 3)).astype(np.float32))
    w1 = jnp.ones((2, 32))
    w2 = jnp.ones((2, 48))
    g = jax.grad(lambda a: ops.chamfer_l1(a, y, w1, w2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_random_dropping_fps_prefix_and_zero_pad():
    rng = np.random.default_rng(2)
    pc = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    out = np.asarray(ops.random_dropping(key, pc, 0))
    assert out.shape == (2, 128, 3)
    # count kept (nonzero) rows; must be in [1, 768) and identical across batch
    kept = (np.abs(out).sum(-1) > 0).sum(axis=-1)
    assert (kept == kept[0]).all() and 1 <= kept[0] < 768
    # kept rows are the FPS-order prefix of the cloud
    order = np.asarray(ops.furthest_point_sample(pc, 128))
    spread = np.asarray(ops.index_points(pc, jnp.asarray(order)))
    np.testing.assert_allclose(out[:, : kept[0]], spread[:, : kept[0]], atol=1e-6)
    assert (out[:, kept[0]:] == 0).all()


def test_train_random_crop_shapes_and_membership():
    rng = np.random.default_rng(4)
    npoints = 256
    gt = jnp.asarray(rng.normal(size=(2, npoints, 3)).astype(np.float32))
    partial = np.asarray(ops.train_random_crop(jax.random.PRNGKey(5), gt, npoints, 64))
    assert partial.shape == (2, 64, 3)
    # every output point must be one of the gt points (crop+fps only selects)
    for b in range(2):
        gtset = set(map(tuple, np.asarray(gt)[b]))
        assert all(tuple(p) in gtset for p in partial[b])
