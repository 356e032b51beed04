"""Golden-value tests for the core geometry ops against pure-numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu import ops


def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_square_distance(rng):
    src = rng.randn(2, 17, 3).astype(np.float32)
    dst = rng.randn(2, 23, 3).astype(np.float32)
    got = ops.square_distance(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(got, np_square_distance(src, dst), atol=1e-4)


def test_knn_point(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    q = rng.randn(2, 16, 3).astype(np.float32)
    idx = np.asarray(ops.knn_point(5, jnp.asarray(xyz), jnp.asarray(q)))
    d = np_square_distance(q, xyz)
    want = np.argsort(d, axis=-1)[..., :5]
    # sets must match (order within k is ascending-distance in our impl)
    assert (np.sort(idx, -1) == np.sort(want, -1)).all()
    # and distances must be ascending
    got_d = np.take_along_axis(d, idx, axis=-1)
    assert (np.diff(got_d, axis=-1) >= -1e-5).all()


def test_index_points(rng):
    pts = rng.randn(3, 32, 7).astype(np.float32)
    idx2 = rng.randint(0, 32, size=(3, 10))
    idx3 = rng.randint(0, 32, size=(3, 10, 4))
    got2 = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx2)))
    got3 = np.asarray(ops.index_points(jnp.asarray(pts), jnp.asarray(idx3)))
    for b in range(3):
        np.testing.assert_array_equal(got2[b], pts[b][idx2[b]])
        np.testing.assert_array_equal(got3[b], pts[b][idx3[b]])


def np_fps(xyz, npoint):
    """Reference FPS: seed index 0, running min-dist cache, argmax selection."""
    B, N, _ = xyz.shape
    idxs = np.zeros((B, npoint), np.int64)
    for b in range(B):
        mind = np.full(N, 1e10)
        last = 0
        for i in range(1, npoint):
            d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            last = int(np.argmax(mind))
            idxs[b, i] = last
    return idxs


def test_fps_matches_reference_semantics(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 16))
    want = np_fps(xyz, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_spread():
    # FPS of a grid must pick well-separated points.
    g = np.stack(np.meshgrid(np.linspace(0, 1, 8), np.linspace(0, 1, 8)), -1)
    pts = np.concatenate([g.reshape(1, 64, 2), np.zeros((1, 64, 1))], -1).astype(
        np.float32
    )
    idx = np.asarray(ops.furthest_point_sample(jnp.asarray(pts), 4))[0]
    sel = pts[0][idx]
    d = np_square_distance(sel[None], sel[None])[0]
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.5  # corners-ish

def test_three_nn_interpolate(rng):
    unknown = rng.randn(2, 20, 3).astype(np.float32)
    known = rng.randn(2, 9, 3).astype(np.float32)
    feats = rng.randn(2, 9, 5).astype(np.float32)
    got = np.asarray(
        ops.three_nn_interpolate(
            jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(feats)
        )
    )
    d = np.sqrt(np_square_distance(unknown, known))
    idx = np.argsort(d, -1)[..., :3]
    nd = np.take_along_axis(d, idx, -1)
    w = 1.0 / (nd + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum(
        "bnk,bnkc->bnc", w, np.take_along_axis(feats[:, None], idx[..., None], 2)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


class TestChamfer:
    def test_forward_vs_numpy(self, rng):
        x = rng.randn(2, 33, 3).astype(np.float32)
        y = rng.randn(2, 57, 3).astype(np.float32)
        d1, d2, i1, i2 = ops.nn_distance(jnp.asarray(x), jnp.asarray(y))
        dm = np_square_distance(x, y)
        np.testing.assert_allclose(np.asarray(d1), dm.min(-1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), dm.min(-2), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), dm.argmin(-1))
        np.testing.assert_array_equal(np.asarray(i2), dm.argmin(-2))

    def test_tiling_boundaries(self, rng):
        # sizes that are not multiples of the tile exercise the padding path
        x = rng.randn(1, 100, 3).astype(np.float32)
        y = rng.randn(1, 1500, 3).astype(np.float32)
        d1, d2, _, _ = ops.nn_distance(jnp.asarray(x), jnp.asarray(y), tile=256)
        dm = np_square_distance(x, y)
        np.testing.assert_allclose(np.asarray(d1), dm.min(-1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), dm.min(-2), atol=1e-4)

    def test_l1_l2_values(self, rng):
        x = rng.randn(2, 40, 3).astype(np.float32)
        y = rng.randn(2, 50, 3).astype(np.float32)
        dm = np_square_distance(x, y)
        want_l1 = (np.sqrt(dm.min(-1)).mean() + np.sqrt(dm.min(-2)).mean()) / 2
        want_l2 = dm.min(-1).mean() + dm.min(-2).mean()
        np.testing.assert_allclose(
            float(ops.chamfer_l1(jnp.asarray(x), jnp.asarray(y))), want_l1, rtol=1e-4
        )
        np.testing.assert_allclose(
            float(ops.chamfer_l2(jnp.asarray(x), jnp.asarray(y))), want_l2, rtol=1e-4
        )

    def test_gradients_match_autodiff(self, rng):
        """Custom VJP must equal autodiff through the dense distance matrix."""
        x = jnp.asarray(rng.randn(2, 12, 3).astype(np.float32))
        y = jnp.asarray(rng.randn(2, 15, 3).astype(np.float32))

        def dense_l2(x, y):
            dm = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
            return dm.min(-1).mean() + dm.min(-2).mean()

        def ours_l2(x, y):
            return ops.chamfer_l2(x, y)

        gx_w, gy_w = jax.grad(dense_l2, argnums=(0, 1))(x, y)
        gx_g, gy_g = jax.grad(ours_l2, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy_g), np.asarray(gy_w), atol=1e-4)

    def test_l1_gradient_vs_dense_autodiff(self, rng):
        x = jnp.asarray(rng.randn(1, 8, 3).astype(np.float32))
        y = jnp.asarray(rng.randn(1, 9, 3).astype(np.float32))

        def dense_l1(x, y):
            dm = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
            s1 = jnp.sqrt(jnp.maximum(dm.min(-1), 1e-24))
            s2 = jnp.sqrt(jnp.maximum(dm.min(-2), 1e-24))
            return (s1.mean() + s2.mean()) / 2

        gx_w, gy_w = jax.grad(dense_l1, argnums=(0, 1))(x, y)
        gx_g, gy_g = jax.grad(lambda x, y: ops.chamfer_l1(x, y), argnums=(0, 1))(x, y)
        np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy_g), np.asarray(gy_w), atol=1e-4)

    def test_masked(self, rng):
        x = rng.randn(1, 10, 3).astype(np.float32)
        y = rng.randn(1, 14, 3).astype(np.float32)
        w1 = np.ones((1, 10), np.float32)
        w2 = np.ones((1, 14), np.float32)
        w1[0, 7:] = 0
        w2[0, 11:] = 0
        got = float(
            ops.chamfer_l2(
                jnp.asarray(x), jnp.asarray(y), jnp.asarray(w1), jnp.asarray(w2)
            )
        )
        dm = np_square_distance(x[:, :7], y[:, :11])
        want = dm.min(-1).mean() + dm.min(-2).mean()
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestSampling:
    def test_jitter_clip(self):
        key = jax.random.PRNGKey(0)
        pc = jnp.zeros((2, 100, 3))
        out = ops.jitter_points(key, pc, std=0.5, clip=0.05)
        assert float(jnp.abs(out).max()) <= 0.05 + 1e-6

    def test_random_sample_distinct(self):
        key = jax.random.PRNGKey(1)
        data = jnp.arange(64, dtype=jnp.float32).reshape(1, 64, 1) * jnp.ones((1, 1, 3))
        out = np.asarray(ops.random_sample(key, data, 16))
        assert len(np.unique(out[0, :, 0])) == 16
