"""Point-axis sharded ops (ops/sharded.py) vs the unsharded library.

Runs on the virtual 8-device CPU mesh (tests/conftest.py). These ops are a
beyond-parity scaling capability (SURVEY.md §5: in this domain "long
context" = more points per cloud), so the contract tested here is
EXACTNESS against the unsharded ops, including gradients through the
ppermute rings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.ops.chamfer import (
    _nn_one_direction,
    chamfer_l1,
    chamfer_l2,
)
from imgadapointr_tpu.ops.pointops import furthest_point_sample, knn_with_distance
from imgadapointr_tpu.ops.sharded import (
    make_points_mesh,
    sharded_chamfer_l1,
    sharded_chamfer_l2,
    sharded_fps,
    sharded_knn,
    sharded_nn_distance,
)


@pytest.fixture(scope="module")
def mesh():
    return make_points_mesh()


def _clouds(key, b=2, n=1024, m=2048):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(k1, (b, n, 3), jnp.float32)
    y = jax.random.normal(k2, (b, m, 3), jnp.float32)
    return x, y


def _nn_distance_diff_form(x, y):
    """Diff-form bidirectional NN reference — the selection arithmetic the
    unsharded op uses on TPU (Pallas kernels); index equality against the
    CPU matmul-form scan would be tie-fragile (see ops/sharded.py)."""
    d1, i1 = _nn_one_direction(x, y, None, 2048, diff_form=True)
    d2, i2 = _nn_one_direction(y, x, None, 2048, diff_form=True)
    return d1, d2, i1, i2


def test_nn_distance_matches_unsharded(mesh):
    x, y = _clouds(0)
    d1, d2, i1, i2 = sharded_nn_distance(x, y, mesh)
    rd1, rd2, ri1, ri2 = _nn_distance_diff_form(x, y)
    assert np.array_equal(np.asarray(i1), np.asarray(ri1))
    assert np.array_equal(np.asarray(i2), np.asarray(ri2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2), rtol=2e-6)


def test_nn_distance_asymmetric_shapes(mesh):
    # N != M, non-tile-multiple blocks (1536/8 = 192, 2560/8 = 320)
    x, y = _clouds(1, b=1, n=1536, m=2560)
    _, _, i1, i2 = sharded_nn_distance(x, y, mesh)
    _, _, ri1, ri2 = _nn_distance_diff_form(x, y)
    assert np.array_equal(np.asarray(i1), np.asarray(ri1))
    assert np.array_equal(np.asarray(i2), np.asarray(ri2))


def test_self_distance_zero(mesh):
    x, _ = _clouds(2)
    d1, d2, i1, i2 = sharded_nn_distance(x, x, mesh)
    assert float(jnp.max(d1)) < 1e-10 and float(jnp.max(d2)) < 1e-10
    n = x.shape[1]
    assert np.array_equal(np.asarray(i1), np.tile(np.arange(n), (2, 1)))


def test_chamfer_values_match(mesh):
    x, y = _clouds(3)
    np.testing.assert_allclose(
        float(sharded_chamfer_l1(x, y, mesh)), float(chamfer_l1(x, y)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(sharded_chamfer_l2(x, y, mesh)), float(chamfer_l2(x, y)),
        rtol=1e-6,
    )


def test_chamfer_grads_match_unsharded(mesh):
    """Gradients through the ppermute rings == the unsharded custom VJP."""
    x, y = _clouds(4, b=2, n=512, m=1024)

    gx_s, gy_s = jax.grad(
        lambda a, b: sharded_chamfer_l1(a, b, mesh), argnums=(0, 1)
    )(x, y)
    gx_r, gy_r = jax.grad(chamfer_l1, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(
        np.asarray(gx_s), np.asarray(gx_r), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gy_s), np.asarray(gy_r), rtol=1e-5, atol=1e-7
    )


def test_chamfer_l2_grads_match(mesh):
    x, y = _clouds(5, b=1, n=512, m=512)
    gx_s, gy_s = jax.grad(
        lambda a, b: sharded_chamfer_l2(a, b, mesh), argnums=(0, 1)
    )(x, y)
    gx_r, gy_r = jax.grad(chamfer_l2, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(
        np.asarray(gx_s), np.asarray(gx_r), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(gy_s), np.asarray(gy_r), rtol=1e-5, atol=1e-7
    )


def test_knn_matches_unsharded(mesh):
    x, y = _clouds(6, b=2, n=1024, m=2048)
    # queries = x rows, reference set = y. Reference ranking is DIFF-FORM —
    # what the unsharded op computes on TPU (Pallas peeling kernel) and in
    # its diff_form fallback; the CPU matmul-form top_k regime is the one
    # documented near-tie exception (ops/sharded.py docstring).
    idx_s = sharded_knn(8, y, x, mesh)
    idx_r = knn_with_distance(8, y, x, diff_form=True)[1]
    assert np.array_equal(np.asarray(idx_s), np.asarray(idx_r))


def test_knn_k_exceeding_block_asserts(mesh):
    x, y = _clouds(7, b=1, n=64, m=64)
    with pytest.raises(AssertionError):
        sharded_knn(16, y, x, mesh)  # 64/8 = 8 < 16


def test_fps_matches_unsharded(mesh):
    x, _ = _clouds(8, b=2, n=1024)
    # diff-form reference = the Pallas FPS kernel's arithmetic (what the
    # unsharded op computes on TPU); see test_knn_matches_unsharded
    idx_s = sharded_fps(x, 128, mesh)
    idx_r = furthest_point_sample(x, 128, diff_form=True)
    assert np.array_equal(np.asarray(idx_s), np.asarray(idx_r))


def test_big_n_smoke(mesh):
    """32k-point clouds sharded over 8 devices: runs, finite, self-consistent."""
    x, y = _clouds(9, b=1, n=32768, m=32768)
    loss = float(sharded_chamfer_l1(x, y, mesh))
    assert np.isfinite(loss) and loss > 0
    # matched clouds → exactly zero
    assert float(sharded_chamfer_l2(x, x, mesh)) < 1e-10


def test_divisibility_asserts(mesh):
    x, y = _clouds(10, b=1, n=1004, m=1024)
    with pytest.raises(AssertionError):
        sharded_nn_distance(x, y, mesh)
