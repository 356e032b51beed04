"""CPU interpret-mode coverage for the Pallas nearest-neighbour kernels.

The real-TPU parity/speed gate is ``benchmarks/kernels.py``; these tests run
the same kernel logic through the Pallas interpreter on CPU so CI catches
logic regressions (padding, tie-breaks, accumulation across the grid)
without a chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from imgadapointr_tpu.ops.pallas.nn_distance import (
    knn_pallas,
    nn_argmin_bidir_exact,
    nn_one_direction_pallas,
)


def brute_nn(x, y):
    d = ((x[:, :, None] - y[:, None]) ** 2).sum(-1)
    return d.argmin(-1), d.min(-1)


@pytest.mark.parametrize("B,N,M", [(2, 300, 400), (1, 128, 1500)])
def test_bidir_exact_argmin_interpret(B, N, M):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    y = jnp.asarray(rng.randn(B, M, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        i1, i2 = nn_argmin_bidir_exact(x, y)
        d1d, i1d = nn_one_direction_pallas(x, y)
    w1, _ = brute_nn(np.asarray(x, np.float64), np.asarray(y, np.float64))
    w2, _ = brute_nn(np.asarray(y, np.float64), np.asarray(x, np.float64))
    # selection must be exactly the brute-force argmin
    np.testing.assert_array_equal(np.asarray(i1), w1)
    np.testing.assert_array_equal(np.asarray(i2), w2)
    np.testing.assert_array_equal(np.asarray(i1d), w1)


def test_bidir_exact_dense_surface_selection():
    """Regression for approximate selection: on DENSE surface clouds the
    NN spacings are tiny. A packed-index variant (quantized comparison,
    lowest-index bucket bias) degraded synthetic-benchmark convergence to
    CD-L1 16.8 at epoch 20, and a matmul-form variant (f32 cancellation
    floor ~3e-8 absolute) still reached only 15.2, vs 12.3 for diff-form —
    selection must be diff-form exact."""
    rng = np.random.RandomState(4)
    v = rng.randn(1, 2048, 3)
    x = jnp.asarray(0.5 * v / np.linalg.norm(v, axis=-1, keepdims=True), jnp.float32)
    v2 = rng.randn(1, 2048, 3)
    y = jnp.asarray(0.5 * v2 / np.linalg.norm(v2, axis=-1, keepdims=True), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        i1, i2 = nn_argmin_bidir_exact(x, y)
    want1, _ = brute_nn(np.asarray(x, np.float64), np.asarray(y, np.float64))
    want2, _ = brute_nn(np.asarray(y, np.float64), np.asarray(x, np.float64))
    np.testing.assert_array_equal(np.asarray(i1), want1)
    np.testing.assert_array_equal(np.asarray(i2), want2)


def test_bidir_exact_identical_clouds_identity_interpret():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 256, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        i1, i2 = nn_argmin_bidir_exact(x, x)
    np.testing.assert_array_equal(np.asarray(i1)[0], np.arange(256))
    np.testing.assert_array_equal(np.asarray(i2)[0], np.arange(256))


def test_knn_pallas_interpret():
    """kNN selection must also be exact: a packed-index peeling variant
    (near-tie rank swaps) measured ~0.5 CD-L1 worse at epoch 20 on the
    synthetic convergence A/B despite neighbour sets feeding only
    order-invariant gathers/max-pools."""
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 200, 3), jnp.float32)
    r = jnp.asarray(rng.randn(2, 500, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        dist, idx = knn_pallas(5, r, q)
    d = ((np.asarray(q, np.float64)[:, :, None] - np.asarray(r, np.float64)[:, None]) ** 2).sum(-1)
    want = np.argsort(d, axis=-1)[..., :5]
    np.testing.assert_array_equal(np.asarray(idx), want)
    np.testing.assert_allclose(
        np.asarray(dist), np.take_along_axis(d, want, -1).astype(np.float32), rtol=1e-5
    )
    assert (np.diff(np.asarray(dist), axis=-1) >= -1e-6).all(), "ascending order"
