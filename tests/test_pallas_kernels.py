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


def test_three_nn_interpolate_fused_interpret():
    """Fused 3-NN interp kernel vs the XLA chain: identical selection,
    f32-level outputs, and the custom VJP reproduces the feats gradient."""
    from imgadapointr_tpu.ops.pallas.nn_distance import three_nn_interpolate_pallas
    from imgadapointr_tpu.ops import pointops as po

    rng = np.random.RandomState(1)
    B, S, M, C = 2, 257, 65, 50
    unknown = jnp.asarray(rng.randn(B, S, 3), jnp.float32)
    known = jnp.asarray(rng.randn(B, M, 3), jnp.float32)
    feats = jnp.asarray(rng.randn(B, M, C), jnp.float32)

    d_ref, i_ref = po.three_nn(unknown, known)
    recip = 1.0 / (d_ref + 1e-8)
    w_ref = recip / recip.sum(-1, keepdims=True)
    want = po.three_interpolate(feats, i_ref, w_ref)

    with pltpu.force_tpu_interpret_mode():
        got, idx, w = three_nn_interpolate_pallas(unknown, known, feats)
    assert float((idx == i_ref).mean()) == 1.0
    # diff-form (kernel) vs matmul-form HIGHEST (XLA) distances differ
    # in the last f32 bits; sqrt/recip amplifies to ~2e-5 on the weights
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-4)
    rel = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert rel < 1e-4

    def loss_ref(f):
        return jnp.sum(jnp.sin(po.three_interpolate(f, i_ref, w_ref)))

    def loss_fused(f):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(jnp.sin(po._three_nn_interpolate_fused(unknown, known, f, 1e-8)))

    ga = jax.grad(loss_ref)(feats)
    gb = jax.grad(loss_fused)(feats)
    assert float(jnp.abs(ga - gb).max() / jnp.abs(ga).max()) < 1e-4


def test_mxu_eval_selection_interpret():
    """MXU eval kernel (opt-in path): selection within the documented band
    of the exact argmin on dense clouds; padded shapes handled."""
    from imgadapointr_tpu.ops.pallas.nn_distance import nn_argmin_bidir_mxu

    rng = np.random.RandomState(2)
    v = rng.randn(2, 300, 3).astype(np.float32)
    x = jnp.asarray(0.5 * v / np.linalg.norm(v, axis=-1, keepdims=True))
    v2 = rng.randn(2, 420, 3).astype(np.float32)
    y = jnp.asarray(0.5 * v2 / np.linalg.norm(v2, axis=-1, keepdims=True))
    with pltpu.force_tpu_interpret_mode():
        i1, i2 = nn_argmin_bidir_mxu(x, y)
    i1_ref, d1_ref = brute_nn(np.asarray(x, np.float64), np.asarray(y, np.float64))
    # selected distance within the band even when the index differs
    g = np.take_along_axis(np.asarray(y, np.float64), np.asarray(i1)[..., None], 1)
    d_sel = ((np.asarray(x, np.float64) - g) ** 2).sum(-1)
    assert float(np.abs(np.sqrt(d_sel) - np.sqrt(d1_ref)).max()) < 2e-3


@pytest.mark.parametrize(
    "B,M,C,S",
    [(2, 300, 8, 700), (1, 2048, 3, 1000), (2, 512, 64, 513), (1, 129, 100, 64)],
)
def test_gather_rows_interpret(B, M, C, S):
    """Pallas row gather is a pure permutation: bit-identical to
    take_along_axis across padding regimes (M, C, S all non-multiples)."""
    from imgadapointr_tpu.ops.pallas.gather_rows import gather_rows_pallas

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(B, M, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, M, (B, S)), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = gather_rows_pallas(table, idx)
    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_gather_rows_wide_channels_fall_back_to_xla():
    """Direct gather_rows_pallas calls with C > MAX_C in the probe regime
    (M <= MAX_M) must take the XLA fallback: the (Mp, Cp) table block plus
    the (Cp, Mp) scratch would blow Mosaic's 16 MB scoped VMEM. No interpret
    context here — reaching a pallas_call on CPU would fail loudly."""
    from imgadapointr_tpu.ops.pallas.gather_rows import MAX_C, gather_rows_pallas

    rng = np.random.RandomState(3)
    table = jnp.asarray(rng.randn(1, 256, MAX_C + 72), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 256, (1, 64)), jnp.int32)
    out = gather_rows_pallas(table, idx)
    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_gather_rows_grad_matches_xla():
    """Custom-VJP scatter-add == XLA take_along_axis backward, bit-level
    (duplicate indices accumulate identically)."""
    from imgadapointr_tpu.ops.pallas.gather_rows import gather_rows_pallas

    rng = np.random.RandomState(1)
    table = jnp.asarray(rng.randn(2, 160, 5), jnp.float32)
    # duplicates on purpose
    idx = jnp.asarray(rng.randint(0, 40, (2, 300)), jnp.int32)
    ct = jnp.asarray(rng.randn(2, 300, 5), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(lambda t: gather_rows_pallas(t, idx), table)
        (dt,) = vjp(ct)
    _, vjp_x = jax.vjp(
        lambda t: jnp.take_along_axis(t, idx[..., None], axis=1), table
    )
    (dt_x,) = vjp_x(ct)
    np.testing.assert_array_equal(np.asarray(dt), np.asarray(dt_x))


def test_index_points_gate_is_cpu_off():
    """On CPU the dispatcher must stay on the XLA path (the kernel needs a
    real TPU); the gate is also explicitly opt-out via env."""
    from imgadapointr_tpu.ops.pointops import _use_pallas_gather

    pts = jnp.zeros((16, 2048, 8), jnp.float32)
    idx = jnp.zeros((16, 2048, 16), jnp.int32)
    assert jax.default_backend() != "tpu"
    assert not _use_pallas_gather(pts, idx)


@pytest.mark.parametrize(
    "B,M,C,S",
    [(1, 8192, 3, 1024), (2, 5000, 5, 513), (1, 4200, 8, 300)],
)
def test_gather_rows_hilo_interpret(B, M, C, S):
    """The two-level hi/lo kernel (M > 4096 regime) is also a pure
    permutation: bit-identical to take_along_axis."""
    from imgadapointr_tpu.ops.pallas.gather_rows import _fwd_impl_hilo

    rng = np.random.RandomState(2)
    table = jnp.asarray(rng.randn(B, M, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, M, (B, S)), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = _fwd_impl_hilo(table, idx)
    want = jnp.take_along_axis(table, idx[..., None], axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


@pytest.mark.parametrize(
    "B,M,C,S,idx_hi",
    [
        (1, 1024, 3, 512, 1024),  # mostly unique indices
        (1, 600, 5, 513, 16),  # heavy collisions: ~32 adds per row
        (2, 256, 8, 128, 256),
    ],
)
def test_scatter_add_rows_interpret(B, M, C, S, idx_hi):
    """MXU one-hot scatter == XLA scatter-add to f32 rounding (exact
    per-contribution products; only accumulation order differs)."""
    from imgadapointr_tpu.ops.pallas.scatter_rows import scatter_add_rows_pallas

    rng = np.random.RandomState(3)
    vals = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    idx = jnp.asarray(rng.randint(0, idx_hi, (B, S)), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = scatter_add_rows_pallas(M, idx, vals)
    want = jax.vmap(lambda i, v: jnp.zeros((M, C)).at[i].add(v))(idx, vals)
    d = float(jnp.abs(out - want).max())
    scale = max(float(jnp.abs(want).max()), 1e-9)
    assert d / scale < 1e-6, f"rel err {d / scale:.2e}"


def test_scatter_gate_is_cpu_off():
    """chamfer._scatter_add_rows stays on the XLA path on CPU, so the
    frozen fp64/fp32 gradient goldens keep their bit-level meaning."""
    from imgadapointr_tpu.ops.chamfer import _scatter_add_rows

    idx = jnp.zeros((16, 16384), jnp.int32)
    vals = jnp.ones((16, 16384, 3), jnp.float32)
    assert jax.default_backend() != "tpu"
    out = _scatter_add_rows(16384, idx, vals)
    assert float(out[0, 0, 0]) == 16384.0  # all rows land on index 0


@pytest.mark.parametrize("M", [300, 8192])  # probe regime + hi/lo regime
def test_gather_rows_oob_clamps_like_xla(M):
    """Out-of-range indices CLAMP into [0, M-1] (XLA gather semantics) in
    both kernel regimes — not zero rows — and the backward scatter lands
    the OOB cotangent on the clamped row, matching take_along_axis's VJP."""
    from imgadapointr_tpu.ops.pallas.gather_rows import gather_rows_pallas

    rng = np.random.RandomState(7)
    table = jnp.asarray(rng.randn(2, M, 3), jnp.float32)
    idx = jnp.asarray(
        np.stack(
            [
                np.array([-5, 0, M - 1, M, M + 100] + [1] * 123),
                rng.randint(-M, 2 * M, 128),
            ]
        ),
        jnp.int32,
    )
    ct = jnp.asarray(rng.randn(2, 128, 3), jnp.float32)

    def xla(t):
        return jnp.take_along_axis(
            t, jnp.clip(idx, 0, M - 1)[..., None], axis=1
        )

    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(lambda t: gather_rows_pallas(t, idx), table)
        (dt,) = vjp(ct)
    want, vjp_x = jax.vjp(xla, table)
    (dt_x,) = vjp_x(ct)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(dt), np.asarray(dt_x))
