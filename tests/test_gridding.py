"""Golden tests for gridding / gridding_reverse / cubic sampling / EMD."""

import jax
import jax.numpy as jnp
import numpy as np

from imgadapointr_tpu.ops import emd_auction
from imgadapointr_tpu.ops.gridding import (
    cubic_feature_sampling,
    gridding,
    gridding_loss,
    gridding_reverse,
)


def np_gridding(pts, scale):
    """Numpy reference of the CUDA gridding kernel semantics."""
    half = scale // 2
    B, N, _ = pts.shape
    grid = np.zeros((B, scale, scale, scale), np.float64)
    p = pts * half
    for b in range(B):
        for i in range(N):
            if np.abs(pts[b, i]).sum() == 0:
                continue
            x, y, z = p[b, i]
            lx, ly, lz = np.floor([x, y, z]).astype(int)
            for cx in (0, 1):
                for cy in (0, 1):
                    for cz in (0, 1):
                        vx, vy, vz = lx + cx, ly + cy, lz + cz
                        w = (
                            (1 - abs(x - vx)) * (1 - abs(y - vy)) * (1 - abs(z - vz))
                        )
                        ix, iy, iz = vx + half, vy + half, vz + half
                        if 0 <= ix < scale and 0 <= iy < scale and 0 <= iz < scale:
                            grid[b, ix, iy, iz] += w
    return grid


def test_gridding_matches_reference():
    rng = np.random.RandomState(0)
    pts = (rng.rand(2, 20, 3).astype(np.float32) - 0.5) * 1.6
    got = np.asarray(gridding(jnp.asarray(pts), 8))
    want = np_gridding(pts, 8)
    np.testing.assert_allclose(got, want, atol=1e-4)
    # total mass = N minus out-of-grid corner mass (boundary behaviour
    # matches the CUDA kernel's bounds check)
    np.testing.assert_allclose(got.sum((1, 2, 3)), want.sum((1, 2, 3)), rtol=1e-4)


def test_gridding_zero_rows_masked():
    pts = np.zeros((1, 5, 3), np.float32)
    pts[0, 0] = [0.3, -0.2, 0.1]
    got = np.asarray(gridding(jnp.asarray(pts), 8))
    np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-5)


def test_gridding_differentiable():
    pts = jnp.asarray([[[0.25, -0.1, 0.3]]])
    g = jax.grad(lambda p: jnp.sum(gridding(p, 8) ** 2))(pts)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_gridding_reverse_roundtrip_centroid():
    """A single unit-weight cell cluster maps back near its source point."""
    pts = jnp.asarray([[[0.25, 0.25, 0.25]]])
    grid = gridding(pts, 8)
    cloud = np.asarray(gridding_reverse(grid, 8))
    nz = cloud[0][np.abs(cloud[0]).sum(-1) > 0]
    assert len(nz) >= 1
    d = np.linalg.norm(nz - np.array([0.25, 0.25, 0.25]), axis=-1)
    assert d.min() < 0.3  # centroid lands within a cell of the source


def test_cubic_feature_sampling_gather():
    rng = np.random.RandomState(0)
    feats = rng.randn(1, 4, 4, 4, 5).astype(np.float32)
    # point at the exact center of cell (1,1,1)..(2,2,2) of a 4-grid:
    # scaled coords = p*2+2 = (1.5,1.5,1.5) → corners 1 and 2 per axis
    pts = np.full((1, 1, 3), -0.25, np.float32)
    out = np.asarray(
        cubic_feature_sampling(jnp.asarray(pts), jnp.asarray(feats), 1)
    )
    assert out.shape == (1, 1, 8, 5)
    want = feats[0, 1:3, 1:3, 1:3].reshape(8, 5)
    np.testing.assert_allclose(out[0, 0], want, atol=1e-6)


def test_cubic_feature_sampling_outside_grid_zero():
    feats = np.ones((1, 4, 4, 4, 2), np.float32)
    pts = np.full((1, 1, 3), 2.0, np.float32)  # far outside [-1,1]
    out = np.asarray(cubic_feature_sampling(jnp.asarray(pts), jnp.asarray(feats)))
    np.testing.assert_allclose(out, 0.0)


def test_gridding_loss_zero_for_identical():
    rng = np.random.RandomState(0)
    pts = jnp.asarray((rng.rand(1, 32, 3) - 0.5).astype(np.float32))
    l = float(gridding_loss(pts, pts, [8], [1.0]))
    assert abs(l) < 1e-6
    l2 = float(gridding_loss(pts, pts + 0.2, [8], [1.0]))
    assert l2 > 1e-4


class TestEMD:
    def test_identity_assignment(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
        dist, assign = emd_auction(x, x, eps=0.002, iterations=200)
        # matching a cloud with itself → near-zero cost
        assert float(jnp.mean(dist)) < 1e-3

    def test_permutation_recovery(self):
        rng = np.random.RandomState(1)
        x = rng.rand(1, 16, 3).astype(np.float32)
        perm = rng.permutation(16)
        y = x[:, perm]
        dist, assign = emd_auction(jnp.asarray(x), jnp.asarray(y), 0.001, 500)
        assert float(jnp.mean(dist)) < 1e-3  # recovered the permutation cost

    def test_gradient_only_xyz1(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 8, 3).astype(np.float32))
        y = jnp.asarray(rng.rand(1, 8, 3).astype(np.float32))

        def f(x, y):
            d, _ = emd_auction(x, y, 0.005, 50)
            return jnp.mean(d)

        gx, gy = jax.grad(f, argnums=(0, 1))(x, y)
        assert float(jnp.abs(gx).max()) > 0
        np.testing.assert_allclose(np.asarray(gy), 0.0)
