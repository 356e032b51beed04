"""Golden tests for gridding / gridding_reverse / cubic sampling / EMD."""

import jax
import jax.numpy as jnp
import numpy as np

from imgadapointr_tpu.ops import emd_auction
from imgadapointr_tpu.ops.gridding import (
    cubic_feature_sampling,
    gridding,
    gridding_distance,
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


def np_gridding_loss(pred, gt, scales, alphas):
    """Numpy reference of the full GriddingLoss semantics
    (extensions/gridding_loss/__init__.py:42-114 + gridding_distance.cu):
    joint dynamic bbox over both clouds and the batch (padded zeros
    included), per-sample zero-row strip, 8-corner-slot grids, L1 mean."""
    total = 0.0
    B = pred.shape[0]
    for scale, alpha in zip(scales, alphas):
        p = pred * scale / 2.0
        g = gt * scale / 2.0
        allpts = np.concatenate([p, g], axis=1)
        mn = np.floor(allpts.min(axis=(0, 1))) - 1
        mx = np.ceil(allpts.max(axis=(0, 1))) + 1
        lens = (mx - mn + 1).astype(int)
        nvert = int(np.prod(lens))

        def raster(cloud, raw):
            grid = np.zeros((B, nvert, 8), np.float64)
            for b in range(B):
                for i in range(cloud.shape[1]):
                    if np.abs(raw[b, i]).sum() == 0:
                        continue  # __init__.py:84-87 strips zero rows
                    pt = cloud[b, i]
                    lo = np.floor(pt).astype(int)
                    up = np.ceil(pt).astype(int)
                    up[up == lo] += 1  # gridding_distance.cu:54-68
                    slot = 0
                    for cx in (lo[0], up[0]):
                        for cy in (lo[1], up[1]):
                            for cz in (lo[2], up[2]):
                                w = (
                                    (1 - abs(pt[0] - cx))
                                    * (1 - abs(pt[1] - cy))
                                    * (1 - abs(pt[2] - cz))
                                )
                                ox, oy, oz = (
                                    cx - int(mn[0]), cy - int(mn[1]), cz - int(mn[2])
                                )
                                v = (ox * lens[1] + oy) * lens[2] + oz
                                grid[b, v, slot] += w
                                slot += 1
            return grid

        pg = raster(p, pred)
        gg = raster(g, gt)
        total += alpha * np.abs(pg - gg).mean()
    return total


def test_gridding_loss_matches_reference_dynamic_bbox():
    """Exact match vs the torch semantics, for clouds inside, straddling,
    and entirely OUTSIDE [-1,1] (the dynamic grid follows the cloud)."""
    rng = np.random.RandomState(3)
    base = (rng.rand(2, 24, 3) - 0.5).astype(np.float32)
    for shift, span in [(0.0, 2.0), (0.45, 2.0), (1.3, 4.0)]:
        pred = base + shift
        gt = (rng.rand(2, 40, 3).astype(np.float32) - 0.5) * 0.9 + shift
        got = 0.0
        for s, a in [(4, 0.7), (8, 0.3)]:
            pg, gg, n = gridding_distance(
                jnp.asarray(pred), jnp.asarray(gt), s, span=span
            )
            got += float(a * jnp.sum(jnp.abs(pg - gg)) / jnp.maximum(n, 1.0))
        want = np_gridding_loss(
            pred.astype(np.float64), gt.astype(np.float64), [4, 8], [0.7, 0.3]
        )
        np.testing.assert_allclose(got, want, rtol=2e-5, err_msg=f"shift={shift}")


def test_gridding_loss_zero_padded_rows_widen_bbox():
    """Padded zero rows are stripped from the scatter but still widen the
    reference bbox (min/max run before the strip) — the mean must match."""
    rng = np.random.RandomState(4)
    pred = rng.rand(1, 16, 3).astype(np.float32) * 0.4 + 0.5  # in [0.5, 0.9]
    pred[0, -4:] = 0.0  # padded rows pull the bbox down to the origin
    gt = rng.rand(1, 20, 3).astype(np.float32) * 0.4 + 0.5
    got = float(gridding_loss(pred, gt, [8], [1.0]))
    want = np_gridding_loss(pred.astype(np.float64), gt.astype(np.float64), [8], [1.0])
    np.testing.assert_allclose(got, want, rtol=2e-5)


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
