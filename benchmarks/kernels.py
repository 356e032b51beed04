"""Pallas-kernel parity + speed checks against the XLA reference paths.

Run on a real TPU: ``python benchmarks/kernels.py``. The unit-test suite runs
on CPU (tests/conftest.py) where the Pallas kernels don't dispatch, so this
script is the TPU-side correctness gate for ops/pallas/*.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, f, *a, iters=5):
    float(f(*a))
    float(f(*a))
    t = time.time()
    for _ in range(iters):
        float(f(*a))
    dt = (time.time() - t) / iters * 1000
    print(f"  {name}: {dt:.1f} ms")
    return dt


def main():
    assert jax.default_backend() == "tpu", "run this on the TPU"
    from imgadapointr_tpu.ops.pallas.fps import furthest_point_sample_pallas
    from imgadapointr_tpu.ops.pallas.nn_distance import (
        knn_pallas,
        nn_one_direction_pallas,
    )
    from imgadapointr_tpu.ops import pointops
    from imgadapointr_tpu import ops

    key = jax.random.PRNGKey(0)
    ok = True

    print("== FPS parity (vs XLA fori-loop reference) ==")
    for B, N, S in [(2, 500, 16), (32, 2048, 512), (64, 16384, 2048)]:
        x = jax.random.normal(key, (B, N, 3))
        got = np.asarray(furthest_point_sample_pallas(x, S))
        # XLA reference path (bypass the TPU dispatch)
        import jax.numpy as _j

        xsq = _j.sum(x * x, -1)

        def body(i, st):
            mind, idxs, last = st
            lastp = _j.take_along_axis(x, last[:, None, None], axis=1)
            last_sq = _j.take_along_axis(xsq, last[:, None], axis=1)
            d = xsq - 2 * _j.einsum("bnc,bmc->bn", x, lastp,
                                    precision=jax.lax.Precision.HIGHEST) + last_sq
            mind = _j.minimum(mind, d)
            nxt = _j.argmax(mind, -1).astype(_j.int32)
            return mind, jax.lax.dynamic_update_index_in_dim(idxs, nxt, i, 1), nxt

        init = (_j.full((B, N), 1e10), _j.zeros((B, S), _j.int32), _j.zeros((B,), _j.int32))
        want = np.asarray(jax.jit(
            lambda x: jax.lax.fori_loop(1, S, body, init)[1]
        )(x))
        match = (got == want).mean()
        status = "OK" if match > 0.99 else "FAIL"
        ok &= match > 0.99
        print(f"  B={B} N={N} S={S}: match={match:.4f} [{status}] (ties may swap)")

    print("== kNN / chamfer parity ==")
    x = jax.random.normal(key, (2, 700, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 900, 3))
    d, i = nn_one_direction_pallas(x, y)
    dm = pointops.square_distance(x, y)
    derr = float(jnp.abs(d - dm.min(-1)).max())
    imatch = float((i == jnp.argmin(dm, -1)).mean())
    print(f"  chamfer dir: derr={derr:.2e} idx={imatch:.4f}")
    ok &= derr < 1e-4 and imatch == 1.0

    dk, ik = knn_pallas(8, y, x)
    _, want = jax.lax.top_k(-pointops.square_distance(x, y), 8)
    km = float((ik == want).mean())
    print(f"  knn k=8: idx match={km:.4f}")
    ok &= km == 1.0

    print("== speed ==")
    x = jax.random.normal(key, (32, 2048, 3))
    timeit("fps 2048->512 B32 (pallas)", jax.jit(lambda x: jnp.sum(ops.fps(x, 512))), x)
    timeit("knn k16 2048 B32 (pallas)", jax.jit(lambda x: jnp.sum(ops.knn_point(16, x, x))), x)
    xg = jax.random.normal(key, (64, 16384, 3))
    yg = jax.random.normal(key, (64, 16384, 3))
    timeit("chamfer_l1 64x16384^2 fwd (pallas)", jax.jit(lambda a, b: ops.chamfer_l1(a, b)), xg, yg)

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
