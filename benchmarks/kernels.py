"""Pallas-kernel parity + speed checks against the XLA reference paths.

Run on a real TPU: ``python benchmarks/kernels.py``. The unit-test suite runs
on CPU (tests/conftest.py) where the Pallas kernels don't dispatch, so this
script is the TPU-side correctness gate for ops/pallas/*.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imgadapointr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

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

    # small attn-graph shapes newly covered by the 2^16 gate (round 3):
    # the flagship decoder/encoder kNNs that previously ran sort-based
    # top_k. Diff-form (kernel) and matmul-form (XLA) may swap genuine fp32
    # near-ties, so any index mismatch must recompute (in f64) to the same
    # distance within an fp32-ulp band — same criterion as bidir-exact.
    for S, M in [(512, 512), (512, 256), (256, 512)]:
        xs = jax.random.normal(jax.random.PRNGKey(7), (32, S, 3))
        ys = jax.random.normal(jax.random.PRNGKey(8), (32, M, 3))
        _, iks = knn_pallas(8, ys, xs)
        _, wants = jax.lax.top_k(-pointops.square_distance(xs, ys), 8)
        kms = float((iks == wants).mean())
        xn = np.asarray(xs, np.float64)
        yn = np.asarray(ys, np.float64)
        gk = np.take_along_axis(yn[:, None], np.asarray(iks)[..., None], 2)
        gw = np.take_along_axis(yn[:, None], np.asarray(wants)[..., None], 2)
        d_k = ((xn[:, :, None] - gk) ** 2).sum(-1)
        d_w = ((xn[:, :, None] - gw) ** 2).sum(-1)
        tie_gap = float(np.abs(d_k - d_w).max())
        status = "OK" if (kms > 0.999 and tie_gap < 1e-5) else "FAIL"
        ok &= kms > 0.999 and tie_gap < 1e-5
        print(f"  knn k=8 {S}x{M} B32: idx match={kms:.6f} "
              f"tie-gap={tie_gap:.1e} [{status}]")

    print("== fused bidirectional argmin kernel (diff-form, exact selection) ==")
    from imgadapointr_tpu.ops.pallas.nn_distance import nn_argmin_bidir_exact

    # dense surface clouds — the regime where approximate selection broke
    # training (tiny NN spacings); diff-form selection must match the
    # scan-path argmin EXACTLY (identical arithmetic)
    def sphere(k, B, N):
        v = jax.random.normal(k, (B, N, 3))
        return 0.5 * v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    for (B, N, M), gen in [((4, 4096, 4096), sphere), ((2, 576, 4096), None)]:
        x = gen(key, B, N) if gen else jax.random.normal(key, (B, N, 3))
        y = (
            gen(jax.random.PRNGKey(2), B, M)
            if gen
            else jax.random.normal(jax.random.PRNGKey(2), (B, M, 3))
        )
        _, i1_ref = nn_one_direction_pallas(x, y)
        _, i2_ref = nn_one_direction_pallas(y, x)
        i1, i2 = nn_argmin_bidir_exact(x, y)
        xn, yn = np.asarray(x, np.float64), np.asarray(y, np.float64)

        def dsel(q, r, idx):
            g = np.take_along_axis(r, np.asarray(idx)[..., None], axis=1)
            return ((q - g) ** 2).sum(-1)

        # any mismatch must be an ulp-level tie of the two fp32 paths
        gap = max(
            float(np.abs(dsel(xn, yn, i1) - dsel(xn, yn, i1_ref)).max()),
            float(np.abs(dsel(yn, xn, i2) - dsel(yn, xn, i2_ref)).max()),
        )
        m = min(
            float((np.asarray(i1) == np.asarray(i1_ref)).mean()),
            float((np.asarray(i2) == np.asarray(i2_ref)).mean()),
        )
        status = "OK" if (m == 1.0 and gap == 0.0) else "FAIL"
        ok &= m == 1.0 and gap == 0.0
        print(
            f"  bidir-exact B={B} N={N} M={M} {'sphere' if gen else 'normal'}: "
            f"idx={m:.6f} gap={gap:.1e} [{status}]"
        )

    print("== MXU eval-selection kernel (OPT-IN eval path; measured round 3:")
    print("   only 1.16x vs exact — both kernels are VPU-bookkeeping-bound —")
    print("   so ops.nn_distance_eval defaults to EXACT selection) ==")
    from imgadapointr_tpu.ops.chamfer import nn_distance_eval
    from imgadapointr_tpu.ops.pallas.nn_distance import nn_argmin_bidir_mxu

    for B, N, M in [(4, 4096, 4096), (1, 8192, 16384)]:
        x = sphere(key, B, N)
        y = sphere(jax.random.PRNGKey(3), B, M)
        i1_ref, i2_ref = nn_argmin_bidir_exact(x, y)
        i1, i2 = nn_argmin_bidir_mxu(x, y)
        xn, yn = np.asarray(x, np.float64), np.asarray(y, np.float64)

        def dsel64(q, r, idx):
            g = np.take_along_axis(r, np.asarray(idx)[..., None], axis=1)
            return ((q - g) ** 2).sum(-1)

        # selection may differ, but only inside the documented band: the
        # SELECTED distance must be within ~2e-5 relative of the true min
        d1_got, d1_true = dsel64(xn, yn, i1), dsel64(xn, yn, i1_ref)
        d2_got, d2_true = dsel64(yn, xn, i2), dsel64(yn, xn, i2_ref)
        band = max(
            float(np.abs(np.sqrt(d1_got) - np.sqrt(d1_true)).max()),
            float(np.abs(np.sqrt(d2_got) - np.sqrt(d2_true)).max()),
        )
        # CD-L1-style mean over exact-recomputed selected distances: the
        # metric the band actually feeds
        cd_got = (np.sqrt(d1_got).mean() + np.sqrt(d2_got).mean()) / 2
        cd_true = (np.sqrt(d1_true).mean() + np.sqrt(d2_true).mean()) / 2
        cd_delta = abs(cd_got - cd_true) * 1000  # ×1000 display scale
        # measured band (round 3): sel ~4e-4..1.1e-3 sqrt-abs on dense unit
        # clouds; the x1000-CD delta (the metric the band feeds) stays <1e-3
        status = "OK" if (band < 2e-3 and cd_delta < 2e-3) else "FAIL"
        ok &= band < 2e-3 and cd_delta < 2e-3
        print(f"  mxu-eval B={B} N={N} M={M}: sel-band={band:.1e} "
              f"x1000-CD delta={cd_delta:.2e} [{status}]")

    # full eval entry: exact distance recompute from banded indices
    d1e, d2e, _, _ = nn_distance_eval(x, y)
    d1x, _ = nn_one_direction_pallas(x, y)
    rel = float(jnp.abs(jnp.sqrt(d1e) - jnp.sqrt(d1x)).max())
    print(f"  nn_distance_eval dist vs exact: max sqrt-delta {rel:.1e}")
    ok &= rel < 1e-4

    print("== fused 3-NN interpolate kernel (deformable attn / SnowFlakeNet) ==")
    from imgadapointr_tpu.ops.pallas.nn_distance import three_nn_interpolate_pallas
    from imgadapointr_tpu.ops.pointops import three_interpolate, three_nn

    # decoder deformable shapes: (B·g, N·k, 3) queries vs (B·g, M, 3)
    for B, S, M, C in [(32, 4608, 576, 192), (16, 2048, 512, 128)]:
        q = jax.random.normal(key, (B, S, 3))
        r = jax.random.normal(jax.random.PRNGKey(5), (B, M, 3))
        f = jax.random.normal(jax.random.PRNGKey(6), (B, M, C))
        d_ref, i_ref = three_nn(q, r)
        rec = 1.0 / (d_ref + 1e-8)
        w_ref = rec / jnp.sum(rec, -1, keepdims=True)
        want = three_interpolate(f, i_ref, w_ref)
        got, idx, _ = three_nn_interpolate_pallas(q, r, f)
        im = float((idx == i_ref).mean())
        rel = float(jnp.abs(got - want).max() / jnp.abs(want).max())
        status = "OK" if (im == 1.0 and rel < 1e-4) else "FAIL"
        ok &= im == 1.0 and rel < 1e-4
        print(f"  fused-interp B={B} S={S} M={M} C={C}: idx={im:.4f} "
              f"out-rel={rel:.1e} [{status}]")

    # identical clouds: selected distance must collapse to ~0 (exact
    # recompute path) — the bf16-sensitivity probe from CLAUDE.md
    xi = jax.random.normal(key, (2, 4096, 3))
    same = float(ops.chamfer_l1(xi, xi))
    print(f"  chamfer(identical) = {same:.1e}")
    ok &= same < 1e-5

    print("== Pallas row gather (lane-shuffle kernel, ops/pallas/gather_rows) ==")
    from imgadapointr_tpu.ops.pallas.gather_rows import gather_rows_pallas

    # the grouper/rebuild gather shapes; values AND grads must be
    # bit-identical to take_along_axis (pure permutation + same scatter-add)
    for B, M, C, S in [(32, 2048, 8, 32768), (16, 2048, 3, 32768),
                       (32, 512, 64, 8192), (16, 512, 3, 16384)]:
        tab = jax.random.normal(jax.random.PRNGKey(9), (B, M, C))
        gi = jax.random.randint(jax.random.PRNGKey(10), (B, S), 0, M)
        got = gather_rows_pallas(tab, gi)
        want = jnp.take_along_axis(tab, gi[..., None], axis=1)
        vmatch = bool(jnp.all(got == want))
        ct = jax.random.normal(jax.random.PRNGKey(11), got.shape)
        (dg,) = jax.vjp(lambda t: gather_rows_pallas(t, gi), tab)[1](ct)
        (dw,) = jax.vjp(
            lambda t: jnp.take_along_axis(t, gi[..., None], axis=1), tab
        )[1](ct)
        gmatch = bool(jnp.all(dg == dw))
        status = "OK" if (vmatch and gmatch) else "FAIL"
        ok &= vmatch and gmatch
        print(f"  gather B{B} M{M} C{C} S{S}: values={vmatch} grads={gmatch} [{status}]")

    print("== speed (pipelined: N dispatches, one fence — no tunnel RTT) ==")

    def piped(name, f, *args, iters=20):
        s = f(*args, jnp.float32(0))
        # fence warmup with a scalar fetch — block_until_ready does not
        # fence over the remote-TPU tunnel (CLAUDE.md)
        float(s)
        t = time.time()
        s = jnp.float32(0)
        for _ in range(iters):
            s = f(*args, s)
        float(s)
        print(f"  {name}: {(time.time() - t) / iters * 1000:.1f} ms")

    x = jax.random.normal(key, (32, 2048, 3))
    piped("fps 2048->512 B32 (pallas)", jax.jit(lambda x, s: s + jnp.sum(ops.fps(x, 512))), x)
    piped("knn k16 2048 B32 (pallas)", jax.jit(lambda x, s: s + jnp.sum(ops.knn_point(16, x, x)).astype(jnp.float32)), x)
    xs5 = jax.random.normal(key, (32, 512, 3))
    piped("knn k8 512x512 B32 (pallas, was sort)", jax.jit(lambda x, s: s + jnp.sum(ops.knn_point(8, x, x)).astype(jnp.float32)), xs5)
    piped("fps 512->256 B32 (pallas, was while)", jax.jit(lambda x, s: s + jnp.sum(ops.fps(x, 256))), xs5)
    xg = jax.random.normal(key, (64, 16384, 3))
    yg = jax.random.normal(key, (64, 16384, 3))
    piped("chamfer_l1 64x16384^2 fwd (pallas)", jax.jit(lambda a, b, s: s + ops.chamfer_l1(a, b)), xg, yg)
    xe = jax.random.normal(key, (16, 16384, 3))
    ye = jax.random.normal(key, (16, 16384, 3))
    piped(
        "nn_distance (exact, train) 16x16384^2",
        jax.jit(lambda a, b, s: s + jnp.sum(ops.nn_distance(a, b)[0])), xe, ye,
    )
    piped(
        "nn_distance_eval (MXU) 16x16384^2",
        jax.jit(lambda a, b, s: s + jnp.sum(ops.nn_distance_eval(a, b)[0])), xe, ye,
    )
    qd = jax.random.normal(key, (32, 4608, 3))
    rd = jax.random.normal(key, (32, 576, 3))
    fd = jax.random.normal(key, (32, 576, 192))

    def xla_interp(q, r, f, s):
        d, i = three_nn(q, r)
        rec = 1.0 / (d + 1e-8)
        w = rec / jnp.sum(rec, -1, keepdims=True)
        return s + jnp.sum(three_interpolate(f, i, w))

    piped("3nn-interp XLA chain 32x4608x576x192", jax.jit(xla_interp), qd, rd, fd)
    piped(
        "3nn-interp fused kernel 32x4608x576x192",
        jax.jit(lambda q, r, f, s: s + jnp.sum(three_nn_interpolate_pallas(q, r, f)[0])),
        qd, rd, fd,
    )
    tg = jax.random.normal(key, (32, 2048, 8))
    ig = jax.random.randint(key, (32, 32768), 0, 2048)
    piped(
        "row-gather XLA 32x(2048,8)x32768",
        jax.jit(lambda t, i, s: s + jnp.sum(jnp.take_along_axis(t, i[..., None], 1))),
        tg, ig,
    )
    piped(
        "row-gather pallas 32x(2048,8)x32768",
        jax.jit(lambda t, i, s: s + jnp.sum(gather_rows_pallas(t, i))),
        tg, ig,
    )

    # two-level hi/lo gather (M > 4096 regime — the chamfer residual
    # gathers): bit-exactness gate + speed vs XLA at the flagship shape
    th = jax.random.normal(key, (16, 16384, 3))
    ih = jax.random.randint(key, (16, 16384), 0, 16384)
    oh = np.asarray(jax.jit(gather_rows_pallas)(th, ih))
    oref = np.asarray(
        jax.jit(lambda t, i: jnp.take_along_axis(t, i[..., None], 1))(th, ih)
    )
    hilo_exact = np.array_equal(oh, oref)
    print(f"hi/lo gather 16x(16384,3)x16384 bit-exact: {hilo_exact}")
    ok &= hilo_exact
    piped(
        "row-gather XLA 16x(16384,3)x16384",
        jax.jit(lambda t, i, s: s + jnp.sum(jnp.take_along_axis(t, i[..., None], 1))),
        th, ih,
    )
    piped(
        "row-gather hi/lo pallas 16x(16384,3)x16384",
        jax.jit(lambda t, i, s: s + jnp.sum(gather_rows_pallas(t, i))),
        th, ih,
    )
    # bit-exactness across the rest of the hi/lo regime the dispatch gate
    # admits (hardware-validated round 3): G=64 tables from ShapeNet-55
    # (M=8192), non-128-multiple M (padding path), and the C=8 ceiling
    for (hb, hm, hc, hs) in [(16, 8192, 3, 8192), (4, 6000, 5, 4096),
                             (16, 12288, 8, 16384)]:
        t2 = jax.random.normal(key, (hb, hm, hc))
        i2 = jax.random.randint(key, (hb, hs), 0, hm)
        o2 = np.asarray(jax.jit(gather_rows_pallas)(t2, i2))
        r2 = np.asarray(
            jax.jit(lambda t, i: jnp.take_along_axis(t, i[..., None], 1))(t2, i2)
        )
        ex2 = np.array_equal(o2, r2)
        print(f"hi/lo gather {hb}x({hm},{hc})x{hs} bit-exact: {ex2}")
        ok &= ex2

    # MXU one-hot scatter-add (chamfer-VJP cross terms): f32-rounding
    # agreement gate (accumulation order differs by design) + speed
    from imgadapointr_tpu.ops.pallas.scatter_rows import scatter_add_rows_pallas

    vs = jax.random.normal(key, (16, 16384, 3))
    osc = np.asarray(jax.jit(lambda i, v: scatter_add_rows_pallas(16384, i, v))(ih, vs))
    xsc = np.asarray(
        jax.jit(
            jax.vmap(lambda i, v: jnp.zeros((16384, 3)).at[i].add(v))
        )(ih, vs)
    )
    srel = float(np.abs(osc - xsc).max() / max(np.abs(xsc).max(), 1e-9))
    print(f"scatter-add 16x16384->16384 rel err vs XLA: {srel:.2e}")
    ok &= srel < 1e-6
    # the ShapeNet-55 regime (n_rows=8192) — hardware-validated round 3
    i8 = jax.random.randint(key, (16, 16384), 0, 8192)
    o8 = np.asarray(jax.jit(lambda i, v: scatter_add_rows_pallas(8192, i, v))(i8, vs))
    x8 = np.asarray(
        jax.jit(jax.vmap(lambda i, v: jnp.zeros((8192, 3)).at[i].add(v)))(i8, vs)
    )
    s8 = float(np.abs(o8 - x8).max() / max(np.abs(x8).max(), 1e-9))
    print(f"scatter-add 16x16384->8192 rel err vs XLA: {s8:.2e}")
    ok &= s8 < 1e-6
    piped(
        "scatter-add XLA 16x16384->16384",
        jax.jit(lambda i, v, s: s + jnp.sum(
            jax.vmap(lambda ii, vv: jnp.zeros((16384, 3)).at[ii].add(vv))(i, v))),
        ih, vs,
    )
    piped(
        "scatter-add pallas 16x16384->16384",
        jax.jit(lambda i, v, s: s + jnp.sum(scatter_add_rows_pallas(16384, i, v))),
        ih, vs,
    )

    print("== EMD auction top-2 kernel (test-protocol shape 16384², 100 it) ==")
    from imgadapointr_tpu.ops.emd import _auction_batch

    ex = jax.random.uniform(key, (1, 16384, 3))
    ey = jax.random.uniform(jax.random.PRNGKey(7), (1, 16384, 3))

    def emd_of(use_pallas):
        def f(a, b, s):
            asn = _auction_batch(a, b, 0.005, 100, use_pallas=use_pallas)
            m = jnp.take_along_axis(b, asn[..., None], axis=1)
            d = jnp.sum((a - m) ** 2, axis=-1)
            return s + jnp.mean(jnp.sqrt(jnp.maximum(d, 0.0)))
        return jax.jit(f)

    vp = float(emd_of(True)(ex, ey, jnp.float32(0)))
    vx = float(emd_of(False)(ex, ey, jnp.float32(0)))
    erel = abs(vp - vx) / max(vx, 1e-9)
    print(f"EMD value pallas {vp*1000:.4f} vs xla {vx*1000:.4f} rel {erel:.2e}")
    # both are (eps, iterations)-bounded approximations whose per-point
    # assignment costs may differ by ~eps (= .005 on squared distances,
    # ~0.07 in sqrt units at these cloud scales — observed deltas are
    # ~1e-4): gate at 1% relative, far tighter than the 15%-of-Hungarian
    # test gate yet far outside fp noise
    ok &= erel < 1e-2
    piped("emd auction XLA 16384x16384 100it", emd_of(False), ex, ey, iters=3)
    piped("emd auction pallas 16384x16384 100it", emd_of(True), ex, ey, iters=3)

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
