"""EMD auction profiler: device-time breakdown of the 100-iteration auction
at the test-protocol shape (16384², eps .005) — reuses profile.py's trace
summary. The auction is one jitted graph, so per-op totals aggregate over
all 100 scan iterations.

Usage (real TPU): python benchmarks/profile_emd.py [--iters 100] [--top 30]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile import summarize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--xla", action="store_true", help="profile the XLA top-2 path")
    ap.add_argument("--trained", action="store_true",
                    help="pred≈gt clouds (fast unassigned decay) instead of uniform")
    args = ap.parse_args()

    from imgadapointr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from imgadapointr_tpu.ops.emd import _auction_batch

    key = jax.random.PRNGKey(0)
    ex = jax.random.uniform(key, (1, 16384, 3))
    if args.trained:
        ey = ex + 0.01 * jax.random.normal(jax.random.PRNGKey(7), ex.shape)
    else:
        ey = jax.random.uniform(jax.random.PRNGKey(7), (1, 16384, 3))

    def f(a, b, s):
        asn = _auction_batch(a, b, 0.005, args.iters, use_pallas=not args.xla)
        m = jnp.take_along_axis(b, asn[..., None], axis=1)
        d = jnp.sum((a - m) ** 2, axis=-1)
        return s + jnp.mean(jnp.sqrt(jnp.maximum(d, 0.0)))

    jf = jax.jit(f)
    acc = jf(ex, ey, jnp.float32(0))
    float(acc)  # compile + first run
    trace_dir = tempfile.mkdtemp(prefix="jaxprof_emd_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        acc = jf(ex, ey, acc)
    float(acc)
    jax.profiler.stop_trace()
    summarize(trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
