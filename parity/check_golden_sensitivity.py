"""One-time sensitivity check for the COMPACT parity goldens (round 4).

Verifies the digest-based goldens (tests/golden_compact.py) still DETECT
the drift classes the round-3 full-tensor harness caught, by injecting each
drift and asserting the corresponding check fails:

1. torch clip epsilon ``max_norm/(norm+1e-6)`` dropped (plain optax clip)
   → the fp64 SGD digest must fail (linear path, ~1e-7 signal vs 1e-9 tol).
2. weight decay leaking into zero-grad (DDP find_unused) params
   → the optimizer digests' exact-zero-update invariant must fail.
3. an f32 leak in the fp64 optimizer path (grads round-tripped through f32)
   → both fp64 digests must fail (~1e-8 signal vs 1e-9/3e-8 tol).
4. a 1% localized backward drift on a single gradient block
   → the gradient digests (sample/l2/maxabs per block) must fail.

Usage:  python parity/check_golden_sensitivity.py
Runs standalone (no torch / reference needed — consumes the frozen golden
exactly as CI does).  Documented in parity/PARITY.md.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

CONFIG = os.path.join(REPO, "cfgs", "PCN_models", "AdaPoinTr-tiny.yaml")
GOLDEN = os.path.join(REPO, "tests", "goldens", "adapointr_tiny_grad.npz")


def expect_fail(name, fn):
    try:
        fn()
    except AssertionError as e:
        msg = str(e).splitlines()[0][:100]
        print(f"  [DETECTED] {name}: {msg}")
        return True
    print(f"  [MISSED]   {name}: drift injected but checks stayed green")
    return False


def main():
    from imgadapointr_tpu.tools import builder
    from tests.golden_compact import build_env, check_grads, check_optimizer

    print("== building CI env (regenerated params, our grads) ==")
    env = build_env(CONFIG, "adapointr", GOLDEN)
    ok = True

    print("== baseline: all checks green ==")
    check_grads(env)
    check_optimizer(env, "model")
    check_optimizer(env, "sgd")
    print("  [OK] baseline green")

    # 1. clip epsilon dropped ------------------------------------------------
    orig_clip = builder._clip_by_global_norm_torch

    def no_eps_clip(max_norm, eps=1e-6):
        return orig_clip(max_norm, eps=0.0)

    builder._clip_by_global_norm_torch = no_eps_clip
    try:
        ok &= expect_fail(
            "clip epsilon dropped (optax-style clip)",
            lambda: check_optimizer(env, "sgd"),
        )
    finally:
        builder._clip_by_global_norm_torch = orig_clip

    # 2. decay leaks into zero-grad params ----------------------------------
    orig_markers = builder.ZERO_GRAD_PARAM_MARKERS
    builder.ZERO_GRAD_PARAM_MARKERS = ()
    try:
        ok &= expect_fail(
            "weight decay on find_unused (zero-grad) params",
            lambda: check_optimizer(env, "model"),
        )
    finally:
        builder.ZERO_GRAD_PARAM_MARKERS = orig_markers

    # 3. f32 leak in the fp64 optimizer path --------------------------------
    # (the grads themselves are f32-representable by construction, so round
    # an INTERNAL computation instead — the global clip norm, the same kind
    # of internal-cast leak the round-3 fp64 harness caught)
    def leaky_clip(max_norm, eps=1e-6):
        import jax.numpy as jnp
        import optax

        def init_fn(params):
            del params
            return optax.EmptyState()

        def update_fn(updates, state, params=None):
            del params
            g_norm = optax.global_norm(
                jax.tree.map(lambda u: u.astype(jnp.float32), updates)
            ).astype(jnp.result_type(float))
            coef = jnp.minimum(max_norm / (g_norm + eps), 1.0)
            return jax.tree.map(lambda u: u * coef, updates), state

        return optax.GradientTransformation(init_fn, update_fn)

    builder._clip_by_global_norm_torch = leaky_clip
    try:
        ok &= expect_fail(
            "f32 leak in fp64 optimizer path (clip norm in f32)",
            lambda: check_optimizer(env, "sgd"),
        )
    finally:
        builder._clip_by_global_norm_torch = orig_clip

    # 4. 1% localized backward drift ----------------------------------------
    import copy

    env2 = dict(env)
    env2["grads"] = copy.deepcopy(env["grads"])

    def scale_one_block(tree):
        # first non-zero-marker leaf in sorted order gets ×1.01
        from tests.golden_compact import _flat

        flat = _flat(tree)
        for k in sorted(flat):
            path = "/".join(k)
            if "query_ranking" in path or np.abs(np.asarray(flat[k])).max() == 0:
                continue
            node = tree
            for p in k[:-1]:
                node = node[p]
            node[k[-1]] = np.asarray(node[k[-1]]) * 1.01
            return path

    drifted = scale_one_block(env2["grads"])
    ok &= expect_fail(
        f"1% gradient drift on one block ({drifted})",
        lambda: check_grads(env2),
    )

    # 5. SPARSE drift confined to off-sample-grid elements ------------------
    # (round-5 ADVICE case): sign-flip a handful of elements that sit OFF
    # the strided sample grid and are not the block max — maxabs and l2 are
    # untouched by sign flips, the sample misses them, so only the signed
    # checksum can see it. Requires the cks component in the golden.
    import copy as _copy

    env3 = dict(env)
    env3["grads"] = _copy.deepcopy(env["grads"])

    def flip_offgrid(tree):
        from parity.param_source import SAMPLE_K, sample_indices
        from tests.golden_compact import _flat

        flat_tree = _flat(tree)
        for k in sorted(flat_tree):
            path = "/".join(k)
            a = np.asarray(flat_tree[k])
            if "query_ranking" in path or a.size < 4 * SAMPLE_K:
                continue
            flat = a.ravel().copy()
            grid = set(sample_indices(flat.size, SAMPLE_K).tolist())
            # off-grid, nonzero, not the block max
            mx = np.abs(flat).max()
            hit = [
                i for i in range(1, flat.size, 7)
                if i not in grid and flat[i] != 0 and abs(flat[i]) < 0.9 * mx
            ][:5]
            if len(hit) < 3:
                continue
            flat[hit] = -flat[hit]
            node = tree
            for p in k[:-1]:
                node = node[p]
            node[k[-1]] = flat.reshape(a.shape)
            return path, len(hit)
        raise RuntimeError("no suitable block for the sparse-drift case")

    from parity.param_source import read_digest_tree

    has_cks = any(
        dig[3] is not None
        for dig in read_digest_tree(env["data"], "gdig").values()
    )
    if has_cks:
        spath, nflip = flip_offgrid(env3["grads"])
        ok &= expect_fail(
            f"sparse off-grid sign flips ({nflip} elems of {spath})",
            lambda: check_grads(env3),
        )
    else:
        print(
            "  [SKIPPED]  sparse off-grid sign flips: golden predates the "
            "checksum digest component — regenerate (parity/PARITY.md) to "
            "arm this case"
        )

    print("SENSITIVITY " + ("OK — all injected drifts detected" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
