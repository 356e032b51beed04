"""Train-step profiler: capture a device trace and print the op breakdown.

The tracing story the reference lacks (SURVEY §5): runs N jitted train steps
of a config's model under ``jax.profiler.trace`` and summarises where the
step time goes — top ops by device time, plus a category rollup
(pallas custom-calls / gathers-scatters / matmul fusions / elementwise).

Usage (real TPU):
    python benchmarks/profile.py [--config cfgs/PCN_models/AdaPoinTr.yaml]
        [--batch 16] [--steps 5] [--top 25]
    python benchmarks/profile.py --eval --batch 32 --n_out 8192
        # breakdown of the eval forward at bench.py's headline point

This is how the round-2 perf work was targeted; see benchmarks/RESULTS.md.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_steps(config_path, batch, steps, trace_dir, n_out_override=None,
              aug="none"):
    from imgadapointr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file(config_path)
    if n_out_override:
        cfg.model.num_points = n_out_override
    spec = build_model_spec(cfg.model)
    key = jax.random.PRNGKey(0)
    n_out = int(cfg.model.get("num_points", 16384))
    batch_arrays = {
        "partial": jax.random.normal(key, (batch, 2048, 3), jnp.float32),
        "gt": jax.random.normal(jax.random.PRNGKey(1), (batch, n_out, 3), jnp.float32),
    }
    if "img" in spec.inputs:
        batch_arrays["img"] = jax.random.uniform(key, (batch, 224, 224, 3), jnp.float32)
    if "cls_vec" in spec.inputs:
        batch_arrays["cls_vec"] = jnp.zeros((batch, 16), jnp.float32).at[:, 0].set(1.0)
    inputs = [batch_arrays[k] for k in spec.inputs]

    variables = jax.jit(
        lambda k: spec.module.init(
            {"params": k, "noise": k, "dropout": k}, *inputs, train=True
        )
    )(key)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-4))
    opt_state = jax.jit(tx.init)(variables["params"])

    def step(params, opt_state, bstats):
        # in-step train augmentation, as the runner jits it (runner.py
        # _train_step): KITTI-cars finetune applies random_dropping to the
        # partial; ShapeNet-55 crops the partial out of the gt.
        step_inputs = list(inputs)
        if aug == "dropping":
            from imgadapointr_tpu.ops import random_dropping

            step_inputs[0] = random_dropping(
                key, batch_arrays["partial"], jnp.int32(0)
            )
        elif aug == "crop":
            from imgadapointr_tpu.ops import train_random_crop

            step_inputs[0] = train_random_crop(key, batch_arrays["gt"], n_out)

        def loss_fn(p):
            ret, upd = spec.module.apply(
                {"params": p, "batch_stats": bstats}, *step_inputs, train=True,
                rngs={"noise": key, "dropout": key}, mutable=["batch_stats"],
            )
            s, d = spec.loss_fn(ret, batch_arrays["gt"], jnp.asarray(0.0))
            return s + d, upd["batch_stats"]

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, nopt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nopt, nbs, loss

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    p, o, bs = variables["params"], opt_state, variables.get("batch_stats", {})
    p, o, bs, l = jstep(p, o, bs)
    float(l)  # compile + first run
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        p, o, bs, l = jstep(p, o, bs)
    float(l)
    jax.profiler.stop_trace()


def run_eval_steps(config_path, batch, steps, trace_dir, n_out_override=None):
    """Forward-only (train=False) steps at the serving/bench point, chained
    through an on-device accumulator like bench.py's pipelined protocol."""
    import jax
    import jax.numpy as jnp

    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    cfg = cfg_from_yaml_file(config_path)
    if n_out_override:
        cfg.model.num_points = n_out_override
    spec = build_model_spec(cfg.model)
    key = jax.random.PRNGKey(0)
    inputs = [jax.random.normal(key, (batch, 2048, 3), jnp.float32)]
    if "img" in spec.inputs:
        inputs.append(jax.random.uniform(key, (batch, 224, 224, 3), jnp.float32))
    if "cls_vec" in spec.inputs:
        inputs.append(jnp.zeros((batch, 16), jnp.float32).at[:, 0].set(1.0))

    variables = jax.jit(
        lambda k: spec.module.init({"params": k, "noise": k}, *inputs, train=False)
    )(key)
    # inputs as ARGUMENTS, not closure captures (constant-folding trap,
    # CLAUDE.md); accumulator chains the steps so the device never idles
    step = jax.jit(
        lambda v, s, *xs: s + spec.module.apply(v, *xs, train=False)[1].sum()
    )
    acc = step(variables, jnp.float32(0), *inputs)
    float(acc)  # compile + first run
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        acc = step(variables, acc, *inputs)
    float(acc)
    jax.profiler.stop_trace()


CATEGORIES = (
    ("pallas kernel", lambda n, a: "custom-call" in a.get("hlo_category", "")
     or "tpu_custom_call" in str(a)),
    ("gather/scatter fusion", lambda n, a: a.get("hlo_category") == "custom fusion"
     or "kCustom" in str(a)),
    ("convolution/dot", lambda n, a: "convolution" in a.get("hlo_category", "")
     or "dot" in a.get("hlo_category", "")),
    ("loop fusion / elementwise", lambda n, a: "fusion" in a.get("hlo_category", "")),
    ("sort", lambda n, a: n.startswith("sort")),
    ("while (fps)", lambda n, a: n.startswith("while")),
)


def summarize(trace_dir, steps, top):
    path = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                            recursive=True))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    args = {}
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e["name"]
        if name.startswith("jit_"):  # whole-step span
            dur["__step__"] += e.get("dur", 0)
            continue
        if name.isdigit():  # duplicate spans for pallas kernel instances
            continue
        dur[name] += e.get("dur", 0)
        args.setdefault(name, e.get("args", {}))

    step_ms = dur.pop("__step__", 0) / steps / 1000
    print(f"device step time: {step_ms:.1f} ms\n")
    print(f"{'ms/step':>8}  {'%':>5}  op")
    cat_ms = collections.Counter()
    for name, d in dur.most_common():
        ms = d / steps / 1000
        for cat, pred in CATEGORIES:
            if pred(name, args.get(name, {})):
                cat_ms[cat] += ms
                break
        else:
            cat_ms["other"] += ms
    for name, d in dur.most_common(top):
        ms = d / steps / 1000
        # the HLO signature (shapes + operands) identifies the op far
        # better than XLA's anonymous fusion.N names
        sig = str(args.get(name, {}).get("long_name", ""))
        sig = sig.split(" = ", 1)[-1][:100]
        print(f"{ms:8.2f}  {100*ms/max(step_ms,1e-9):5.1f}  {name[:28]:28s} {sig}")
    print("\ncategory rollup:")
    for cat, ms in cat_ms.most_common():
        print(f"{ms:8.2f}  {100*ms/max(step_ms,1e-9):5.1f}  {cat}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="cfgs/PCN_models/AdaPoinTr.yaml")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--eval", action="store_true",
                    help="profile the train=False forward (bench.py point)")
    ap.add_argument("--n_out", type=int, default=None,
                    help="override model.num_points (bench point: 8192)")
    ap.add_argument("--aug", default="none", choices=("none", "dropping", "crop"),
                    help="in-step train augmentation (KITTI finetune: dropping; "
                         "ShapeNet-55: crop)")
    args = ap.parse_args()

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="jaxprof_")
    if args.eval:
        run_eval_steps(args.config, args.batch, args.steps, trace_dir, args.n_out)
    else:
        run_steps(args.config, args.batch, args.steps, trace_dir, args.n_out,
                  args.aug)
    summarize(trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
