"""Benchmark: AdaPoinTr completions/sec/chip at 8192 output points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} —
the extra keys report the train-step throughput at the paper recipe
(bs 16, 2048 -> 16384, fwd+bwd+AdamW) and the repo's own pre-Pallas
self-baseline, so the headline never rests on a single number.

``vs_baseline`` anchor derivation (the reference publishes no throughput
numbers anywhere — BASELINE.md): the eval forward is 34.6 GFLOP/completion
(XLA cost analysis of this repo's jitted graph, batch 1, 2048->8192; the
reference computes the same network). The reference torch path runs eager
fp32 with per-op CUDA kernel launches, CUDA pointops (FPS/kNN/gather) and
small (<=384-wide) matmuls; point-transformer eval paths of this family
sustain low single-digit percent of an A100's 156 TFLOP/s tf32 peak. At an
effective ~5.2 TFLOP/s (3.3% of peak — generous for an unfused eval loop)
that is 150 completions/s: A100_EST_COMPLETIONS_PER_S. The independently
*measured* self-baseline (this repo before its Pallas kernels, same chip)
anchors ``vs_baseline``: 230.7/s, re-measured round 4 by running commit
ca027fb's tree under THIS pipelined protocol on the real chip
(benchmarks/self_baseline.py) — no modeled correction remains (the round-3
number derived ~280/s from the old 214/s per-step-fetch measurement plus
a modeled +35 ms RTT; the direct measurement shows the old protocol cost
less than the full RTT — steps partially overlapped the fetch).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from imgadapointr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # timings below start after compile; cache only
# cuts the wait, it cannot affect the measured step rate

# Derived estimate for the reference eval path on A100 — see module
# docstring + benchmarks/RESULTS.md "Baseline derivation".
A100_EST_COMPLETIONS_PER_S = 150.0
# Measured on the same v5e chip at the same bench point, this repo at commit
# ca027fb (pure-XLA ops, before the Pallas FPS/kNN/chamfer kernels), under
# THIS pipelined protocol (benchmarks/self_baseline.py, round 4):
SELF_BASELINE_COMPLETIONS_PER_S = 230.7

BATCH = 32  # best-throughput batch on v5e under the pipelined protocol
# (32: 597/s, 64: 533/s, 128: 464/s — measured round 2)
N_PARTIAL = 2048
N_OUT = 8192
WARMUP = 3
ITERS = 20

TRAIN_BATCH = 16  # paper recipe: total_bs 16, 16384 gt points
TRAIN_N_OUT = 16384
TRAIN_ITERS = 20


def model_config(n_out=N_OUT):
    from imgadapointr_tpu.utils.config import AttrDict

    # Flagship AdaPoinTr (cfgs/PCN_models/AdaPoinTr.yaml) with num_points
    # 8192 — the BASELINE.json bench point.
    return AttrDict(
        {
            "NAME": "AdaPoinTr",
            "num_query": 512,
            "num_points": n_out,
            "center_num": [512, 256],
            "global_feature_dim": 1024,
            "encoder_type": "graph",
            "decoder_type": "fc",
            "encoder_config": {
                "embed_dim": 384, "depth": 6, "num_heads": 6, "k": 8,
                "n_group": 2, "mlp_ratio": 2.0,
                "block_style_list": ["attn-graph"] + ["attn"] * 5,
                "combine_style": "concat",
            },
            "decoder_config": {
                "embed_dim": 384, "depth": 8, "num_heads": 6, "k": 8,
                "n_group": 2, "mlp_ratio": 2.0,
                "self_attn_block_style_list": ["attn-graph"] + ["attn"] * 7,
                "self_attn_combine_style": "concat",
                "cross_attn_block_style_list": ["attn-graph"] + ["attn"] * 7,
                "cross_attn_combine_style": "concat",
            },
        }
    )


def bench_eval():
    import jax

    from imgadapointr_tpu.models import AdaPoinTrBase

    cfg = model_config()
    model = AdaPoinTrBase(cfg)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (BATCH, N_PARTIAL, 3), jnp_dtype())

    t0 = time.time()
    variables = jax.jit(
        lambda k, x: model.init({"params": k, "noise": k}, x, train=False)
    )(key, xyz)

    # Pipelined steady-state protocol: dispatch ITERS steps chained through
    # an on-device scalar accumulator, fence ONCE at the end. A per-step
    # float() fetch adds a ~35 ms host round-trip over the remote-TPU
    # tunnel (measured: trivial scalar fetch = 35.6 ms) that a production
    # training/serving loop never pays — the device executes dispatched
    # steps back to back.
    import jax.numpy as jnp

    step = jax.jit(lambda v, x, s: s + model.apply(v, x, train=False)[1].sum())
    acc = step(variables, xyz, jnp.float32(0))
    jax.block_until_ready(acc)
    compile_s = time.time() - t0
    for _ in range(WARMUP):
        acc = step(variables, xyz, acc)
    float(acc)
    t0 = time.time()
    acc = jnp.float32(0)
    for _ in range(ITERS):
        acc = step(variables, xyz, acc)
    float(acc)
    dt = (time.time() - t0) / ITERS
    return BATCH / dt, dt, compile_s


def bench_train(cfg=None, iters=TRAIN_ITERS, want_hbm=True):
    """Full train step at the paper recipe: fwd + loss + bwd + AdamW.

    ``cfg`` defaults to the flagship AdaPoinTr; branch configs (image /
    superset) reuse the same protocol with their extra inputs built like
    the runner's batches."""
    import jax
    import jax.numpy as jnp
    import optax

    from imgadapointr_tpu.models.build import build_model_spec

    spec = build_model_spec(cfg if cfg is not None else model_config(TRAIN_N_OUT))
    key = jax.random.PRNGKey(0)
    batch_arrays = {
        "partial": jax.random.normal(key, (TRAIN_BATCH, N_PARTIAL, 3), jnp_dtype()),
        "gt": jax.random.normal(key, (TRAIN_BATCH, TRAIN_N_OUT, 3), jnp_dtype()),
    }
    if "img" in spec.inputs:
        batch_arrays["img"] = jax.random.uniform(
            key, (TRAIN_BATCH, 224, 224, 3), jnp_dtype()
        )
    if "cls_vec" in spec.inputs:
        batch_arrays["cls_vec"] = (
            jnp.zeros((TRAIN_BATCH, 16), jnp_dtype()).at[:, 0].set(1.0)
        )
    inputs = [batch_arrays[k] for k in spec.inputs]
    gt = batch_arrays["gt"]

    variables = jax.jit(
        lambda k, *i: spec.module.init(
            {"params": k, "noise": k, "dropout": k}, *i, train=True
        )
    )(key, *inputs)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-4))
    opt_state = jax.jit(tx.init)(variables["params"])

    def step(params, opt_state, batch_stats, inputs, gt):
        def loss_fn(p):
            ret, upd = spec.module.apply(
                {"params": p, "batch_stats": batch_stats}, *inputs, train=True,
                rngs={"noise": key, "dropout": key}, mutable=["batch_stats"],
            )
            s, d = spec.loss_fn(ret, gt, jnp.asarray(0.0))
            return s + d, upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, new_bs, loss

    jstep = jax.jit(step, donate_argnums=(0, 1, 2))
    t0 = time.time()
    params, opt_state, bs = variables["params"], opt_state, variables.get(
        "batch_stats", {}
    )
    params, opt_state, bs, loss = jstep(params, opt_state, bs, inputs, gt)
    float(loss)  # fence (compile + first run)
    compile_s = time.time() - t0
    for _ in range(2):
        params, opt_state, bs, loss = jstep(params, opt_state, bs, inputs, gt)
    float(loss)
    # steady state: steps chain through the donated state; fence once
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, bs, loss = jstep(params, opt_state, bs, inputs, gt)
    float(loss)
    dt = (time.time() - t0) / iters

    # peak-HBM observability: AOT-lower jstep ITSELF (identical jit cache
    # key as the timed executable — no retrace, no second remote compile)
    # and read XLA's memory analysis. Host-side metadata only — does not
    # touch the timed path above.
    peak_hbm_gb = None
    if not want_hbm:
        return dt, compile_s, None
    try:
        mem = (
            jstep.lower(params, opt_state, bs, inputs, gt)
            .compile()
            .memory_analysis()
        )
        if mem is not None:
            peak_hbm_gb = round(
                (
                    getattr(mem, "temp_size_in_bytes", 0)
                    + getattr(mem, "argument_size_in_bytes", 0)
                    + getattr(mem, "output_size_in_bytes", 0)
                    - getattr(mem, "alias_size_in_bytes", 0)
                )
                / 1e9,
                2,
            )
    except Exception:
        pass
    return dt, compile_s, peak_hbm_gb


def branch_config(name):
    """Paper-recipe branch model: the flagship core dims with the branch
    registry NAME (the shipped branch yamls keep the same core — fusion
    width is hardcoded 384 like the reference)."""
    cfg = model_config(TRAIN_N_OUT)
    cfg["NAME"] = name
    return cfg


def bench_branch_trains(start_time=None):
    """Train-step timings for the two branch families (VERDICT r4 item 8:
    BENCH_r*.json tracks the branch steps across rounds). Soft-fail: a
    branch measurement error degrades to absent keys, never a dead bench.
    A wall-clock budget ($IMGADAPOINTR_BENCH_BUDGET_S since bench start,
    default 1500 s) skips remaining branch rows when first-compiles run
    long — the headline rows must never be starved by optional ones."""
    out = {}
    budget = float(os.environ.get("IMGADAPOINTR_BENCH_BUDGET_S", 1500))
    t_start = start_time if start_time is not None else time.time()
    for key_name, name in (
        ("img_train_step_ms_bs16_16384", "ImgResNetEncAdaPoinTrVariableLoss"),
        ("superset_train_step_ms_bs16_16384", "ImgEncSegDecAdaPoinTrVariableLoss"),
    ):
        if time.time() - t_start > budget:
            print(
                f"# branch bench {name} skipped: over the "
                f"{budget:.0f}s bench budget (cold compiles; rerun to pick "
                "it up from the compile cache)",
                file=sys.stderr,
            )
            continue
        try:
            dt, compile_s, _ = bench_train(
                branch_config(name), iters=10, want_hbm=False
            )
            out[key_name] = round(dt * 1000, 1)
            print(
                f"# {name}: step={dt*1000:.1f}ms compile={compile_s:.0f}s",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover — perf observability only
            print(f"# branch bench {name} failed: {e}", file=sys.stderr)
    return out


def main():
    import jax

    n_chips = jax.local_device_count()
    t_start = time.time()
    eval_cps, eval_dt, eval_compile = bench_eval()
    train_dt, train_compile, peak_hbm_gb = bench_train()
    branch_rows = bench_branch_trains(start_time=t_start)
    completions_per_s = eval_cps / max(n_chips, 1)

    print(
        json.dumps(
            {
                "metric": "adapointr_eval_completions_per_sec_per_chip_8192pts",
                "value": round(completions_per_s, 2),
                "unit": "completions/s/chip",
                # vs_baseline is the MEASURED ratio vs this repo's own
                # pre-Pallas self-baseline (same chip, same bench point);
                # the modeled A100 anchor is demoted to vs_a100_model.
                "vs_baseline": round(
                    completions_per_s / SELF_BASELINE_COMPLETIONS_PER_S, 3
                ),
                "vs_a100_model": round(
                    completions_per_s / A100_EST_COMPLETIONS_PER_S, 3
                ),
                "train_step_ms_bs16_16384": round(train_dt * 1000, 1),
                "train_samples_per_s": round(TRAIN_BATCH / train_dt, 2),
                **(
                    {"train_peak_hbm_gb": peak_hbm_gb}
                    if peak_hbm_gb is not None
                    else {}
                ),
                **branch_rows,
            }
        )
    )
    print(
        f"# eval: batch={BATCH} step={eval_dt*1000:.1f}ms compile={eval_compile:.0f}s | "
        f"train: batch={TRAIN_BATCH} step={train_dt*1000:.1f}ms compile={train_compile:.0f}s | "
        f"chips={n_chips} backend={jax.default_backend()}",
        file=sys.stderr,
    )


def jnp_dtype():
    import jax.numpy as jnp

    return jnp.float32


if __name__ == "__main__":
    main()
