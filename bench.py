"""Benchmark: AdaPoinTr completions/sec/chip at 8192 output points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers anywhere (BASELINE.md);
``vs_baseline`` is measured against A100_EST_COMPLETIONS_PER_S, a documented
engineering estimate for the reference PyTorch AdaPoinTr eval path
(batch inference, fp16, 2048-pt partial → 8192-pt completion) on one A100.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Estimated reference throughput on A100 (the reference repo publishes no
# speed numbers; this anchors vs_baseline at a fixed, documented constant).
A100_EST_COMPLETIONS_PER_S = 150.0

BATCH = 64  # best-throughput batch on v5e (32: 395/s, 64: 434/s, 128: 412/s)
N_PARTIAL = 2048
N_OUT = 8192
WARMUP = 3
ITERS = 10


def model_config():
    from imgadapointr_tpu.utils.config import AttrDict

    # Flagship AdaPoinTr (cfgs/PCN_models/AdaPoinTr.yaml) with num_points
    # 8192 — the BASELINE.json bench point.
    return AttrDict(
        {
            "NAME": "AdaPoinTr",
            "num_query": 512,
            "num_points": N_OUT,
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


def main():
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
    n_chips = jax.local_device_count()

    # reduce on-device and fetch a scalar: block_until_ready alone does not
    # reliably fence execution over the remote-TPU tunnel
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    checksum = jax.jit(lambda v, x: fwd(v, x)[1].sum())
    coarse, fine = fwd(variables, xyz)
    jax.block_until_ready(fine)
    compile_s = time.time() - t0
    assert fine.shape == (BATCH, N_OUT, 3), fine.shape

    for _ in range(WARMUP):
        float(checksum(variables, xyz))
    t0 = time.time()
    for _ in range(ITERS):
        float(checksum(variables, xyz))
    dt = (time.time() - t0) / ITERS
    completions_per_s = BATCH / dt / max(n_chips, 1)

    print(
        json.dumps(
            {
                "metric": "adapointr_eval_completions_per_sec_per_chip_8192pts",
                "value": round(completions_per_s, 2),
                "unit": "completions/s/chip",
                "vs_baseline": round(completions_per_s / A100_EST_COMPLETIONS_PER_S, 3),
            }
        )
    )
    print(
        f"# batch={BATCH} step={dt*1000:.1f}ms compile={compile_s:.0f}s "
        f"chips={n_chips} backend={jax.default_backend()}",
        file=sys.stderr,
    )


def jnp_dtype():
    import jax.numpy as jnp

    return jnp.float32


if __name__ == "__main__":
    main()
