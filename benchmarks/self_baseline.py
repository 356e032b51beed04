"""Re-measure the pre-Pallas self-baseline under the PIPELINED protocol.

Round-3 verdict Weak 3: ``bench.py``'s ``SELF_BASELINE_COMPLETIONS_PER_S``
was the round-1 measurement (214/s, old per-step-fetch protocol) plus a
modeled +35 ms tunnel-RTT correction (→ ~280/s).  This script removes the
modeled step: it exports the repo at commit ``ca027fb`` (pure-XLA ops,
before any Pallas kernel) to a temp dir via ``git archive``, runs the
CURRENT pipelined steady-state protocol (dispatch N chained steps, fence
once — bench.py's bench_eval) against that tree's package on the real
chip, and prints the measured number to paste into bench.py.

Usage (real TPU, nothing else on the chip):
    python benchmarks/self_baseline.py [--commit ca027fb]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r'''
import sys, time, json
sys.path.insert(0, sys.argv[1])  # the exported OLD tree — its package wins
import jax, jax.numpy as jnp

from imgadapointr_tpu.models import AdaPoinTrBase
from imgadapointr_tpu.utils.config import AttrDict

BATCH, N_PARTIAL, N_OUT, WARMUP, ITERS = 32, 2048, 8192, 3, 20
cfg = AttrDict({
    "NAME": "AdaPoinTr", "num_query": 512, "num_points": N_OUT,
    "center_num": [512, 256], "global_feature_dim": 1024,
    "encoder_type": "graph", "decoder_type": "fc",
    "encoder_config": {"embed_dim": 384, "depth": 6, "num_heads": 6, "k": 8,
        "n_group": 2, "mlp_ratio": 2.0,
        "block_style_list": ["attn-graph"] + ["attn"] * 5,
        "combine_style": "concat"},
    "decoder_config": {"embed_dim": 384, "depth": 8, "num_heads": 6, "k": 8,
        "n_group": 2, "mlp_ratio": 2.0,
        "self_attn_block_style_list": ["attn-graph"] + ["attn"] * 7,
        "self_attn_combine_style": "concat",
        "cross_attn_block_style_list": ["attn-graph"] + ["attn"] * 7,
        "cross_attn_combine_style": "concat"},
})
model = AdaPoinTrBase(cfg)
key = jax.random.PRNGKey(0)
xyz = jax.random.normal(key, (BATCH, N_PARTIAL, 3), jnp.float32)
t0 = time.time()
variables = jax.jit(
    lambda k, x: model.init({"params": k, "noise": k}, x, train=False)
)(key, xyz)
# pipelined steady-state protocol — identical to the current bench.py
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
print(json.dumps({
    "metric": "self_baseline_completions_per_s",
    "value": round(BATCH / dt, 1),
    "step_ms": round(dt * 1e3, 2),
    "batch": BATCH,
    "compile_s": round(compile_s, 1),
    "protocol": "pipelined (chained dispatch, fence once)",
}))
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", default="ca027fb")
    args = ap.parse_args()
    with tempfile.TemporaryDirectory(prefix="selfbase_") as td:
        tree = os.path.join(td, "tree")
        os.makedirs(tree)
        subprocess.run(
            f"git -C {REPO} archive {args.commit} | tar -x -C {tree}",
            shell=True, check=True,
        )
        drv = os.path.join(td, "driver.py")
        with open(drv, "w") as f:
            f.write(DRIVER)
        t0 = time.time()
        subprocess.run([sys.executable, drv, tree], check=True, cwd=td)
        print(json.dumps({"total_wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
