"""Worker process for the 2-process jax.distributed tests.

Launched by tests/test_multiprocess.py (NOT collected by pytest):

    python tests/mp_worker.py <process_id> <num_procs> <port> <outdir> <mode>

Modes:
- ``loader``: iterate two epochs of a host-sharded DataLoader built through
  the real ``dataset_builder`` wiring; dump the sample ids each host saw.
- ``train``: 6 deterministic train steps over the global (2 procs × 2 local
  devices) mesh, checkpointing mid-run from process 0 only; dump losses.
- ``resume``: rebuild, restore the mid-run checkpoint, run the remaining 3
  steps; dump losses (must match the uninterrupted run step for step).

Covers what the reference's torch.distributed.launch path did in production
(scripts/dist_train.sh + tools/builder.py:90-167): per-rank input sharding,
rank-0-only checkpointing, and resume of replicated optimizer state.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np


def tiny_config():
    from imgadapointr_tpu.utils.config import AttrDict

    return AttrDict(
        {
            "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 5e-4}},
            "scheduler": {
                "type": "LambdaLR",
                "kwargs": {"decay_step": 2, "lr_decay": 0.9, "lowest_decay": 0.02},
            },
            "bnmscheduler": {
                "type": "Lambda",
                "kwargs": {"decay_step": 2, "bn_decay": 0.5, "bn_momentum": 0.9,
                           "lowest_decay": 0.01},
            },
            "max_epoch": 2,
            "grad_norm_clip": 10,
            "model": {
                "NAME": "AdaPoinTr", "num_query": 16, "num_points": 128,
                "center_num": [32, 16], "global_feature_dim": 64,
                "encoder_type": "graph", "decoder_type": "fc",
                "encoder_config": {
                    "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                    "n_group": 2, "mlp_ratio": 2.0,
                    "block_style_list": ["attn"], "combine_style": "concat",
                },
                "decoder_config": {
                    "embed_dim": 48, "depth": 1, "num_heads": 6, "k": 4,
                    "n_group": 2, "mlp_ratio": 2.0,
                    "self_attn_block_style_list": ["attn"],
                    "self_attn_combine_style": "concat",
                    "cross_attn_block_style_list": ["attn"],
                    "cross_attn_combine_style": "concat",
                },
            },
        }
    )


def make_batches(n_steps, bs=8):
    """Identical global batches on every process (device_put then shards)."""
    rng = np.random.default_rng(42)
    return [
        {
            "partial": rng.normal(size=(bs, 64, 3)).astype(np.float32),
            "gt": rng.normal(size=(bs, 128, 3)).astype(np.float32),
        }
        for _ in range(n_steps)
    ]


def run_loader(outdir, pid):
    import types

    from imgadapointr_tpu.tools.builder import dataset_builder
    from imgadapointr_tpu.utils.config import AttrDict

    cfg = AttrDict(
        {
            "NAME": "SyntheticPCN", "N_POINTS": 128, "N_PARTIAL": 64,
            "LENGTH": 9,  # odd: exercises the pad-to-equal-shards path
            # total bs 2 → per-host bs 1: no drop_last truncation, so the
            # coverage assert sees every index
            "others": {"subset": "train", "bs": 2},
        }
    )
    args = types.SimpleNamespace(seed=0, num_workers=2)
    _, loader = dataset_builder(args, cfg, None)
    out = {}
    for epoch in (0, 1):
        loader.set_epoch(epoch)
        seen = []
        for _, model_ids, _ in loader:
            seen.extend(model_ids)
        out[str(epoch)] = seen
    with open(os.path.join(outdir, f"loader_{pid}.json"), "w") as f:
        json.dump(out, f)


def run_train(outdir, pid, mode):
    import types

    from imgadapointr_tpu.tools.runner import Runner
    from imgadapointr_tpu.utils.checkpoint import (
        fetch_to_host,
        load_checkpoint,
        save_checkpoint,
    )

    cfg = tiny_config()
    args = types.SimpleNamespace(tp=1, seed=0)
    runner = Runner(args, cfg)
    batches = make_batches(6)

    state = runner.init_state(batches[0], seed=0)
    state = runner.make_train_state(state, steps_per_epoch=3)

    start_step = 0
    if mode == "resume":
        template = fetch_to_host(state)
        restored, meta = load_checkpoint(template, "ckpt-mid", outdir)
        state = runner.shard_state(restored)
        start_step = int(meta["epoch"])  # stashed the step index in 'epoch'

    losses = []
    for step in range(start_step, 6):
        rng = jax.random.fold_in(jax.random.PRNGKey(5), step)
        state, metrics = runner.train_step(state, batches[step], rng, step / 3.0)
        losses.append(float(metrics["total_loss"]))
        if mode == "train" and step == 2:
            save_checkpoint(state, None, None, 3, "ckpt-mid", outdir, None)
            # non-zero ranks must NOT write (reference: rank-0-only ckpt io)
            save_checkpoint(state, None, None, 3, f"ckpt-rogue-{pid}", outdir, None)

    with open(os.path.join(outdir, f"losses_{mode}_{pid}.json"), "w") as f:
        json.dump({"start": start_step, "losses": losses}, f)


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir, mode = sys.argv[4], sys.argv[5]
    jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs and jax.local_device_count() == 2

    if mode == "loader":
        run_loader(outdir, pid)
    else:
        run_train(outdir, pid, mode)
    # all processes must reach the end together (collectives are symmetric)
    print(f"WORKER_OK pid={pid} mode={mode}", flush=True)


if __name__ == "__main__":
    main()
