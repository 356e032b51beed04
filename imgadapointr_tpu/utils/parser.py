"""CLI arg parsing (reference utils/parser.py:5-108, same public flags).

Inert compat flags (accepted so reference-style command lines run
unchanged, with a notice): --launcher/--local_rank/--sync_bn (process
topology is handled by jax.distributed + the mesh; cross-device batch stats
fall out of the sharded batch axis) and --deterministic (the reference's
cudnn-determinism toggle has no analog here — determinism IS the default:
seeded PRNG streams, deterministic XLA scatters everywhere the reference
raced atomicAdd, and an order-preserving loader with per-sample seeded
rng). Added: --tp (tensor-parallel width) and --synthetic (run on the
procedurally generated dataset when PCN data is absent).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True, help="yaml config file")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument(
        "--worker_mode", choices=["thread", "process"], default="thread",
        help="loader decode pool: 'thread' (GIL-releasing decode, default) "
        "or 'process' (fork workers, the torch-DataLoader analog — use on "
        "multi-core hosts where pure-Python decode time is the bottleneck)",
    )
    parser.add_argument("--seed", type=int, default=0, help="random seed")
    parser.add_argument("--exp_name", type=str, default="default", help="experiment name")
    parser.add_argument("--start_ckpts", type=str, default=None)
    parser.add_argument("--ckpts", type=str, default=None)
    parser.add_argument("--val_freq", type=int, default=1)
    parser.add_argument(
        "--save_freq", type=int, default=1,
        help="checkpoint every N epochs (default 1 = reference parity; a "
        "full-state device->host fetch costs ~60s over a remote-TPU "
        "tunnel at the 32M-param recipe, so raise this on such links — "
        "final-2 epochs and the RSS watchdog always checkpoint)",
    )
    parser.add_argument(
        "--val_bs",
        type=int,
        default=1,
        help="validation batch size (default 1 = reference protocol; "
        "higher values batch the val forward+metrics with exact per-sample "
        "attribution — a ragged final batch costs one extra jit compile)",
    )
    parser.add_argument("--resume", action="store_true", default=False)
    parser.add_argument("--test", action="store_true", default=False)
    parser.add_argument("--mode", choices=["easy", "median", "hard", None], default=None)
    parser.add_argument("--gdanet_w", type=str, default=None, help="frozen GDANet weights")
    parser.add_argument("--wandb", action="store_true", default=False)
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel width")
    parser.add_argument(
        "--sp", type=int, default=1,
        help="point-axis-parallel width: shards the train losses' O(B·N·M) "
        "chamfer over a 'points' mesh axis via the ppermute ring ops "
        "(ops/sharded.py); requires n_devices divisible by tp*sp and the "
        "cloud sizes divisible by sp",
    )
    parser.add_argument("--synthetic", action="store_true", help="use SyntheticPCN data")
    parser.add_argument("--syn_train_len", type=int, default=None,
                        help="--synthetic train-split length (default: "
                        "$SYN_TRAIN_LEN or 64; the convergence A/B harness "
                        "uses 2048 — benchmarks/RESULTS.md)")
    parser.add_argument("--no_emd", dest="emd", action="store_false", default=True)
    parser.add_argument("--profile", action="store_true",
                        help="write a jax.profiler trace of a few train steps")
    # inert reference-CLI compat flags (see module docstring): accepted so a
    # command line copied from the reference workflow runs unchanged
    parser.add_argument("--deterministic", action="store_true",
                        help="no-op: execution is already deterministic")
    parser.add_argument("--sync_bn", action="store_true",
                        help="no-op: batch stats sync over the mesh's data axis")
    parser.add_argument("--launcher", choices=["none", "pytorch"], default="none",
                        help="no-op: topology comes from jax.distributed")
    parser.add_argument("--local_rank", type=int, default=0,
                        help="no-op: topology comes from jax.distributed")
    args = parser.parse_args(argv)
    for flag, hit in (("--deterministic", args.deterministic),
                      ("--sync_bn", args.sync_bn),
                      ("--launcher", args.launcher != "none")):
        if hit:
            print(f"[parser] {flag} accepted for reference-CLI compatibility; "
                  "it has no effect here (see utils/parser.py docstring)")

    if args.test and args.resume:
        raise ValueError("--test and --resume cannot be both activated")
    if args.resume and args.start_ckpts is not None:
        raise ValueError("--resume and --start_ckpts cannot be both activated")
    if args.test and args.ckpts is None:
        print("[WARN] testing without --ckpts (random init)")

    stem = Path(args.config).stem
    parent = Path(args.config).parent.name
    args.experiment_path = os.path.join("./experiments", stem, parent, args.exp_name)
    args.tfboard_path = os.path.join("./experiments", stem, parent, "TFBoard", args.exp_name)
    args.log_name = stem
    create_experiment_dir(args)
    return args


def create_experiment_dir(args):
    os.makedirs(args.experiment_path, exist_ok=True)
    os.makedirs(args.tfboard_path, exist_ok=True)
