#!/usr/bin/env bash
# Single-host training (reference scripts/train.sh).
# usage: bash scripts/train.sh <config> <exp_name> [extra args...]
set -e
CFG=$1; EXP=$2; shift 2
python main.py --config "$CFG" --exp_name "$EXP" "$@"
