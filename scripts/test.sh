#!/usr/bin/env bash
# Evaluation (reference scripts/test.sh).
# usage: bash scripts/test.sh <config> <ckpt> [extra args...]
set -e
CFG=$1; CKPT=$2; shift 2
python main.py --test --config "$CFG" --ckpts "$CKPT" "$@"
