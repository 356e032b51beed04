#!/usr/bin/env bash
# Multi-host training (replaces the reference's torch.distributed.launch,
# scripts/dist_train.sh). One process per HOST; the in-host device mesh is
# handled by jax — no process-per-chip launcher needed.
# usage: NUM_HOSTS=2 HOST_ID=0 COORDINATOR=host0:1234 \
#        bash scripts/dist_train.sh <config> <exp_name> [extra args...]
set -e
CFG=$1; EXP=$2; shift 2
export JAX_COORDINATOR_ADDRESS=${COORDINATOR:?set COORDINATOR=host:port}
export JAX_NUM_PROCESSES=${NUM_HOSTS:?set NUM_HOSTS}
export JAX_PROCESS_ID=${HOST_ID:?set HOST_ID}
python main.py --config "$CFG" --exp_name "$EXP" "$@"
