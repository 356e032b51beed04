#!/bin/bash
# Self-preemption-aware training supervisor.
#
# Runs main.py with the given arguments; while it exits with code 75
# (tools/runner.RSS_RESTART_EXIT_CODE — the RSS watchdog checkpointed and
# self-preempted, see _rss_limit_gb for why), relaunches with --resume.
# The atomic ckpt-last + the persistent compile cache make each restart
# cost seconds. Any other exit code is final and propagated.
#
# Usage: bash scripts/train_loop.sh --config cfgs/.../X.yaml --exp_name run [...]
set -u
python main.py "$@"
code=$?
while [ "$code" -eq 75 ]; do
  echo "[train_loop] rss-watchdog restart: resuming" >&2
  python main.py "$@" --resume
  code=$?
done
exit "$code"
