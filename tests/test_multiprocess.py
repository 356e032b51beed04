"""Real 2-process jax.distributed tests (CPU + gloo collectives).

The reference's production path was torch.distributed.launch with one
process per GPU (scripts/dist_train.sh); these tests launch the analog —
two coordinator-connected processes, 2 virtual devices each — and check:

- loader host-sharding: every sample seen exactly once per epoch across
  hosts (modulo the equal-shard pad), reshuffled between epochs;
- process-0-only checkpoint writes;
- save → restart → resume: step-for-step loss match vs the uninterrupted run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(mode, outdir, nprocs=2, timeout=420):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nprocs), str(port), outdir, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER_OK pid={i}" in out, out[-3000:]
    return outs


def test_two_process_loader_host_sharding(tmp_path):
    _launch("loader", str(tmp_path))
    shards = []
    for pid in range(2):
        with open(tmp_path / f"loader_{pid}.json") as f:
            shards.append(json.load(f))
    for epoch in ("0", "1"):
        a, b = shards[0][epoch], shards[1][epoch]
        # 9 samples over 2 hosts → 5 + 5 with exactly one pad duplicate
        assert len(a) == len(b)
        union = set(a) | set(b)
        assert len(union) == 9, "every sample must be seen at least once"
        dupes = len(a) + len(b) - 9
        assert dupes == 1, "equal-shard padding duplicates exactly one sample"
    assert shards[0]["0"] != shards[0]["1"], "set_epoch must reshuffle"


def test_two_process_train_checkpoint_resume(tmp_path):
    _launch("train", str(tmp_path))
    # rank-0-only checkpoint io
    assert (tmp_path / "ckpt-mid.ckpt").exists()
    assert (tmp_path / "ckpt-rogue-0.ckpt").exists()
    assert not (tmp_path / "ckpt-rogue-1.ckpt").exists()

    _launch("resume", str(tmp_path))

    runs = {}
    for mode in ("train", "resume"):
        for pid in range(2):
            with open(tmp_path / f"losses_{mode}_{pid}.json") as f:
                runs[(mode, pid)] = json.load(f)
    # both processes observe identical (replicated) losses
    np.testing.assert_allclose(
        runs[("train", 0)]["losses"], runs[("train", 1)]["losses"], rtol=0
    )
    assert runs[("resume", 0)]["start"] == 3
    # resumed steps 3..5 must reproduce the uninterrupted run step for step
    np.testing.assert_allclose(
        runs[("resume", 0)]["losses"],
        runs[("train", 0)]["losses"][3:],
        rtol=1e-6,
    )
