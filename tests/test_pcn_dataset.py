"""Real-data-path test: a miniature on-disk PCN dataset (PCN.json + pcd
tree) through the dataset class, loader, and transforms."""

import json
import os

import numpy as np
import pytest

from imgadapointr_tpu.datasets.loader import DataLoader
from imgadapointr_tpu.datasets.pcn_dataset import PCN, SegImgPCN
from imgadapointr_tpu.utils.config import AttrDict


def _write_pcd(path, pts):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(
            (
                "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                f"COUNT 1 1 1\nWIDTH {len(pts)}\nHEIGHT 1\n"
                f"POINTS {len(pts)}\nDATA binary\n"
            ).encode()
        )
        f.write(np.ascontiguousarray(pts, "<f4").tobytes())


@pytest.fixture(scope="module")
def mini_pcn(tmp_path_factory):
    """Two categories × two models, 2 renders each, on disk."""
    root = str(tmp_path_factory.mktemp("pcn"))
    rng = np.random.RandomState(0)
    cats = [
        {"taxonomy_id": "02691156", "taxonomy_name": "airplane",
         "train": ["m0", "m1"], "val": ["m0"], "test": ["m1"]},
        {"taxonomy_id": "03001627", "taxonomy_name": "chair",
         "train": ["c0", "c1"], "val": ["c0"], "test": ["c0"]},
    ]
    with open(os.path.join(root, "PCN.json"), "w") as f:
        json.dump(cats, f)
    for dc in cats:
        for subset in ("train", "val", "test"):
            for m in dc[subset]:
                n_r = 2 if subset == "train" else 1
                for r in range(n_r):
                    _write_pcd(
                        os.path.join(root, subset, "partial", dc["taxonomy_id"], m, f"{r:02d}.pcd"),
                        rng.randn(300, 3).astype(np.float32),
                    )
                _write_pcd(
                    os.path.join(root, subset, "complete", dc["taxonomy_id"], f"{m}.pcd"),
                    rng.randn(1024, 3).astype(np.float32),
                )
    return root


def _config(root, subset):
    return AttrDict(
        {
            "NAME": "PCN",
            "CATEGORY_FILE_PATH": os.path.join(root, "PCN.json"),
            "N_POINTS": 1024,
            "N_RENDERINGS": 2,
            "PARTIAL_POINTS_PATH": os.path.join(root, "%s/partial/%s/%s/%02d.pcd"),
            "COMPLETE_POINTS_PATH": os.path.join(root, "%s/complete/%s/%s.pcd"),
            "CARS": False,
            "others": {"subset": subset},
        }
    )


def test_pcn_dataset_reads_and_transforms(mini_pcn):
    ds = PCN(_config(mini_pcn, "train"))
    assert len(ds) == 4
    rng = np.random.default_rng(0)
    tax, model, data = ds.get(0, rng)
    assert tax == "02691156"
    assert data["partial"].shape == (2048, 3)  # RandomSamplePoints pads 300→2048
    assert data["gt"].shape == (1024, 3)
    # 300 real points, the rest zero-padded
    nonzero = (np.abs(data["partial"]).sum(-1) > 0).sum()
    assert nonzero == 300

    # train mirror: partial & gt get the SAME reflection per draw — check
    # statistically: for a fixed item, gt across draws is ±reflections of one base
    gts = [ds.get(0, np.random.default_rng(s))[2]["gt"] for s in range(6)]
    base = np.abs(gts[0])
    for g in gts[1:]:
        np.testing.assert_allclose(np.abs(g), base, atol=1e-5)


def test_pcn_eval_no_mirror(mini_pcn):
    ds = PCN(_config(mini_pcn, "val"))
    g1 = ds.get(0, np.random.default_rng(1))[2]["gt"]
    g2 = ds.get(0, np.random.default_rng(2))[2]["gt"]
    np.testing.assert_array_equal(g1, g2)  # eval gt deterministic


def test_cars_filter(mini_pcn):
    cfg = _config(mini_pcn, "train")
    cfg.CARS = True
    ds = PCN(cfg)
    assert len(ds) == 0  # no 02958343 in the mini dataset


def test_loader_collates_and_shards(mini_pcn):
    ds = PCN(_config(mini_pcn, "train"))
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=0)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 2
    tax, mid, batch = batches[0]
    assert batch["partial"].shape == (2, 2048, 3)
    assert batch["gt"].shape == (2, 1024, 3)
    # reshuffles per epoch
    loader.set_epoch(1)
    order2 = [m for _, m, _ in loader]
    assert len(order2) == 2

    # per-host sharding covers the dataset disjointly (up to padding)
    l0 = DataLoader(ds, 1, False, False, num_hosts=2, host_id=0)
    l1 = DataLoader(ds, 1, False, False, num_hosts=2, host_id=1)
    ids0 = [m[0] for _, m, _ in l0]
    ids1 = [m[0] for _, m, _ in l1]
    assert set(ids0).isdisjoint(set(ids1))


def test_process_workers_match_thread_workers(mini_pcn):
    """worker_mode='process' (fork workers, the torch-DataLoader analog)
    must produce batch-for-batch IDENTICAL output to the thread pool: the
    per-sample rng is keyed on (seed, epoch, dataset index), independent of
    which worker decodes it."""
    ds = PCN(_config(mini_pcn, "train"))

    def run(mode):
        loader = DataLoader(
            ds, batch_size=2, shuffle=True, drop_last=True, seed=3,
            num_workers=2, worker_mode=mode,
        )
        loader.set_epoch(1)
        return [
            (tid, mid, {k: v.copy() for k, v in batch.items()})
            for tid, mid, batch in loader
        ]

    a, b = run("thread"), run("process")
    assert len(a) == len(b) > 0
    for (ta, ma, ba), (tb, mb, bb) in zip(a, b):
        assert ta == tb and ma == mb
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


class _CorruptShardError(ValueError):
    """Module-level (picklable) so the exception type survives the
    worker→consumer relay across the forkserver boundary."""


class _CorruptPCN(PCN):
    """Module-level (picklable) dataset whose decode always fails IN the
    worker process — a closure-monkeypatched ``get`` would fail at pool
    spawn (unpicklable) and never exercise the in-worker relay path."""

    def get(self, idx, rng):
        raise _CorruptShardError(f"corrupt shard {idx}")


class _DieOncePCN(PCN):
    """Kills the first worker that touches it (hard os._exit — the
    BrokenProcessPool case), then behaves normally once the flag file is
    consumed."""

    def __init__(self, cfg, flag_path):
        super().__init__(cfg)
        self.flag_path = flag_path

    def get(self, idx, rng):
        if os.path.exists(self.flag_path):
            try:
                os.remove(self.flag_path)
            except FileNotFoundError:
                pass
            os._exit(1)
        return super().get(idx, rng)


def test_process_workers_surface_decode_errors(mini_pcn):
    """A corrupt shard must re-raise in the consumer with its ORIGINAL
    exception type (same contract as the thread mode / torch DataLoader's
    ExceptionWrapper), not hang or truncate the epoch."""
    ds = _CorruptPCN(_config(mini_pcn, "train"))
    loader = DataLoader(
        ds, batch_size=2, shuffle=False, drop_last=True,
        num_workers=2, worker_mode="process",
    )
    try:
        with pytest.raises(_CorruptShardError, match="corrupt shard"):
            list(loader)
    finally:
        loader.close()


def test_broken_pool_recreated_after_worker_death(mini_pcn, tmp_path):
    """A worker hard-death surfaces BrokenProcessPool AND drops the
    poisoned executor, so the next iteration builds a fresh pool and
    succeeds (the pool would otherwise stay broken forever)."""
    from concurrent.futures.process import BrokenProcessPool

    flag = str(tmp_path / "die-once")
    open(flag, "w").close()
    ds = _DieOncePCN(_config(mini_pcn, "train"), flag)
    loader = DataLoader(
        ds, batch_size=2, shuffle=False, drop_last=True,
        num_workers=2, worker_mode="process",
    )
    try:
        with pytest.raises(BrokenProcessPool):
            list(loader)
        assert loader._proc_pool is None  # poisoned pool dropped
        batches = list(loader)  # fresh pool over the same dataset
        assert batches
    finally:
        loader.close()
