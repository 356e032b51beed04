"""Batched validation (--val_bs) must reproduce the bs=1 reference protocol.

validate() at bs>1 switches to per-SAMPLE metric rows
(Runner.eval_step_per_sample) so per-taxonomy attribution stays exact; the
overall mean-of-category-means must match the bs=1 path to float-
reassociation tolerance (per-sample reductions are mathematically identical,
only the fusion grouping differs). A ragged final batch (8 samples at bs=3)
exercises the shape-change recompile path.
"""

import types

import numpy as np

from imgadapointr_tpu.datasets.loader import DataLoader
from imgadapointr_tpu.datasets.synthetic import SyntheticPCN
from imgadapointr_tpu.tools.runner import Runner, validate
from imgadapointr_tpu.utils.config import AttrDict


def _tiny_config():
    model = AttrDict(
        {
            "NAME": "AdaPoinTr", "num_query": 16, "num_points": 256,
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
        }
    )
    return AttrDict({"model": model, "consider_metric": "CDL1"})


def _val_loader(bs):
    ds = SyntheticPCN(
        AttrDict(
            {
                "N_POINTS": 256, "N_PARTIAL": 128, "LENGTH": 8,
                "others": {"subset": "val"},
            }
        )
    )
    return DataLoader(
        ds, batch_size=bs, shuffle=False, drop_last=False, num_workers=2
    )


def test_batched_validate_matches_bs1():
    config = _tiny_config()
    runner = Runner(types.SimpleNamespace(tp=1), config)
    _, _, example = next(iter(_val_loader(1)))
    state = runner.init_state(example)
    state = runner.shard_state(
        {"params": state["params"], "batch_stats": state["batch_stats"]}
    )
    args = types.SimpleNamespace()

    res1 = validate(runner, state, _val_loader(1), 0, None, args, config)
    res3 = validate(runner, state, _val_loader(3), 0, None, args, config)

    v1 = np.array(list(res1.state_dict().values()))
    v3 = np.array(list(res3.state_dict().values()))
    np.testing.assert_allclose(v3, v1, rtol=3e-5, atol=1e-6)


def test_batched_testnet_matches_bs1():
    """test() at --val_bs>1 (per-sample rows incl. the reference Metrics
    four-tuple and per-sample EMD) must reproduce the bs=1 protocol table
    to float-reassociation tolerance."""
    from imgadapointr_tpu.tools.runner import test as test_protocol

    config = _tiny_config()
    config["dataset"] = AttrDict(
        {"test": AttrDict({"NAME": "SyntheticPCN", "N_POINTS": 256})}
    )
    runner = Runner(types.SimpleNamespace(tp=1), config)
    _, _, example = next(iter(_val_loader(1)))
    state = runner.init_state(example)
    state = runner.shard_state(
        {"params": state["params"], "batch_stats": state["batch_stats"]}
    )
    args = types.SimpleNamespace(emd=True)

    r1 = test_protocol(runner, state, _val_loader(1), args, config)
    r3 = test_protocol(runner, state, _val_loader(3), args, config)

    for k in r1:
        np.testing.assert_allclose(r3[k], r1[k], rtol=3e-4, atol=1e-5)
