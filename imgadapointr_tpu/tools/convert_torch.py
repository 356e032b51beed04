"""Torch→flax weight conversion for reference checkpoints.

Converts reference PyTorch state_dicts (ckpt-best.pth files from
mmkuznecov/ImgAdaPoinTr, or pretrained GDANet part-seg weights for
``--gdanet_w``) into this framework's parameter pytrees, for parity
validation and frozen-GDANet workflows.

Layout rules:
- Linear ``weight (out,in)``        → ``kernel (in,out)`` (transpose)
- Conv1d/2d 1×1 ``(out,in,1[,1])``  → ``kernel (in,out)``
- Conv2d k×k ``(out,in,kh,kw)``     → ``kernel (kh,kw,in,out)``
- Conv3d ``(out,in,kd,kh,kw)``      → ``kernel (kd,kh,kw,in,out)``
- Layer/Group/BatchNorm ``weight/bias`` → ``scale/bias``;
  BatchNorm ``running_mean/var``    → batch_stats ``mean/var``
- ConcatDense (this framework computes concat-then-dense as split per-part
  matmuls): a fused torch kernel row-splits into ``part0..partN`` by the
  declared part widths.

The mapping is rule-driven: a per-model table of (flax path regex → torch
key template). Unknown keys are reported (strict=False semantics, like the
reference's GDANet load at tools/runner.py:55-66).
"""

from __future__ import annotations

import re
from typing import Callable, Dict

import numpy as np


def t(w):
    return np.asarray(w).T


def conv1x1(w):
    w = np.asarray(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def convnd(w):
    w = np.asarray(w)  # (out, in, *spatial) → (*spatial, in, out)
    return np.transpose(w, tuple(range(2, w.ndim)) + (1, 0))


def split_rows(w, widths):
    """Split a fused torch Linear kernel (already transposed to (in, out))
    into ConcatDense part kernels by input-part widths."""
    out = []
    start = 0
    for width in widths:
        out.append(w[start : start + width])
        start += width
    assert start == w.shape[0], f"split widths {widths} != {w.shape[0]}"
    return out


def convert_gdanet(torch_state: Dict[str, np.ndarray]) -> dict:
    """Pretrained GDANet part-seg checkpoint → params/batch_stats for
    models/gdanet.GDANet (reference models/segmentation/GDANet_ptseg.py)."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(val)

    # conv blocks: reference convN = Sequential(Conv, BN) named convN.0 / bnN
    conv_bn = [
        ("conv1", "conv1.0", "bn1"), ("conv11", "conv11.0", "bn11"),
        ("conv12", "conv12.0", "bn12"), ("conv2", "conv2.0", "bn2"),
        ("conv21", "conv21.0", "bn21"), ("conv22", "conv22.0", "bn22"),
        ("conv3", "conv3.0", "bn3"), ("conv31", "conv31.0", "bn31"),
        ("conv32", "conv32.0", "bn32"), ("conv4", "conv4.0", "bn4"),
        ("convc", "convc.0", "bnc"), ("conv5", "conv5.0", "bn5"),
        ("conv6", "conv6.0", "bn6"), ("conv7", "conv7.0", "bn7"),
    ]
    missing = []
    for ours, tconv, tbn in conv_bn:
        try:
            put(params, (f"{ours}_conv", "kernel"), conv1x1(torch_state[f"{tconv}.weight"]))
            put(params, (f"{ours}_conv", "bias"), torch_state[f"{tconv}.bias"])
            put(params, (f"{ours}_bn", "scale"), torch_state[f"{tbn}.weight"])
            put(params, (f"{ours}_bn", "bias"), torch_state[f"{tbn}.bias"])
            put(stats, (f"{ours}_bn", "mean"), torch_state[f"{tbn}.running_mean"])
            put(stats, (f"{ours}_bn", "var"), torch_state[f"{tbn}.running_var"])
        except KeyError as e:
            missing.append(str(e))
    try:
        put(params, ("conv8", "kernel"), conv1x1(torch_state["conv8.weight"]))
        put(params, ("conv8", "bias"), torch_state["conv8.bias"])
    except KeyError as e:
        missing.append(str(e))

    for sg in ("SGCAM_1s", "SGCAM_1g", "SGCAM_2s", "SGCAM_2g"):
        try:
            put(params, (sg, "g", "kernel"), conv1x1(torch_state[f"{sg}.g.weight"]))
            put(params, (sg, "g", "bias"), torch_state[f"{sg}.g.bias"])
            put(params, (sg, "theta", "kernel"), conv1x1(torch_state[f"{sg}.theta.weight"]))
            put(params, (sg, "theta", "bias"), torch_state[f"{sg}.theta.bias"])
            put(params, (sg, "phi", "kernel"), conv1x1(torch_state[f"{sg}.phi.weight"]))
            put(params, (sg, "phi", "bias"), torch_state[f"{sg}.phi.bias"])
            put(params, (sg, "W_conv", "kernel"), conv1x1(torch_state[f"{sg}.W.0.weight"]))
            put(params, (sg, "W_conv", "bias"), torch_state[f"{sg}.W.0.bias"])
            put(params, (sg, "W_bn_scale"), torch_state[f"{sg}.W.1.weight"])
            put(params, (sg, "W_bn_bias"), torch_state[f"{sg}.W.1.bias"])
            put(stats, (sg, "W_bn_mean"), torch_state[f"{sg}.W.1.running_mean"])
            put(stats, (sg, "W_bn_var"), torch_state[f"{sg}.W.1.running_var"])
        except KeyError as e:
            missing.append(str(e))
    return {"params": params, "batch_stats": stats, "missing": missing}


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (CPU torch)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "base_model", "state_dict", "net"):
        if isinstance(raw, dict) and key in raw:
            raw = raw[key]
            break
    out = {}
    for k, v in raw.items():
        k = k.replace("module.", "")  # strip DDP prefix (builder.py:102)
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def load_gdanet_weights(path: str):
    """--gdanet_w entry point: torch GDANet checkpoint → (params, batch_stats)."""
    state = load_torch_state(path)
    result = convert_gdanet(state)
    if result["missing"]:
        print(f"[convert_torch] {len(result['missing'])} keys missing "
              f"(strict=False, like the reference): {result['missing'][:5]}...")
    return result["params"], result["batch_stats"]
