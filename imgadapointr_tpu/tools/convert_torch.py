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


def _put(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(val)


def convert_adapointr(
    torch_state: Dict[str, np.ndarray], config, prefix: tuple = ()
) -> dict:
    """Reference AdaPoinTr-family checkpoint → AdaPoinTrBase params/stats.

    Handles the point-only tree (models/external/AdaPoinTr.py): grouper,
    encoder/decoder block stacks (attn / graph / deform style tokens,
    'concat' combine), query machinery, and the fc rebuild head. Fused
    Linears over concats row-split into ConcatDense parts.

    ``prefix`` prepends a flax path to every output (the Img/Seg wrappers
    nest the AdaPoinTr core under ``core``). Use convert_img_adapointr for
    the full ImgResNetEncAdaPoinTrVariableLoss tree.

    Returns {"params", "batch_stats", "missing"}.
    """
    sd = torch_state
    params: dict = {}
    stats: dict = {}
    missing: list = []
    mapping: list = []  # (torch_key, transform, flax_path(s)) for round-trip tests

    def grab(key):
        if key not in sd:
            missing.append(key)
            return None
        return sd[key]

    def linear(tkey, fpath, bias=True):
        mapping.append((f"{tkey}.weight", "linear", fpath + ("kernel",)))
        w = grab(f"{tkey}.weight")
        if w is not None:
            _put(params, fpath + ("kernel",), t(w) if np.asarray(w).ndim == 2 else conv1x1(w))
        if bias:
            mapping.append((f"{tkey}.bias", "direct", fpath + ("bias",)))
            b = grab(f"{tkey}.bias")
            if b is not None:
                _put(params, fpath + ("bias",), b)

    def norm(tkey, fpath):
        mapping.append((f"{tkey}.weight", "direct", fpath + ("scale",)))
        mapping.append((f"{tkey}.bias", "direct", fpath + ("bias",)))
        w, b = grab(f"{tkey}.weight"), grab(f"{tkey}.bias")
        if w is not None:
            _put(params, fpath + ("scale",), w)
        if b is not None:
            _put(params, fpath + ("bias",), b)

    def bn(tkey, fpath):
        norm(tkey, fpath)
        mapping.append((f"{tkey}.running_mean", "direct:stats", fpath + ("mean",)))
        mapping.append((f"{tkey}.running_var", "direct:stats", fpath + ("var",)))
        m, v = grab(f"{tkey}.running_mean"), grab(f"{tkey}.running_var")
        if m is not None:
            _put(stats, fpath + ("mean",), m)
        if v is not None:
            _put(stats, fpath + ("var",), v)

    def concat_dense(tkey, fpath, widths, bias=True):
        mapping.append(
            (f"{tkey}.weight", f"split:{','.join(map(str, widths))}",
             tuple(fpath + (f"part{i}", "kernel") for i in range(len(widths))))
        )
        w = grab(f"{tkey}.weight")
        if w is not None:
            parts = split_rows(t(np.asarray(w)), widths)
            for i, part in enumerate(parts):
                _put(params, fpath + (f"part{i}", "kernel"), part)
        if bias:
            mapping.append((f"{tkey}.bias", "direct", fpath + ("part0", "bias")))
            b = grab(f"{tkey}.bias")
            if b is not None:
                _put(params, fpath + ("part0", "bias"), b)

    bm = prefix + ("base_model",)
    dim = int(config.encoder_config.embed_dim)
    gfd = int(config.global_feature_dim)

    # ---- grouper (DGCNN) ----
    linear("base_model.grouper.input_trans", bm + ("grouper", "input_trans"))
    for i in range(1, 5):
        linear(f"base_model.grouper.layer{i}.0", bm + ("grouper", f"layer{i}_conv"), bias=False)
        norm(f"base_model.grouper.layer{i}.1", bm + ("grouper", f"layer{i}_gn"))

    # ---- embeds / projections / query machinery ----
    for tk, names in (
        ("base_model.pos_embed", ("pos_embed1", "pos_embed2")),
        ("base_model.input_proj", ("input_proj1", "input_proj2")),
        ("base_model.increase_dim", ("increase_dim1", "increase_dim2")),
        ("base_model.coarse_pred", ("coarse_pred1", "coarse_pred2")),
    ):
        linear(f"{tk}.0", bm + (names[0],))
        linear(f"{tk}.2", bm + (names[1],))
    # mlp_query.0 is Linear(global+3, 1024) over cat([global, coarse])
    concat_dense("base_model.mlp_query.0", bm + ("mlp_query1",), [gfd, 3])
    linear("base_model.mlp_query.2", bm + ("mlp_query2",))
    linear("base_model.mlp_query.4", bm + ("mlp_query3",))
    for i, n in ((0, "query_ranking1"), (2, "query_ranking2"), (4, "query_ranking3")):
        linear(f"base_model.query_ranking.{i}", bm + (n,))
    if int(config.decoder_config.embed_dim) != dim:
        # mem_link = Linear(enc_dim, dec_dim) exists only when the widths
        # differ (reference AdaPoinTr.py:74-77; nn.Identity otherwise —
        # no torch keys, and the flax side skips the dense too)
        linear("base_model.mem_link", bm + ("mem_link",))

    # ---- transformer blocks ----
    qkv_bias = bool(config.encoder_config.get("qkv_bias", True))

    def attn_block(tprefix, fprefix, styles, is_decoder):
        def attention(tk, fp):
            linear(f"{tk}.qkv", fp + ("qkv",), bias=qkv_bias)
            linear(f"{tk}.proj", fp + ("proj",))

        def cross_attention(tk, fp):
            for m in ("q_map", "k_map", "v_map"):
                linear(f"{tk}.{m}", fp + (m,), bias=qkv_bias)
            linear(f"{tk}.proj", fp + ("proj",))

        def local(tk, fp, token):
            if token == "graph":
                linear(f"{tk}.knn_map.0", fp + ("knn_map",))
                return
            # deform family: q/k/v/v_off projections + offset MLP
            for m in ("proj_q", "proj_k", "proj_v", "proj_v_off"):
                if token != "deform_graph" or m == "proj_v_off":
                    linear(f"{tk}.{m}", fp + (m,), bias=qkv_bias)
            linear(f"{tk}.linear_offset.0", fp + ("linear_offset", "Dense_0"))
            norm(f"{tk}.linear_offset.1", fp + ("linear_offset", "LayerNorm_0"))
            linear(f"{tk}.linear_offset.3", fp + ("linear_offset", "Dense_1"), bias=False)
            if token == "deform_graph":
                linear(f"{tk}.knn_map.0", fp + ("knn_map",))
            else:
                linear(f"{tk}.proj", fp + ("proj",))

        if not is_decoder:
            style = styles
            norm(f"{tprefix}.norm1", fprefix + ("norm1",))
            norm(f"{tprefix}.norm2", fprefix + ("norm2",))
            if "attn" in style.split("-"):
                attention(f"{tprefix}.attn", fprefix + ("attn",))
            loc = next((s for s in style.split("-") if s != "attn"), None)
            if loc:
                local(f"{tprefix}.local_attn", fprefix + ("local_attn",), loc)
                linear(f"{tprefix}.merge_map", fprefix + ("merge_map",))
            linear(f"{tprefix}.mlp.fc1", fprefix + ("mlp", "fc1"))
            linear(f"{tprefix}.mlp.fc2", fprefix + ("mlp", "fc2"))
        else:
            sa, ca = styles
            for n in ("norm1", "norm2", "norm_q", "norm_v"):
                norm(f"{tprefix}.{n}", fprefix + (n,))
            if "attn" in sa.split("-"):
                attention(f"{tprefix}.self_attn", fprefix + ("self_attn",))
            sloc = next((s for s in sa.split("-") if s != "attn"), None)
            if sloc:
                local(f"{tprefix}.local_self_attn", fprefix + ("local_self_attn",), sloc)
                linear(f"{tprefix}.self_attn_merge_map", fprefix + ("self_attn_merge_map",))
            if "attn" in ca.split("-"):
                cross_attention(f"{tprefix}.cross_attn", fprefix + ("cross_attn",))
            cloc = next((s for s in ca.split("-") if s != "attn"), None)
            if cloc:
                local(f"{tprefix}.local_cross_attn", fprefix + ("local_cross_attn",), cloc)
                linear(f"{tprefix}.cross_attn_merge_map", fprefix + ("cross_attn_merge_map",))
            linear(f"{tprefix}.mlp.fc1", fprefix + ("mlp", "fc1"))
            linear(f"{tprefix}.mlp.fc2", fprefix + ("mlp", "fc2"))

    enc_styles = list(config.encoder_config.block_style_list)
    for i, style in enumerate(enc_styles):
        attn_block(
            f"base_model.encoder.blocks.blocks.{i}",
            bm + ("encoder", f"block{i}"), style, is_decoder=False,
        )
    # base_model.encoder.norm is a DEAD parameter in the reference (defined
    # but never applied, base_blocks.py:429-431) — intentionally skipped.

    sa_styles = list(config.decoder_config.self_attn_block_style_list)
    ca_styles = list(config.decoder_config.cross_attn_block_style_list)
    for i, (sa, ca) in enumerate(zip(sa_styles, ca_styles)):
        attn_block(
            f"base_model.decoder.blocks.blocks.{i}",
            bm + ("decoder", f"block{i}"), (sa, ca), is_decoder=True,
        )

    # ---- wrapper: increase_dim Conv-BN-Conv, reduce_map, rebuild head ----
    linear("increase_dim.0", prefix + ("increase_dim1",))
    bn("increase_dim.1", prefix + ("increase_dim_bn",))
    linear("increase_dim.3", prefix + ("increase_dim2",))
    trans_dim = int(config.decoder_config.embed_dim)
    concat_dense("reduce_map", prefix + ("reduce_map",), [1024, trans_dim, 3])
    if config.decoder_type == "fc":
        concat_dense("decode_head.layer.fc1", prefix + ("decode_head", "layer_fc1"),
                     [trans_dim, trans_dim])
        linear("decode_head.layer.fc2", prefix + ("decode_head", "layer_fc2"))
    return {"params": params, "batch_stats": stats, "missing": missing,
            "mapping": mapping}


def _convert_mha(sd, params, missing, tkey: str, fpath: tuple, fused: bool):
    """torch nn.MultiheadAttention → Attention (fused qkv) or CrossAttention
    (split q/k/v) parameters. in_proj_weight rows pack [q; k; v]."""
    w = sd.get(f"{tkey}.in_proj_weight")
    b = sd.get(f"{tkey}.in_proj_bias")
    if w is None:
        missing.append(f"{tkey}.in_proj_weight")
    else:
        if fused:
            _put(params, fpath + ("qkv", "kernel"), t(w))
            if b is not None:
                _put(params, fpath + ("qkv", "bias"), b)
        else:
            E = w.shape[1]
            for i, m in enumerate(("q_map", "k_map", "v_map")):
                _put(params, fpath + (m, "kernel"), t(w[i * E:(i + 1) * E]))
                if b is not None:
                    _put(params, fpath + (m, "bias"), b[i * E:(i + 1) * E])
    ow = sd.get(f"{tkey}.out_proj.weight")
    ob = sd.get(f"{tkey}.out_proj.bias")
    if ow is None:
        missing.append(f"{tkey}.out_proj.weight")
    else:
        _put(params, fpath + ("proj", "kernel"), t(ow))
        if ob is not None:
            _put(params, fpath + ("proj", "bias"), ob)


def _convert_fusion_stack(sd, params, missing, tprefix: str, tag: str, fpath: tuple):
    """The 5-layer MHA fusion stack (reference pctransformer.py:114-136):
    cross1 → self1 → cross2 → self2 → cross3 with post-LN after each."""
    pairs = [
        (f"cross_attn_{tag}1", ("cross1",), False),
        (f"self_attn_{tag}1", ("self1",), True),
        (f"cross_attn_{tag}2", ("cross2",), False),
        (f"self_attn_{tag}2", ("self2",), True),
        (f"cross_attn_{tag}3", ("cross3",), False),
    ]
    for tname, fname, fused in pairs:
        _convert_mha(sd, params, missing, f"{tprefix}.{tname}", fpath + fname, fused)
    for i in range(1, 6):
        w = sd.get(f"{tprefix}.layer_norm_{tag}{i}.weight")
        b = sd.get(f"{tprefix}.layer_norm_{tag}{i}.bias")
        if w is None:
            missing.append(f"{tprefix}.layer_norm_{tag}{i}.weight")
        else:
            _put(params, fpath + (f"ln{i}", "scale"), w)
            _put(params, fpath + (f"ln{i}", "bias"), b)


def _convert_resnet_trunk(sd, params, stats, missing, tprefix: str, fpath: tuple,
                          stage_sizes, num_stages: int):
    """torchvision ResNet Sequential(children()[:-3]) → _ResNetTrunk params.

    torch Sequential indices: 0 conv1, 1 bn1, 2 relu, 3 maxpool, 4.. layers.
    """

    def conv(tkey, fp):
        w = sd.get(f"{tkey}.weight")
        if w is None:
            missing.append(f"{tkey}.weight")
            return
        _put(params, fp + ("kernel",), convnd(w))

    def bn(tkey, fp):
        for tn, fn, tree in (
            ("weight", "scale", params), ("bias", "bias", params),
            ("running_mean", "mean", stats), ("running_var", "var", stats),
        ):
            v = sd.get(f"{tkey}.{tn}")
            if v is None:
                missing.append(f"{tkey}.{tn}")
            else:
                _put(tree, fp + (fn,), v)

    conv(f"{tprefix}.0", fpath + ("stem_conv",))
    bn(f"{tprefix}.1", fpath + ("stem_bn",))
    for s in range(num_stages):
        for b_i in range(stage_sizes[s]):
            tb = f"{tprefix}.{4 + s}.{b_i}"
            fb = fpath + (f"layer{s + 1}_{b_i}",)
            for cname in ("conv1", "conv2", "conv3"):
                if f"{tb}.{cname}.weight" in sd:
                    conv(f"{tb}.{cname}", fb + (cname.replace("conv", "conv"),))
                    bn(f"{tb}.{cname.replace('conv', 'bn')}", fb + (cname.replace("conv", "bn"),))
            if f"{tb}.downsample.0.weight" in sd:
                conv(f"{tb}.downsample.0", fb + ("down_conv",))
                bn(f"{tb}.downsample.1", fb + ("down_bn",))


def convert_img_adapointr(torch_state: Dict[str, np.ndarray], config) -> dict:
    """Reference ImgResNetEncAdaPoinTrVariableLoss checkpoint → the
    ImgAdaPoinTrModel tree: AdaPoinTr core under ``core``, ResNet18 trunk
    under ``im_encoder``, and the img fusion stack (get_better_img_size +
    5× MultiheadAttention + 5× LayerNorm, reference
    models/internal/pctransformer.py:85-136) under ``core/base_model/
    img_fusion``."""
    res = convert_adapointr(torch_state, config, prefix=("core",))
    params, stats, missing = res["params"], res["batch_stats"], res["missing"]
    sd = torch_state

    _convert_resnet_trunk(
        sd, params, stats, missing, "base_model.im_encoder.base",
        ("im_encoder", "trunk"), stage_sizes=(2, 2, 2, 2), num_stages=3,
    )
    fus = ("core", "base_model", "img_fusion")
    w = sd.get("base_model.get_better_img_size.0.weight")
    if w is None:
        missing.append("base_model.get_better_img_size.0.weight")
    else:
        _put(params, fus + ("proj", "kernel"), t(w))
        _put(params, fus + ("proj", "bias"),
             sd["base_model.get_better_img_size.0.bias"])
    _convert_fusion_stack(sd, params, missing, "base_model", "img",
                          fus + ("fusion",))
    return res


def convert_seg_adapointr(torch_state: Dict[str, np.ndarray], config,
                          with_img: bool = False) -> dict:
    """Reference SegEncAdaPoinTr / ImgEncSegDecAdaPoinTrVariableLoss →
    the Seg model trees: AdaPoinTr core under ``core``, frozen GDANet under
    ``segmentator``, seg fusion stack (get_better_seg_size + 5× MHA +
    5× LayerNorm) under ``core/base_model/seg_fusion``; with_img adds the
    ResNet18 + img fusion subtrees."""
    res = convert_adapointr(torch_state, config, prefix=("core",))
    params, stats, missing = res["params"], res["batch_stats"], res["missing"]
    sd = torch_state

    seg_sd = {
        k[len("base_model.segmentator."):]: v
        for k, v in sd.items()
        if k.startswith("base_model.segmentator.")
    }
    g = convert_gdanet(seg_sd)
    params["segmentator"] = g["params"]
    stats["segmentator"] = g["batch_stats"]
    missing.extend(f"base_model.segmentator.{m}" for m in g["missing"])

    fus = ("core", "base_model", "seg_fusion")
    w = sd.get("base_model.get_better_seg_size.0.weight")
    if w is None:
        missing.append("base_model.get_better_seg_size.0.weight")
    else:
        _put(params, fus + ("proj", "kernel"), t(w))
        _put(params, fus + ("proj", "bias"),
             sd["base_model.get_better_seg_size.0.bias"])
    _convert_fusion_stack(sd, params, missing, "base_model", "seg",
                          fus + ("fusion",))

    if with_img:
        _convert_resnet_trunk(
            sd, params, stats, missing, "base_model.im_encoder.base",
            ("im_encoder", "trunk"), stage_sizes=(2, 2, 2, 2), num_stages=3,
        )
        ifus = ("core", "base_model", "img_fusion")
        w = sd.get("base_model.get_better_img_size.0.weight")
        if w is None:
            missing.append("base_model.get_better_img_size.0.weight")
        else:
            _put(params, ifus + ("proj", "kernel"), t(w))
            _put(params, ifus + ("proj", "bias"),
                 sd["base_model.get_better_img_size.0.bias"])
        _convert_fusion_stack(sd, params, missing, "base_model", "img",
                              ifus + ("fusion",))
    return res


def export_adapointr_torch(params, batch_stats, config) -> Dict[str, np.ndarray]:
    """INVERSE conversion: flax AdaPoinTr tree → a reference-format torch
    state dict (models/external/AdaPoinTr.py layout).

    Lets a model trained here be loaded back into the reference stack
    (``torch.save({'base_model': {k: torch.tensor(v)}}, ...)``) for
    comparison or serving. Driven by the SAME declarative mapping the
    forward converter emits, inverting each transform: linear → ``.T``;
    ConcatDense row-splits → concatenate-then-``.T``; direct/stats →
    identity. Covers the point-only AdaPoinTr tree (the flagship); the
    img/seg extras (ResNet trunk, MHA fusion) have no inverse yet.
    """

    def leaf(tree, path):
        for p in path:
            tree = tree[p]
        return np.asarray(tree)

    probe = convert_adapointr({}, config)
    sd: Dict[str, np.ndarray] = {}
    for tkey, transform, fpaths in probe["mapping"]:
        if transform.startswith("split:"):
            parts = [leaf(params, p) for p in fpaths]
            sd[tkey] = np.concatenate(parts, axis=0).T.astype(np.float32)
        elif transform == "linear":
            w = leaf(params, fpaths)
            # torch Linear weight (out, in) = kernel.T; 1x1 convs were
            # flattened to (in, out) on the way in, same inverse
            sd[tkey] = w.T.astype(np.float32)
        elif transform == "direct:stats":
            sd[tkey] = leaf(batch_stats, fpaths).astype(np.float32)
        else:  # direct
            sd[tkey] = leaf(params, fpaths).astype(np.float32)

    # reference layers that are 1×1 Conv1d/Conv2d, not Linear: restore the
    # trailing kernel dims torch expects (validated by strict
    # load_state_dict into the real reference module in the tests)
    for tkey in list(sd):
        if tkey == "base_model.grouper.input_trans.weight" or tkey.startswith(
            "increase_dim."
        ) and tkey.endswith(".weight") and sd[tkey].ndim == 2:
            sd[tkey] = sd[tkey][..., None]  # Conv1d (out, in, 1)
        elif (
            tkey.startswith("base_model.grouper.layer")
            and tkey.endswith(".0.weight")
        ):
            sd[tkey] = sd[tkey][..., None, None]  # Conv2d (out, in, 1, 1)

    # reference-only leaves with no flax counterpart: the DEAD encoder norm
    # (defined but never applied — base_blocks.py:429-431, parity bug #1)
    # exported as identity, and BN bookkeeping
    enc_dim = int(config.encoder_config.embed_dim)
    sd["base_model.encoder.norm.weight"] = np.ones(enc_dim, np.float32)
    sd["base_model.encoder.norm.bias"] = np.zeros(enc_dim, np.float32)
    sd["increase_dim.1.num_batches_tracked"] = np.asarray(0, np.int64)
    return sd


def converter_for(name: str) -> Callable[..., dict]:
    """Model NAME → weight converter. Single source of truth for the
    name→converter mapping, shared by ``load_torch_checkpoint_into_state``
    (main.py --test / demo) and the parity harnesses
    (parity/run_parity{,_grad}.py) — they previously carried divergent
    copies and the serving path silently dropped the image branch of
    ImgEncSegDec checkpoints (with_img defaulted False)."""
    import functools

    if "Img" in name and "Seg" in name:  # ImgEncSegDecAdaPoinTrVariableLoss
        return functools.partial(convert_seg_adapointr, with_img=True)
    if "Seg" in name:  # SegEncAdaPoinTr
        return convert_seg_adapointr
    if "Img" in name:  # ImgResNetEncAdaPoinTrVariableLoss
        return convert_img_adapointr
    if "AdaPoinTr" in name:  # AdaPoinTr / AdaPoinTrVariableLoss
        return convert_adapointr
    # convert_adapointr would otherwise crash deep inside on an
    # AdaPoinTr-only config key (encoder_config.embed_dim) — fail loudly
    # at the dispatch boundary instead
    raise ValueError(
        f"no torch-checkpoint converter for model {name!r}: .pth loading "
        "supports the AdaPoinTr family only (AdaPoinTr, AdaPoinTrVariableLoss, "
        "ImgResNetEncAdaPoinTrVariableLoss, SegEncAdaPoinTr, "
        "ImgEncSegDecAdaPoinTrVariableLoss); train other models natively or "
        "extend tools/convert_torch.py"
    )


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (CPU torch)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "base_model", "state_dict", "model_state_dict", "net"):
        if isinstance(raw, dict) and key in raw:
            raw = raw[key]
            break
    out = {}
    for k, v in raw.items():
        k = k.replace("module.", "")  # strip DDP prefix (builder.py:102)
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def load_torch_checkpoint_into_state(state, path: str, model_cfg) -> dict:
    """Reference torch checkpoint (.pth) → initialized flax state.

    Accepts the reference's save formats ({'base_model': sd} from
    tools/builder.py:130-139, {'model': sd}, or a bare state dict), strips
    DDP 'module.' prefixes, and routes through the model-specific converter
    chosen by config NAME. ``state`` is an initialized {'params',
    'batch_stats'} tree whose structure the converted weights are merged
    into — leaves absent from the checkpoint keep their init values.
    Used by `main.py --test --ckpts model.pth` and the demo, so a
    reference user can point either straight at their pretrained/*.pth.
    """
    sd = load_torch_state(path)
    res = converter_for(model_cfg.NAME)(sd, model_cfg)
    if res.get("missing"):
        raise ValueError(
            f"torch checkpoint {path}: unconverted keys {res['missing'][:8]}"
        )

    def merge(dst, src):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {}))
            else:
                out[k] = np.asarray(src[k]) if k in src else v
        return out

    return {
        "params": merge(state["params"], res["params"]),
        "batch_stats": merge(state["batch_stats"], res["batch_stats"]),
    }


def load_gdanet_weights(path: str):
    """--gdanet_w entry point: torch GDANet checkpoint → (params, batch_stats)."""
    state = load_torch_state(path)
    result = convert_gdanet(state)
    if not result["params"]:
        # a wrong file/format would otherwise "load" nothing and train on a
        # random frozen GDANet — fail loudly instead
        raise ValueError(
            f"no GDANet weights matched in {path} "
            f"(checkpoint keys: {list(state)[:5]}...)"
        )
    if result["missing"]:
        print(f"[convert_torch] {len(result['missing'])} keys missing "
              f"(strict=False, like the reference): {result['missing'][:5]}...")
    return result["params"], result["batch_stats"]


def main(argv=None):
    """CLI: convert a reference torch checkpoint into a flax checkpoint.

    python -m imgadapointr_tpu.tools.convert_torch \\
        --config cfgs/PCN_models/AdaPoinTr.yaml --torch_ckpt ckpt-best.pth \\
        --out experiments/converted   (writes ckpt-converted.ckpt)
    """
    import argparse
    import os

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--torch_ckpt", help="torch .pth to import")
    parser.add_argument("--export_ckpt", help="OUR .ckpt to export as torch .pth")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--kind", choices=["adapointr", "gdanet"], default="adapointr")
    args = parser.parse_args(argv)

    from ..utils.checkpoint import load_checkpoint, save_checkpoint
    from ..utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file(args.config)
    if args.export_ckpt:
        # reverse direction: flax checkpoint → reference-format torch .pth
        import torch

        from ..models.build import build_model_spec
        import jax

        spec = build_model_spec(config.model)
        key = jax.random.PRNGKey(0)
        import jax.numpy as jnp

        variables = jax.jit(
            lambda k: spec.module.init(
                {"params": k, "noise": k}, jnp.zeros((1, 2048, 3)), train=False
            )
        )(key)
        state = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        exp_dir, prefix = os.path.split(args.export_ckpt)
        state, _ = load_checkpoint(state, prefix.replace(".ckpt", ""), exp_dir)
        sd = export_adapointr_torch(state["params"], state["batch_stats"], config.model)
        os.makedirs(args.out, exist_ok=True)
        out_path = os.path.join(args.out, "ckpt-exported.pth")
        torch.save(
            {"base_model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
            out_path,
        )
        print(f"wrote {out_path} ({len(sd)} tensors, reference format)")
        return

    assert args.torch_ckpt, "--torch_ckpt or --export_ckpt required"
    sd = load_torch_state(args.torch_ckpt)
    if args.kind == "gdanet":
        result = convert_gdanet(sd)
    else:
        result = convert_adapointr(sd, config.model)
    if result["missing"]:
        print(f"[convert_torch] {len(result['missing'])} torch keys missing; "
              f"first: {result['missing'][:8]}")
    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(
        {"params": result["params"], "batch_stats": result["batch_stats"]},
        None, None, -1, "ckpt-converted", args.out,
    )
    print(f"wrote {os.path.join(args.out, 'ckpt-converted.ckpt')}")


if __name__ == "__main__":
    main()
