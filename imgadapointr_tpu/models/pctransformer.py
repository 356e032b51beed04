"""PCTransformer — the AdaPoinTr encoder/decoder core (flax.linen).

Structural parity with reference models/external/AdaPoinTr.py:24-152 and
models/internal/pctransformer.py:
  grouper → pos-embed + input-proj → encoder → [optional img fusion] →
  global feature → coarse prediction + FPS query candidates → query ranking
  (top-num_query) → [train: +64 jittered denoise queries] → mlp_query →
  decoder → [optional seg fusion on queries].

TPU notes: ``train`` is a static flag, so the denoise branch compiles as a
separate specialisation (the XLA analog of the reference's ``self.training``
branch). The jitter noise key comes from the 'noise' RNG collection.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import ops
from ..nn.blocks import decoder_from_config, encoder_from_config
from ..nn.grouper import DGCNNGrouper, SimpleEncoder
from ..nn.layers import ConcatDense, dense, gelu
from .fusion import ImgFusion, SegFusion

DENOISE_LENGTH = 64  # reference AdaPoinTr.py:126-129


class PCTransformer(nn.Module):
    config: dict  # model config (AttrDict)

    @nn.compact
    def __call__(
        self,
        xyz,
        img_feat: Optional[jnp.ndarray] = None,
        seg_fn=None,
        cls_vec: Optional[jnp.ndarray] = None,
        train: bool = False,
        bn_momentum=0.1,
    ):
        from ..utils.config import AttrDict

        cfg = AttrDict(self.config)  # flax freezes dict fields; re-wrap
        center_num = tuple(cfg.get("center_num", [512, 128]))
        num_query = int(cfg.num_query)
        enc_cfg = cfg.encoder_config
        dec_cfg = cfg.decoder_config
        global_feature_dim = int(cfg.global_feature_dim)
        encoder_type = cfg.encoder_type
        assert encoder_type in ("graph", "pn"), f"unexpected encoder_type {encoder_type}"
        B = xyz.shape[0]
        deterministic = not train

        # --- grouper front end ---
        if encoder_type == "graph":
            coor, f = DGCNNGrouper(k=16, name="grouper")(xyz, center_num, train=train)
        else:
            coor, f = SimpleEncoder(k=32, embed_dims=512, name="grouper")(
                xyz, center_num, use_running_average=deterministic,
                bn_momentum=bn_momentum,
            )

        pe = dense(128, name="pos_embed1")(coor)
        pe = dense(enc_cfg.embed_dim, name="pos_embed2")(gelu(pe))
        x = dense(512, name="input_proj1")(f)
        x = dense(enc_cfg.embed_dim, name="input_proj2")(gelu(x))

        x = encoder_from_config(enc_cfg, name="encoder")(
            x + pe, coor, deterministic=deterministic
        )

        # --- optional image fusion after the encoder ---
        # (reference models/internal/pctransformer.py:148-172)
        if cfg.get("use_img_features", False) and not cfg.get("img_before_dec", False):
            assert img_feat is not None, "model configured with use_img_features"
            x = ImgFusion(enc_cfg.embed_dim, name="img_fusion")(
                x, img_feat, deterministic=deterministic
            )

        # One shared seg-fusion stack for both the enc and dec sites,
        # matching the reference's single cross_attn_seg* layer set
        # (pctransformer.py:126-136 used at :183-199 and :258-277).
        seg_fusion = (
            SegFusion(enc_cfg.embed_dim, name="seg_fusion")
            if cfg.get("use_seg_features", False)
            else None
        )

        # --- optional segmentation fusion on encoder tokens ---
        # (reference models/internal/pctransformer.py:175-199)
        if cfg.get("use_seg_features", False) and cfg.get("seg_before_enc", False):
            assert seg_fn is not None
            seg_feat = seg_fn(coor, cls_vec)  # (B, n, seg_dim) frozen GDANet features
            x = seg_fusion(x, seg_feat, deterministic=deterministic)

        # --- global feature + coarse queries ---
        g = dense(1024, name="increase_dim1")(x)
        g = dense(global_feature_dim, name="increase_dim2")(gelu(g))
        global_feature = jnp.max(g, axis=1)  # (B, global_dim)

        coarse = dense(1024, name="coarse_pred1")(global_feature)
        coarse = dense(3 * num_query, name="coarse_pred2")(gelu(coarse))
        coarse = coarse.reshape(B, num_query, 3)

        coarse_inp = ops.fps(xyz, num_query // 2)
        coarse = jnp.concatenate([coarse, coarse_inp], axis=1)  # (B, 1.5·nq, 3)

        if dec_cfg.embed_dim == enc_cfg.embed_dim:
            mem = x
        else:
            mem = dense(dec_cfg.embed_dim, name="mem_link")(x)

        # query ranking: sigmoid score, keep top-num_query
        # (reference AdaPoinTr.py:119-121; argsort-descending + slice == top_k)
        r = dense(256, name="query_ranking1")(coarse)
        r = dense(256, name="query_ranking2")(gelu(r))
        r = nn.sigmoid(dense(1, name="query_ranking3")(gelu(r)))  # (B, n, 1)
        _, idx = jax.lax.top_k(r[..., 0], num_query)
        coarse = ops.index_points(coarse, idx)

        denoise_length = 0
        if train:
            denoise_length = DENOISE_LENGTH
            picked = ops.fps(xyz, denoise_length)
            picked = ops.jitter_points(self.make_rng("noise"), picked)
            coarse = jnp.concatenate([coarse, picked], axis=1)

        # query embedding: mlp_query over virtual concat([global, coarse])
        # (reference AdaPoinTr.py:132-135; the global part contracts once)
        q = ConcatDense(1024, name="mlp_query1")(global_feature[:, None, :], coarse)
        q = dense(1024, name="mlp_query2")(gelu(q))
        q = dense(dec_cfg.embed_dim, name="mlp_query3")(gelu(q))

        q = decoder_from_config(dec_cfg, name="decoder")(
            q, mem, coarse, coor,
            denoise_length=denoise_length, deterministic=deterministic,
        )

        # --- optional segmentation fusion on decoder queries ---
        # (reference pctransformer.py:237-326; train mode fuses only the
        # non-denoise prefix of q)
        if cfg.get("use_seg_features", False) and cfg.get("seg_before_dec", False):
            assert seg_fn is not None
            n_real = q.shape[1] - denoise_length
            seg_feat = seg_fn(coarse[:, :n_real], cls_vec)
            q_real = seg_fusion(q[:, :n_real], seg_feat, deterministic=deterministic)
            q = jnp.concatenate([q_real, q[:, n_real:]], axis=1) if denoise_length else q_real

        return q, coarse, denoise_length
