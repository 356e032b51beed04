"""Programmatic serving API (reference demo/pcreconstructor.py:25-88).

Usage:
    from demo.pcreconstructor import PCReconstructor
    rec = PCReconstructor("cfgs/SegImgPCN_models/ImgEncSegDec-tiny.yaml",
                          "experiments/.../ckpt-best.ckpt")
    fine = rec.predict("cloud.pcd", "render.png", "03001627", CLASSES)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class PCReconstructor:
    def __init__(self, config_path, ckpt_path):
        from imgadapointr_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache()

        import jax

        from imgadapointr_tpu.models.build import build_model_spec
        from imgadapointr_tpu.utils.checkpoint import load_checkpoint
        from imgadapointr_tpu.utils.config import cfg_from_yaml_file

        self.config = cfg_from_yaml_file(config_path)
        self.spec = build_model_spec(self.config.model)
        self.inputs = tuple(self.spec.inputs)

        key = jax.random.PRNGKey(0)
        example = {
            "partial": jax.numpy.zeros((1, 2048, 3)),
            "img": jax.numpy.zeros((1, 224, 224, 3)),
            "cls_vec": jax.numpy.zeros((1, 16)),
        }
        ex_inputs = [example[k] for k in self.inputs]
        variables = jax.jit(
            lambda k, *i: self.spec.module.init({"params": k, "noise": k}, *i, train=False)
        )(key, *ex_inputs)
        state = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
        if ckpt_path and ckpt_path.endswith((".pth", ".pt")):
            # reference torch checkpoint: convert in place by model name —
            # a reference user can point the demo straight at their
            # pretrained/*.pth files
            state = _load_torch_checkpoint(state, ckpt_path, self.config.model)
        elif ckpt_path:
            exp, prefix = os.path.split(ckpt_path)
            state, _ = load_checkpoint(state, prefix.replace(".ckpt", ""), exp)
        self.state = state
        self._fwd = jax.jit(
            lambda s, *i: self.spec.module.apply(s, *i, train=False)
        )

    def predict(self, point_cloud_path, image_path=None, class_id=None, classes=None):
        """Returns the dense completion (N, 3) numpy array."""
        import jax.numpy as jnp

        batch = {"partial": jnp.asarray(self.preprocess_point_cloud(point_cloud_path))}
        if "img" in self.inputs:
            batch["img"] = jnp.asarray(self.load_image(image_path))
        if "cls_vec" in self.inputs:
            batch["cls_vec"] = jnp.asarray(self.prepare_cls_vec(classes or {}, class_id))
        out = self._fwd(self.state, *[batch[k] for k in self.inputs])
        return np.asarray(out[-1][0])

    @staticmethod
    def preprocess_point_cloud(path, num_points=2048):
        from imgadapointr_tpu.utils.io_module import IO

        pc = IO.get(path).astype(np.float32)[:num_points]
        if len(pc) < num_points:  # fixed shape: tile up
            reps = -(-num_points // len(pc))
            pc = np.tile(pc, (reps, 1))[:num_points]
        return pc[None]

    @staticmethod
    def load_image(path, size=224):
        from imgadapointr_tpu.datasets.pcn_dataset import _load_image

        return _load_image(path, size)[None]

    @staticmethod
    def prepare_cls_vec(classes, class_id):
        cls_vec = np.zeros((1, 16), np.float32)
        idx = classes.get(class_id, -1)
        if idx != -1:
            cls_vec[0, idx] = 1
        return cls_vec


def _load_torch_checkpoint(state, path, model_cfg):
    """Reference .pth → flax state; shared loader in tools/convert_torch."""
    from imgadapointr_tpu.tools.convert_torch import (
        load_torch_checkpoint_into_state,
    )

    return load_torch_checkpoint_into_state(state, path, model_cfg)
