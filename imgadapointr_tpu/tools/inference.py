"""Single-cloud inference CLI (reference tools/inference.py:20-123).

Usage:
    python -m imgadapointr_tpu.tools.inference \
        --model_config cfgs/PCN_models/AdaPoinTr.yaml \
        --model_checkpoint experiments/.../ckpt-best.ckpt \
        --pc path/to/partial.pcd --out_pc_root out/ [--save_vis_img]

Reads one cloud (.npy/.pcd/.ply/...), optionally ShapeNet-normalises it,
upsamples to 2048 points, runs the model in eval mode, saves ``fine.npy``
(+ matplotlib renders with --save_vis_img).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_config", required=True)
    parser.add_argument("--model_checkpoint", required=True)
    parser.add_argument("--pc_root", type=str, default="", help="dir of input clouds")
    parser.add_argument("--pc", type=str, default="", help="single input cloud")
    parser.add_argument("--out_pc_root", type=str, default="", help="output dir")
    parser.add_argument("--save_vis_img", action="store_true", default=False)
    args = parser.parse_args(argv)
    assert args.save_vis_img or args.out_pc_root != ""
    assert (args.pc != "") or (args.pc_root != "")
    return args


def _build(args):
    from imgadapointr_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from imgadapointr_tpu.models.build import build_model_spec
    from imgadapointr_tpu.utils.checkpoint import load_checkpoint
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file(args.model_config)
    spec = build_model_spec(config.model)
    key = jax.random.PRNGKey(0)
    example = jax.numpy.zeros((1, 2048, 3))
    variables = jax.jit(
        lambda k, x: spec.module.init({"params": k, "noise": k}, x, train=False)
    )(key, example)
    state = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
    if args.model_checkpoint.endswith((".pth", ".pt")):
        # reference torch checkpoints load directly, like main.py --test
        # --ckpts and the demo (shared converter dispatch)
        from .convert_torch import load_torch_checkpoint_into_state

        state = load_torch_checkpoint_into_state(
            state, args.model_checkpoint, config.model
        )
    else:
        exp, prefix = os.path.split(args.model_checkpoint)
        state, _ = load_checkpoint(state, prefix.replace(".ckpt", ""), exp)
    fwd = jax.jit(lambda s, x: spec.module.apply(s, x, train=False))
    return config, state, fwd


def inference_single(fwd, state, pc_path, args, config, root=None):
    import jax.numpy as jnp

    from imgadapointr_tpu.datasets.transforms import UpSamplePoints
    from imgadapointr_tpu.utils.io_module import IO

    pc_file = os.path.join(root, pc_path) if root else pc_path
    pc = IO.get(pc_file).astype(np.float32)

    # ShapeNet-55/34 inputs get centred + unit-sphere-scaled
    # (reference tools/inference.py:61-66)
    centroid = np.zeros(3, np.float32)
    m = 1.0
    if config.dataset.train.get("NAME") == "ShapeNet":
        centroid = np.mean(pc, axis=0)
        pc = pc - centroid
        m = float(np.max(np.sqrt(np.sum(pc**2, axis=1))))
        pc = pc / m

    up = UpSamplePoints({"n_points": 2048})
    pc = up(pc, np.random.default_rng(0))
    coarse, dense = fwd(state, jnp.asarray(pc[None]))
    dense = np.asarray(dense[0]) * m + centroid

    if args.out_pc_root:
        rel = os.path.basename(pc_path) if os.path.isabs(pc_path) else pc_path
        target_path = os.path.join(args.out_pc_root, os.path.splitext(rel)[0])
        os.makedirs(target_path, exist_ok=True)
        np.save(os.path.join(target_path, "fine.npy"), dense)
        if args.save_vis_img:
            _save_vis(target_path, pc, dense)
    return dense


def _save_vis(target_path, partial, dense):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for name, cloud in (("input", partial), ("fine", dense)):
        fig = plt.figure(figsize=(4, 4))
        ax = fig.add_subplot(projection="3d")
        ax.scatter(cloud[:, 0], cloud[:, 1], cloud[:, 2], s=0.5)
        ax.set_axis_off()
        fig.savefig(os.path.join(target_path, f"{name}.jpg"), dpi=120)
        plt.close(fig)


def main(argv=None):
    args = get_args(argv)
    config, state, fwd = _build(args)
    if args.pc_root:
        for f in sorted(os.listdir(args.pc_root)):
            if os.path.splitext(f)[-1].lower() in (".npy", ".pcd", ".ply", ".txt", ".xyz", ".h5"):
                inference_single(fwd, state, f, args, config, root=args.pc_root)
                print(f"done: {f}")
    else:
        inference_single(fwd, state, args.pc, args, config)
        print(f"done: {args.pc}")


if __name__ == "__main__":
    main()
