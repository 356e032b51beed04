"""GDANet activation parity: reference models/segmentation/GDANet_ptseg.py
(pure torch, CPU) vs models/gdanet.py through convert_gdanet.

Also validates ops/normals.estimate_pointcloud_normals against the
pytorch3d-semantics stub (kNN-PCA smallest eigenvector) — up to per-point
SIGN, which is convention-dependent in any eigensolver (LAPACK picks an
arbitrary sign; so does the closed-form). The GDANet feature comparison
therefore injects the torch-side normals into both models, isolating real
semantic drift from the unavoidable sign convention.

Usage: python parity/run_parity_gdanet.py [--double]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

from parity.stubs import install_stubs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--double", action="store_true")
    ap.add_argument("--n-points", type=int, default=128)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    # the axon TPU plugin ignores the env vars — force the CPU backend
    # explicitly or every eager op pays a 0.2-2 s tunnel round-trip
    jax.config.update("jax_platforms", "cpu")

    if args.double:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    tol = 1e-9 if args.double else 2e-4

    install_stubs()
    sys.path.insert(0, REFERENCE)
    import torch

    from models.segmentation.GDANet_ptseg import GDANet as RefGDANet
    from parity.stubs import estimate_pointcloud_normals as stub_normals

    torch.manual_seed(0)
    ref = RefGDANet(50, device="cpu")
    ref.eval()
    dtype = torch.float64 if args.double else torch.float32
    if args.double:
        ref.double()

    g = torch.Generator().manual_seed(1)
    coor_t = torch.randn(2, args.n_points, 3, generator=g, dtype=dtype)
    cls_t = torch.zeros(2, 16, 1, dtype=dtype)
    cls_t[:, 3] = 1.0
    norm_t = stub_normals(coor_t, 30, disambiguate_directions=False)

    with torch.no_grad():
        seg_emb_t, seg_logits_t = ref(
            coor_t.transpose(1, 2), norm_t, cls_t
        )  # (B, 128, N), (B, N, 50)

    # ---- ours ----
    import jax.numpy as jnp

    from imgadapointr_tpu.models.gdanet import GDANet
    from imgadapointr_tpu.ops.normals import estimate_pointcloud_normals
    from imgadapointr_tpu.tools.convert_torch import convert_gdanet

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    res = convert_gdanet(sd)
    assert not res["missing"], res["missing"][:5]

    jdt = jnp.float64 if args.double else jnp.float32
    coor_j = jnp.asarray(coor_t.numpy(), jdt)
    norm_j = jnp.asarray(norm_t.numpy(), jdt)
    cls_j = jnp.asarray(cls_t.numpy()[..., 0], jdt)  # ours takes (B, 16)

    model = GDANet(50)
    template = model.init(jax.random.PRNGKey(0), coor_j, norm_j, cls_j)
    cast = lambda tree: jax.tree.map(lambda a: jnp.asarray(a, jdt), tree)
    variables = {"params": cast(res["params"]), "batch_stats": cast(res["batch_stats"])}
    # structural check vs template
    tp = jax.tree_util.tree_structure(template["params"])
    cp = jax.tree_util.tree_structure(variables["params"])
    assert tp == cp, f"param tree mismatch:\n{tp}\nvs\n{cp}"

    # the reference call site feeds (B, N, 3) normals into a .view(B, -1, N)
    # — a memory reinterpretation (scramble), replicated by the Seg* models
    # (models/seg_adapointr._scrambled_normals). Apply the same here.
    B, N, _ = norm_j.shape
    norm_eff = norm_j.reshape(B, 3, N).transpose(0, 2, 1)
    feat_j, logits_j = model.apply(variables, coor_j, norm_eff, cls_j, deterministic=True)

    ok = True

    def compare(name, a, b):
        nonlocal ok
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        good = d < tol
        ok &= good
        print(f"  [{'OK ' if good else 'FAIL'}] {name:24s} rel-delta {d:.3e} {a.shape}")

    # torch emits (B, 128, N); ours (B, N, 128)
    compare("gdanet.feature_tap", seg_emb_t.numpy().transpose(0, 2, 1), feat_j)
    compare("gdanet.seg_logits", seg_logits_t.numpy(), logits_j)

    # normals: match up to per-point sign (eigenvector sign is conventional)
    ours_n = np.asarray(estimate_pointcloud_normals(coor_j, 30))
    ref_n = norm_t.numpy()
    dots = np.abs((ours_n * ref_n).sum(-1))  # |cos| == 1 when parallel
    print(f"  normals |cos| min {dots.min():.6f} mean {dots.mean():.6f} "
          f"(sign-invariant agreement)")
    ok &= dots.min() > (1 - 1e-4 if not args.double else 1 - 1e-9)

    if not ok:
        sys.exit(1)
    print("GDANET PARITY OK")


if __name__ == "__main__":
    main()
