"""Load a flax (params, batch_stats) tree into a reference torch state dict
by INVERTING tools/convert_torch numerically — no per-rule inverse code.

Every forward conversion rule is a layout permutation / row-split
(transpose, conv-kernel reorder, fused-Linear row split — see
tools/convert_torch.py's module docstring), so the inverse can be TRACED:
fill each torch tensor with unique global element ids (exact in float64),
run the converter once, and read off, for every flax leaf element, which
torch element it came from.  Loading is then a pure gather; a value-level
round-trip check guards the permutation assumption (any rule that scaled or
combined values would fail it).

Harness-only module (the CI golden tests never need torch layouts).
"""

from __future__ import annotations

import numpy as np

from parity.run_parity import KIND_TO_NAME, flatten, to_plain


def _converter(kind):
    from imgadapointr_tpu.tools.convert_torch import converter_for

    return converter_for(KIND_TO_NAME.get(kind, "AdaPoinTr"))


def trace_inverse(sd_template: dict, model_cfg, kind: str):
    """Build the torch←flax element mapping.

    Returns (id_of: {torch_key: int64 id array}, src: {("params"|"stats",
    path-tuple): int64 id array per flax leaf}).  Ids are globally unique;
    float64 carries them exactly (converters are dtype-preserving numpy
    layout ops; an id that came back non-integral or out-of-range would
    mean value arithmetic happened and asserts here).
    """
    offsets, total = {}, 0
    for k, v in sd_template.items():
        offsets[k] = total
        total += int(np.asarray(v).size)
    assert total < 2**53, "float64 id encoding limit"
    sd_ids = {
        k: np.arange(offsets[k], offsets[k] + np.asarray(v).size, dtype=np.float64)
        .reshape(np.asarray(v).shape)
        for k, v in sd_template.items()
    }
    res = _converter(kind)(sd_ids, model_cfg)
    assert not res["missing"], f"converter missing keys: {res['missing'][:10]}"
    src = {}
    for tag, tree in (("params", res["params"]), ("stats", res["batch_stats"])):
        for path, leaf in flatten(to_plain(tree)).items():
            ids = np.asarray(leaf, np.float64)
            r = np.rint(ids)
            assert np.all(np.abs(ids - r) == 0.0), (
                f"non-permutation conversion at {tag}/{'/'.join(path)}"
            )
            r = r.astype(np.int64)
            assert r.min() >= 0 and r.max() < total
            src[(tag, path)] = r
    id_of = {k: v.astype(np.int64) for k, v in sd_ids.items()}
    return id_of, src


def load_flax_into_torch(variables, sd_template: dict, model_cfg, kind: str):
    """Map {params, batch_stats} flax trees onto a torch state dict.

    Torch elements the converter never reads (num_batches_tracked, the dead
    encoder norm, …) keep their ``sd_template`` values.  Returns a
    {torch_key: np.ndarray} dict in the template's shapes/dtypes.
    """
    id_of, src = trace_inverse(sd_template, model_cfg, kind)
    total = max(int(v.max()) + 1 if v.size else 0 for v in id_of.values())
    value = np.zeros(total, np.float64)
    covered = np.zeros(total, bool)
    trees = {
        "params": flatten(to_plain(variables["params"])),
        "stats": flatten(to_plain(variables.get("batch_stats", {}))),
    }
    for (tag, path), ids in src.items():
        leaf = trees[tag].get(path)
        assert leaf is not None, f"flax tree missing {tag}/{'/'.join(path)}"
        leaf = np.asarray(leaf, np.float64)
        assert leaf.shape == ids.shape, (
            f"{tag}/{'/'.join(path)}: flax {leaf.shape} vs traced {ids.shape}"
        )
        flat_ids = ids.ravel()
        prev = covered[flat_ids]
        if prev.any():
            # a torch element feeding two flax leaves must carry ONE value
            assert np.allclose(
                value[flat_ids[prev]], leaf.ravel()[prev]
            ), f"inconsistent duplicate mapping at {tag}/{'/'.join(path)}"
        value[flat_ids] = leaf.ravel()
        covered[flat_ids] = True
    out = {}
    for k, tmpl in sd_template.items():
        tmpl = np.asarray(tmpl)
        ids = id_of[k].ravel()
        vals = np.where(covered[ids], value[ids], tmpl.ravel().astype(np.float64))
        out[k] = vals.reshape(tmpl.shape).astype(tmpl.dtype)
    return out


def ours_init_setup(ref, model_cfg, kind: str, batch: int, n_points: int,
                    double: bool):
    """``--init ours`` harness mode: overwrite the torch reference model's
    weights with OUR deterministic flax init (parity/param_source.py) and
    build the matching PRNG example inputs on both sides.

    Returns (sd, inputs_t, inputs_np, gt_t, myvars): the refreshed torch
    state dict, torch-layout input tensors (img NCHW, the seg kind's ignored
    img placeholder inserted), jax-layout numpy inputs, the torch gt, and
    the flax variables the state dict now carries bit-exactly.
    """
    import torch

    from parity.param_source import example_inputs, init_variables
    from parity.run_parity import torch_state_numpy

    sd_template = torch_state_numpy(ref)
    _, myvars = init_variables(model_cfg, kind, batch=batch, n_points=n_points)
    sd_new = load_flax_into_torch(myvars, sd_template, model_cfg, kind)
    ref.load_state_dict({k: torch.tensor(v) for k, v in sd_new.items()})
    inputs_j, gt_j = example_inputs(model_cfg, kind, batch, n_points)
    dtype = torch.float64 if double else torch.float32
    inputs_np = [np.asarray(a) for a in inputs_j]
    inputs_t = []
    for a in inputs_np:
        if a.ndim == 4:  # channels-last img → torch NCHW
            inputs_t.append(torch.tensor(a.transpose(0, 3, 1, 2), dtype=dtype))
        else:
            inputs_t.append(torch.tensor(a, dtype=dtype))
    if kind == "seg":
        # torch SegEnc signature is (xyz, img, cls) with img ignored
        inputs_t.insert(1, torch.zeros(batch, 1, dtype=dtype))
    gt_t = torch.tensor(np.asarray(gt_j), dtype=dtype)
    return torch_state_numpy(ref), inputs_t, inputs_np, gt_t, myvars


def verify_round_trip(sd_template: dict, model_cfg, kind: str, seed=0):
    """Converter(load(random flax tree)) must reproduce the tree exactly."""
    rng = np.random.RandomState(seed)
    res = _converter(kind)(
        {k: np.asarray(v, np.float64) for k, v in sd_template.items()}, model_cfg
    )
    rand = {
        "params": {},
        "batch_stats": {},
    }
    flat_p = flatten(to_plain(res["params"]))
    flat_s = flatten(to_plain(res["batch_stats"]))
    for tag, flat in (("params", flat_p), ("batch_stats", flat_s)):
        tree = {}
        for path, leaf in flat.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            # f32 values: exactly representable through the template's
            # (typically float32) dtype, so the round-trip must be bit-exact
            node[path[-1]] = rng.randn(*np.asarray(leaf).shape).astype(np.float32)
        rand[tag] = tree
    sd = load_flax_into_torch(rand, sd_template, model_cfg, kind)
    res2 = _converter(kind)(sd, model_cfg)
    for tag, tree in (("params", res2["params"]), ("batch_stats", res2["batch_stats"])):
        want = flatten(to_plain(rand[tag]))
        got = flatten(to_plain(tree))
        for path in want:
            a = np.asarray(want[path], np.float64)
            b = np.asarray(got[path], np.float64)
            assert a.shape == b.shape and np.abs(a - b).max() == 0.0, (
                f"round-trip drift at {tag}/{'/'.join(path)}"
            )
    return True
