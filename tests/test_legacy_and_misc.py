"""Legacy block API, ball_query, and misc-op coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu import ops
from imgadapointr_tpu.nn import legacy_blocks as lb


def test_ball_query_semantics():
    # 1 query at origin; points on a line
    xyz = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32))[None, :, None] * jnp.ones(
        (1, 11, 3)
    )
    q = jnp.zeros((1, 1, 3))
    idx = np.asarray(ops.ball_query(0.35, 4, xyz, q))[0, 0]
    # in-radius points: |x·√3| <= .35 → x in {0, .1, .2} (0.2·√3≈0.346)
    assert set(idx) <= {0, 1, 2}
    assert idx[0] == 0  # nearest first
    # fewer in-ball than nsample → first point fills the rest
    assert (idx[3:] == idx[0]).all() or len(set(idx)) == 4


def test_ball_query_no_neighbors_falls_back_to_nearest():
    xyz = jnp.ones((1, 5, 3)) * 10.0
    q = jnp.zeros((1, 1, 3))
    idx = np.asarray(ops.ball_query(0.1, 3, xyz, q))
    assert idx.shape == (1, 1, 3)  # falls back to nearest point indices


@pytest.mark.parametrize(
    "cls", [lb.Block, lb.RegionWiseBlock, lb.DeformableAttnBlock, lb.GraphConvBlock]
)
def test_legacy_encoder_blocks(cls):
    key = jax.random.PRNGKey(0)
    m = cls(dim=24, num_heads=4) if cls is not lb.GraphConvBlock else cls(dim=24)
    x = jax.random.normal(key, (2, 16, 24))
    pos = jax.random.normal(key, (2, 16, 3))
    v = m.init(key, x, pos)
    out = m.apply(v, x, pos)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "cls", [lb.DecoderBlock, lb.DeformableAttnDecoderBlock, lb.GraphConvDecoderBlock]
)
def test_legacy_decoder_blocks(cls):
    key = jax.random.PRNGKey(0)
    m = cls(dim=24, num_heads=4)
    q = jax.random.normal(key, (2, 10, 24))
    x = jax.random.normal(key, (2, 16, 24))
    qpos = jax.random.normal(key, (2, 10, 3))
    pos = jax.random.normal(key, (2, 16, 3))
    v = m.init(key, q, x, qpos, pos)
    out = m.apply(v, q, x, qpos, pos)
    assert out.shape == q.shape and np.isfinite(np.asarray(out)).all()


def _accum_cfg(opt_type, clip, wd=0.0, lr=0.1, **opt_kwargs):
    from imgadapointr_tpu.utils.config import AttrDict

    return AttrDict(
        {"optimizer": {"type": opt_type,
                       "kwargs": dict({"lr": lr, "weight_decay": wd}, **opt_kwargs)},
         "scheduler": {"type": "StepLR", "kwargs": {"step_size": 1000, "gamma": 1.0}},
         "grad_norm_clip": clip, "max_epoch": 1}
    )


@pytest.mark.parametrize("opt_type", ["SGD", "AdamW"])
@pytest.mark.parametrize("clip", [1e9, 2.0])
def test_grad_accumulation_sums_like_reference(opt_type, clip):
    """step_per_update=k accumulates the SUM of the k grads — the reference
    calls loss.backward() k times with NO rescale before one clip+step
    (reference tools/runner.py:196-215) — so two half-batch update() calls
    must equal ONE k=1 step on g1+g2.  Checked with the clip disengaged
    (1e9) AND engaged (2.0 < |g1+g2|): the clip must see the SUMMED norm,
    not the running mean optax.MultiSteps hands the inner chain."""
    import optax

    from imgadapointr_tpu.tools.builder import build_opt_sched

    params = {"w": jnp.ones((4,))}
    g1 = {"w": jnp.asarray([1.0, 2.0, 3.0, 4.0])}
    g2 = {"w": jnp.asarray([3.0, 2.0, 1.0, 0.0])}
    gsum = jax.tree.map(lambda a, b: a + b, g1, g2)

    base = _accum_cfg(opt_type, clip, momentum=0.9) if opt_type == "SGD" \
        else _accum_cfg(opt_type, clip)
    tx, _, _ = build_opt_sched(base, 10, params)
    s = tx.init(params)
    up, _ = tx.update(gsum, s, params)
    full = optax.apply_updates(params, up)

    acc_cfg = type(base)(dict(base, step_per_update=2))
    tx2, _, _ = build_opt_sched(acc_cfg, 10, params)
    s2 = tx2.init(params)
    u1, s2 = tx2.update(g1, s2, params)
    p_mid = optax.apply_updates(params, u1)
    assert np.allclose(np.asarray(p_mid["w"]), np.asarray(params["w"]))  # no step yet
    u2, s2 = tx2.update(g2, s2, p_mid)
    accum = optax.apply_updates(p_mid, u2)

    np.testing.assert_allclose(np.asarray(full["w"]), np.asarray(accum["w"]), atol=1e-6)
    if clip < 10.0:  # sanity: the engaged clip actually rescaled the step
        up_raw, _ = tx.update(gsum, tx.init(params), params)
        assert float(optax.global_norm(jax.tree.map(jnp.abs, up_raw))) > 0.0


@pytest.mark.parametrize("opt_type", ["SGD", "AdamW"])
def test_grad_accumulation_matches_torch(opt_type):
    """Torch cross-check of the sum semantics: k=2 accumulation through
    build_opt_sched == torch's (grad := g1+g2 via two backward()s) →
    clip_grad_norm_ → opt.step(), for two full update cycles (4 grads),
    clip engaged, weight decay on a 2-D param (so AdamW's decay mask keeps
    it).  Reference loop: tools/runner.py:196-215 + builder.py:55-58."""
    torch = pytest.importorskip("torch")
    import optax

    from imgadapointr_tpu.tools.builder import build_opt_sched

    rng = np.random.RandomState(0)
    w0 = rng.randn(3, 3).astype(np.float32)
    grads = [rng.randn(3, 3).astype(np.float32) * 2.0 for _ in range(4)]
    lr, wd, clip = 0.05, 0.01, 1.5

    # --- torch side: sum two grads per optimizer step
    p = torch.nn.Parameter(torch.tensor(w0))
    if opt_type == "SGD":
        opt = torch.optim.SGD([p], lr=lr, momentum=0.9, weight_decay=wd)
    else:
        opt = torch.optim.AdamW([p], lr=lr, weight_decay=wd)
    for step in range(2):
        opt.zero_grad()
        p.grad = torch.tensor(grads[2 * step] + grads[2 * step + 1])
        torch.nn.utils.clip_grad_norm_([p], clip)
        opt.step()
    torch_w = p.detach().numpy()

    # --- ours: feed the 4 grads one at a time through step_per_update=2
    params = {"w": jnp.asarray(w0)}
    cfg = _accum_cfg(opt_type, clip, wd=wd, lr=lr,
                     **({"momentum": 0.9} if opt_type == "SGD" else {}))
    cfg = type(cfg)(dict(cfg, step_per_update=2))
    tx, _, _ = build_opt_sched(cfg, 10, params)
    s = tx.init(params)
    for g in grads:
        up, s = tx.update({"w": jnp.asarray(g)}, s, params)
        params = optax.apply_updates(params, up)

    np.testing.assert_allclose(np.asarray(params["w"]), torch_w, rtol=2e-5, atol=2e-6)
