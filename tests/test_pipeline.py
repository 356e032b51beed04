"""Pipeline parallelism (pp): the GPipe microbatch ring is bit-identical to
the sequential stack and differentiable, alone and composed with dp.

The reference never pipelines (DDP-only, SURVEY.md §2.7); these tests pin
the TPU scale-out path added in parallel/pipeline.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imgadapointr_tpu.parallel import (
    encoder_pipeline_apply,
    make_pipe_mesh,
    pipeline_apply,
    stack_stage_params,
)

S, M, MB, C = 4, 4, 2, 16  # stages, microbatches, microbatch size, width


def _toy_stage(p, h, _shared):
    W, b = p
    return jnp.tanh(h @ W + b)


def _toy_inputs(seed=0):
    rng = np.random.RandomState(seed)
    Ws = jnp.asarray(rng.randn(S, C, C) * 0.3, jnp.float32)
    bs = jnp.asarray(rng.randn(S, C) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(M * MB, 8, C), jnp.float32)
    return (Ws, bs), x


def _toy_sequential(params, x):
    Ws, bs = params
    h = x
    for s in range(S):
        h = _toy_stage((Ws[s], bs[s]), h, None)
    return h


def test_pipeline_matches_sequential_bitwise():
    mesh = make_pipe_mesh(jax.devices()[:S], pipe=S)
    params, x = _toy_inputs()
    got = jax.jit(
        lambda p, x: pipeline_apply(
            _toy_stage, p, x, None, mesh=mesh, microbatches=M
        )
    )(params, x)
    # sequential reference over the SAME microbatch slices
    want = jnp.concatenate(
        [
            _toy_sequential(params, x[m * MB : (m + 1) * MB])
            for m in range(M)
        ]
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pipeline_gradients_match_sequential():
    mesh = make_pipe_mesh(jax.devices()[:S], pipe=S)
    params, x = _toy_inputs(1)

    def loss_pipe(p, x):
        y = pipeline_apply(_toy_stage, p, x, None, mesh=mesh, microbatches=M)
        return jnp.sum(y * y)

    def loss_seq(p, x):
        y = _toy_sequential(p, x)
        return jnp.sum(y * y)

    gp = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(params, x)
    gs = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(params, x)
    # the psum transpose reorders grad accumulation → ~1e-6 float noise
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_pipeline_dp_composition():
    """dp×pp: microbatch dim sharded over 'data' while stages ride 'pipe'."""
    mesh = make_pipe_mesh(jax.devices()[:8], pipe=S, dp=2)
    params, x = _toy_inputs(2)
    got = jax.jit(
        lambda p, x: pipeline_apply(
            _toy_stage, p, x, None,
            mesh=mesh, microbatches=M, batch_axis="data",
        )
    )(params, x)
    want = jnp.concatenate(
        [_toy_sequential(params, x[m * MB : (m + 1) * MB]) for m in range(M)]
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_encoder_tail_pipelined_matches_apply():
    """Flagship-shaped encoder: block0 ('attn-graph') replicated, 4 pure
    'attn' tail blocks pipelined — equals enc.apply on microbatch slices."""
    from imgadapointr_tpu.nn.blocks import PointTransformerEncoder

    depth = S + 1
    enc = PointTransformerEncoder(
        embed_dim=32, depth=depth, num_heads=4, mlp_ratio=2.0, k=4, n_group=2,
        block_style_list=("attn-graph",) + ("attn",) * S,
        combine_style="concat",
    )
    rng = np.random.RandomState(3)
    B, N = M * MB, 32
    x = jnp.asarray(rng.randn(B, N, 32), jnp.float32)
    pos = jnp.asarray(rng.randn(B, N, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, pos)["params"]

    mesh = make_pipe_mesh(jax.devices()[:S], pipe=S)
    got = jax.jit(
        lambda p, x, pos: encoder_pipeline_apply(
            enc, p, x, pos, mesh, microbatches=M
        )
    )(params, x, pos)
    want = jnp.concatenate(
        [
            enc.apply(
                {"params": params},
                x[m * MB : (m + 1) * MB],
                pos[m * MB : (m + 1) * MB],
            )
            for m in range(M)
        ]
    )
    # block0 runs full-batch in the pipelined path vs per-slice in the
    # reference → shape-dependent XLA fusion noise (~2e-7); the combinator
    # itself is bit-exact (test_pipeline_matches_sequential_bitwise)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_encoder_tail_pipeline_differentiable():
    from imgadapointr_tpu.nn.blocks import PointTransformerEncoder

    enc = PointTransformerEncoder(
        embed_dim=32, depth=S + 1, num_heads=4, mlp_ratio=2.0, k=4, n_group=2,
        block_style_list=("attn-graph",) + ("attn",) * S,
        combine_style="concat",
    )
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(M * MB, 32, 32), jnp.float32)
    pos = jnp.asarray(rng.randn(M * MB, 32, 3), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, pos)["params"]
    mesh = make_pipe_mesh(jax.devices()[:S], pipe=S)

    def loss_pipe(p):
        return jnp.sum(
            encoder_pipeline_apply(enc, p, x, pos, mesh, microbatches=M) ** 2
        )

    def loss_seq(p):
        y = jnp.concatenate(
            [
                enc.apply(
                    {"params": p},
                    x[m * MB : (m + 1) * MB],
                    pos[m * MB : (m + 1) * MB],
                )
                for m in range(M)
            ]
        )
        return jnp.sum(y * y)

    gp = jax.jit(jax.grad(loss_pipe))(params)
    gs = jax.jit(jax.grad(loss_seq))(params)
    flat_p, flat_s = jax.tree.leaves(gp), jax.tree.leaves(gs)
    assert len(flat_p) == len(flat_s)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_pipeline_rejects_bad_microbatch():
    mesh = make_pipe_mesh(jax.devices()[:S], pipe=S)
    params, x = _toy_inputs()
    with pytest.raises(AssertionError):
        pipeline_apply(_toy_stage, params, x, None, mesh=mesh, microbatches=3)
