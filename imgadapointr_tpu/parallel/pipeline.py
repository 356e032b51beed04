"""GPipe-style pipeline parallelism (pp) over a 'pipe' mesh axis.

The reference scales only by data parallelism (DDP over NCCL, SURVEY.md
§2.7); its deepest compute — the 6-block encoder / 8-block decoder
transformer stacks (models/base_blocks.py:312-502) — always lives on one
GPU. On a TPU pod the natural extra axes are tensor (parallel/mesh.py)
and PIPELINE: put one transformer stage per device and stream microbatches
through a ``ppermute`` ring, so a model whose stack does not fit one chip
still trains/serves with every chip busy outside the (S-1)-tick bubble.

Design (the "pipelining as a collective ring" recipe):

- Stage s holds the parameters of block s only (``in_specs=P('pipe')`` on
  the stacked stage-major param pytree — XLA never materialises the full
  stack per device).
- One ``lax.scan`` over ``S + M - 1`` ticks. Every tick, every device runs
  the SAME stage computation on its current activation, then the ring
  ``ppermute`` shifts activations one stage forward. Stage 0 ingests
  microbatch ``t`` from the input buffer; stage S-1 writes microbatch
  ``t-(S-1)`` to the output buffer. Bubble ticks compute on zeros and are
  masked out by ``where`` selects, so they contribute zero cotangent —
  the whole loop is reverse-mode differentiable (ppermute transposes to
  the reverse ring; scan to its reverse scan).
- The combinator reorders NO math inside a stage: the pipelined stack is
  bit-identical to running the same stage functions sequentially on the
  same microbatch slices (CI-gated, tests/test_pipeline.py).

Composition: a ('data', 'pipe') mesh shards the microbatch dim over
'data' while stages ride 'pipe' (``batch_axis='data'``) — dp×pp with the
same body. The tensor axis from parallel/mesh.py composes the same way.

Constraints: ``stage_fn`` must be total on zero inputs (bubble ticks
evaluate it on zeros; a NaN there would poison gradients through 0·NaN).
Flax NN blocks (LayerNorm/attention/MLP) satisfy this. Stochastic-depth
train mode would need per-stage drop rates passed as stage data; the
encoder runner below targets the deterministic path (eval/serving and
drop-free training — the flagship trains with drop_path 0 in its first
blocks anyway; cfgs/PCN_models/AdaPoinTr.yaml).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pipe_mesh(devices=None, pipe: int = None, dp: int = 1) -> Mesh:
    """(dp × pipe) mesh with axes ('data', 'pipe')."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    pipe = pipe if pipe is not None else n // dp
    assert dp * pipe == n, f"{n} devices != dp {dp} × pipe {pipe}"
    arr = np.asarray(devices).reshape(dp, pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def stack_stage_params(params, names):
    """Stack identically-structured subtrees ``params[name]`` stage-major:
    every leaf gains a leading S axis (sharded over 'pipe' by
    ``pipeline_apply``, so each device materialises only its own stage)."""
    subs = [params[n] for n in names]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *subs)


def pipeline_apply(
    stage_fn,
    stacked_params,
    x,
    shared=None,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = PIPE_AXIS,
    batch_axis: str = None,
):
    """y = stage_{S-1}(... stage_0(x)) pipelined over ``mesh.shape[axis]``
    devices, bit-identical to the sequential composition on the same
    microbatch slices.

    - ``stage_fn(params_s, h, shared) -> h'`` — one stage, same shape in/out.
    - ``stacked_params``: pytree with leading S axis on every leaf
      (see ``stack_stage_params``); S must equal ``mesh.shape[axis]``.
    - ``x``: (B, ...) with B % microbatches == 0.
    - ``shared``: replicated extra inputs handed to every stage call
      (pass data here, not via closure — closed-over arrays would be
      constant-folded into the compiled loop).
    - ``batch_axis``: optional second mesh axis sharding the microbatch
      dim (dp×pp composition).

    Differentiable w.r.t. ``stacked_params``, ``x`` and ``shared``.
    """
    S = mesh.shape[axis]
    B = x.shape[0]
    assert B % microbatches == 0, (B, microbatches)
    mb = B // microbatches
    xm = x.reshape((microbatches, mb) + x.shape[1:])

    x_spec = P(None, batch_axis) if batch_axis else P()
    ring = [(i, (i + 1) % S) for i in range(S)]
    n_ticks = S + microbatches - 1

    def body(params, xm, shared):
        params = jax.tree.map(lambda p: jnp.squeeze(p, 0), params)
        stage = lax.axis_index(axis)

        def tick(carry, t):
            state, outbuf = carry
            ingest = lax.dynamic_index_in_dim(
                xm, jnp.minimum(t, microbatches - 1), 0, keepdims=False
            )
            h = jnp.where(stage == 0, ingest, state)
            out = stage_fn(params, h, shared)
            o_idx = jnp.clip(t - (S - 1), 0, microbatches - 1)
            prev = lax.dynamic_index_in_dim(outbuf, o_idx, 0, keepdims=False)
            emit = jnp.logical_and(stage == S - 1, t >= S - 1)
            outbuf = lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(emit, out, prev), o_idx, 0
            )
            state = lax.ppermute(out, axis, ring)
            return (state, outbuf), None

        carry = (jnp.zeros(xm.shape[1:], xm.dtype), jnp.zeros_like(xm))
        (_, outbuf), _ = lax.scan(tick, carry, jnp.arange(n_ticks))
        # Real outputs live on the last stage only (zeros elsewhere — the
        # emit mask); psum over 'pipe' replicates them to every stage.
        return lax.psum(
            jnp.where(stage == S - 1, outbuf, jnp.zeros_like(outbuf)), axis
        )

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), x_spec, P()),
        out_specs=x_spec,
        check_vma=False,  # axis_index-conditional emits defeat rep checking
    )(stacked_params, xm, shared)
    return out.reshape(x.shape)


def encoder_pipeline_apply(
    enc,
    params,
    x,
    pos,
    mesh: Mesh,
    *,
    microbatches: int,
    axis: str = PIPE_AXIS,
    batch_axis: str = None,
):
    """Run a ``PointTransformerEncoder`` with block 0 replicated and the
    homogeneous pure-'attn' tail pipelined over ``axis``.

    The flagship encoder (cfgs/PCN_models/AdaPoinTr.yaml, reference
    models/base_blocks.py:400-432) is ['attn-graph'] + ['attn']·(depth-1):
    the graph block needs the kNN idx and runs where the grouper output
    lives; the tail blocks are position-free global attention + MLP —
    exactly one stage each. Deterministic mode (see module docstring).

    Requires ``enc.depth - 1 == mesh.shape[axis]`` and an all-'attn' tail.
    Matches ``enc.apply`` on the same microbatch slices to float noise
    (block 0 runs full-batch here, so shape-dependent XLA fusion shifts
    the last bit ~2e-7; the combinator itself is bit-exact —
    tests/test_pipeline.py).
    """
    from ..nn.blocks import SelfAttnBlockApi
    from ..ops import knn_point

    S = mesh.shape[axis]
    tail = [f"block{i}" for i in range(1, enc.depth)]
    assert len(tail) == S, f"encoder tail {len(tail)} blocks != pipe axis {S}"
    assert set(enc.block_style_list[1:]) == {"attn"}, (
        "pipelined tail must be pure-'attn' (position-free) blocks"
    )

    common = dict(
        dim=enc.embed_dim, num_heads=enc.num_heads, mlp_ratio=enc.mlp_ratio,
        qkv_bias=enc.qkv_bias, init_values=enc.init_values,
        combine_style=enc.combine_style, k=enc.k, n_group=enc.n_group,
    )
    blk0 = SelfAttnBlockApi(block_style=enc.block_style_list[0], **common)
    idx = knn_point(enc.k, pos, pos)
    x = blk0.apply(
        {"params": params["block0"]}, x, pos, idx=idx, deterministic=True
    )

    stage_mod = SelfAttnBlockApi(block_style="attn", **common)

    def stage_fn(p, h, _shared):
        # pure-'attn' blocks never touch pos/idx (nn/blocks.py:148-151)
        return stage_mod.apply({"params": p}, h, None, deterministic=True)

    stacked = stack_stage_params(params, tail)
    return pipeline_apply(
        stage_fn, stacked, x, None,
        mesh=mesh, microbatches=microbatches, axis=axis, batch_axis=batch_axis,
    )
