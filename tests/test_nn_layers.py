"""Unit tests for nn primitives (CPU, tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from imgadapointr_tpu.nn import (
    Attention,
    BatchNorm,
    ConcatDense,
    DynamicGraphAttention,
    Mlp,
    denoise_mask,
)
from imgadapointr_tpu.nn.layers import dense


def test_concat_dense_equals_concat_matmul():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (2, 1, 5))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 3))
    m = ConcatDense(4)
    v = m.init(key, a, b)
    out = m.apply(v, a, b)
    # manual: concat(broadcast(a), b) @ [Wa; Wb] + bias
    Wa = v["params"]["part0"]["kernel"]
    Wb = v["params"]["part1"]["kernel"]
    bias = v["params"]["part0"]["bias"]
    cat = jnp.concatenate([jnp.broadcast_to(a, (2, 7, 5)), b], -1)
    want = cat @ jnp.concatenate([Wa, Wb], 0) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_attention_mask_blocks_denoise_tokens():
    """Real-query outputs must be independent of denoise-token contents."""
    key = jax.random.PRNGKey(0)
    attn = Attention(dim=16, num_heads=4, qkv_bias=True)
    x = jax.random.normal(key, (2, 10, 16))
    v = attn.init(key, x)
    mask = denoise_mask(10, 4)
    out1 = attn.apply(v, x, mask=mask)
    # perturb the denoise tokens (last 4)
    x2 = x.at[:, -4:].add(jax.random.normal(jax.random.PRNGKey(2), (2, 4, 16)))
    out2 = attn.apply(v, x2, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-4]), np.asarray(out2[:, :-4]), atol=1e-5
    )
    # denoise outputs do change
    assert np.abs(np.asarray(out1[:, -4:] - out2[:, -4:])).max() > 1e-3


def test_two_phase_knn_blocks_denoise_tokens():
    """DynamicGraphAttention with denoise_length: real tokens only see real."""
    key = jax.random.PRNGKey(0)
    mod = DynamicGraphAttention(dim=8, k=3)
    q = jax.random.normal(key, (1, 12, 8))
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 3))
    v = mod.init(key, q, pos, denoise_length=4)
    out1 = mod.apply(v, q, pos, denoise_length=4)
    q2 = q.at[:, -4:].add(1.0)
    out2 = mod.apply(v, q2, pos, denoise_length=4)
    np.testing.assert_allclose(
        np.asarray(out1[:, :-4]), np.asarray(out2[:, :-4]), atol=1e-5
    )


def test_batchnorm_torch_semantics():
    """Running stats follow torch: ra = (1-m)·ra + m·batch (unbiased var)."""
    key = jax.random.PRNGKey(0)
    bn = BatchNorm(4)
    x = jax.random.normal(key, (8, 5, 4)) * 2.0 + 1.0
    v = bn.init(key, x, use_running_average=False)
    y, upd = bn.apply(
        v, x, use_running_average=False, momentum=0.3, mutable=["batch_stats"]
    )
    xf = np.asarray(x).reshape(-1, 4)
    m = xf.mean(0)
    var_b = xf.var(0)
    var_u = xf.var(0, ddof=1)
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["mean"]), 0.7 * 0 + 0.3 * m, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(upd["batch_stats"]["var"]), 0.7 * 1 + 0.3 * var_u, rtol=1e-4
    )
    # normalised output uses biased batch var
    want = (xf - m) / np.sqrt(var_b + 1e-5)
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 4), want, atol=1e-4)


def test_gelu_is_exact_erf():
    from imgadapointr_tpu.nn import gelu

    x = jnp.linspace(-3, 3, 13)
    from scipy.stats import norm  # scipy is available in the image? guard below

    want = np.asarray(x) * norm.cdf(np.asarray(x))
    np.testing.assert_allclose(np.asarray(gelu(x)), want, atol=1e-5)
