"""Fused Pallas quant kernels vs the pure-jnp reference quantizers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.ops import quant
from sageattention_tpu.ops import quant_pallas as qp


def rand(shape, key=0, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


@pytest.mark.parametrize("group", [4, 32, 128])
def test_groupwise_matches_jnp(group):
    x = rand((1, 2, 512, 64))
    out_p, s_p = qp.quant_int8_groupwise_pallas(x, group, fold=0.7, interpret=True)
    out_j, s_j = quant.quant_int8_groupwise(x, group, fold=0.7)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_j), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_j))


def test_groupwise_with_sub():
    x = rand((1, 1, 256, 64), key=1)
    sub = rand((1, 1, 1, 64), key=2)
    out_p, s_p = qp.quant_int8_groupwise_pallas(x, 32, sub=sub, interpret=True)
    out_j, s_j = quant.quant_int8_groupwise(x, 32, sub=sub)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_j), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_j))


def test_fixed_scalar_scale():
    x = rand((1, 2, 256, 64), key=3)
    amax = jnp.max(jnp.abs(x), axis=(2, 3), keepdims=True)
    scale = amax / 127.0
    out = qp.quant_int8_fixed_pallas(x, scale, interpret=True)
    ref = jnp.clip(jnp.rint(x / scale), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fixed_channel_scale():
    x = rand((1, 2, 256, 64), key=4)
    sub = jnp.mean(x, axis=2, keepdims=True)
    amax = jnp.max(jnp.abs(x - sub), axis=2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    out = qp.quant_int8_fixed_pallas(x, scale, sub=sub, interpret=True)
    ref = jnp.clip(jnp.rint((x - sub) / scale), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_unaligned_seq_uses_smaller_block():
    x = rand((1, 1, 384, 64), key=5)
    out_p, s_p = qp.quant_int8_groupwise_pallas(x, 32, interpret=True)
    out_j, s_j = quant.quant_int8_groupwise(x, 32)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_j))
