"""Unit tests for the quantization front end (SURVEY.md §4: quant kernels vs
pure-jnp reference quantizers; exact scale-shape contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.ops import quant


def rand(shape, key=0, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * scale


class TestGroupQuant:
    def test_roundtrip_error_bounded(self):
        x = rand((2, 4, 256, 64))
        x_i8, s = quant.quant_int8_groupwise(x, 128)
        x_dq = quant.dequant_int8_groupwise(x_i8, s, 128)
        # max quant error is scale/2 per element
        err = jnp.abs(x_dq - x)
        bound = jnp.repeat(s, 128, axis=2)[..., None] * 0.5 + 1e-6
        assert bool(jnp.all(err <= bound))

    def test_scale_shapes(self):
        x = rand((2, 4, 256, 64))
        for group, n in [(128, 2), (64, 4), (32, 8), (4, 64), (16, 16)]:
            _, s = quant.quant_int8_groupwise(x, group)
            assert s.shape == (2, 4, n)

    def test_zero_block_safe(self):
        x = jnp.zeros((1, 1, 128, 64))
        x_i8, s = quant.quant_int8_groupwise(x, 128)
        assert bool(jnp.all(x_i8 == 0))
        assert bool(jnp.all(jnp.isfinite(s)))

    def test_symmetric_range(self):
        x = rand((1, 2, 128, 64), scale=100.0)
        x_i8, _ = quant.quant_int8_groupwise(x, 64)
        assert int(jnp.max(jnp.abs(x_i8.astype(jnp.int32)))) <= 127

    def test_fold_and_sub(self):
        x = rand((1, 1, 128, 8))
        sub = jnp.full((1, 1, 1, 8), 0.5)
        x_i8, s = quant.quant_int8_groupwise(x, 128, fold=2.0, sub=sub)
        x_dq = quant.dequant_int8_groupwise(x_i8, s, 128)
        np.testing.assert_allclose(
            np.asarray(x_dq), np.asarray((x - 0.5) * 2.0), atol=float(s.max()) * 0.51)


class TestReferenceContracts:
    """Scale shapes must match the reference contracts (SURVEY.md §2.1)."""

    def test_per_block(self):
        q = rand((2, 4, 256, 64))
        k = rand((2, 4, 256, 64), key=1)
        q_i8, qs, k_i8, ks = quant.per_block_int8(q, k)
        assert qs.shape == (2, 4, 256 // 128)
        assert ks.shape == (2, 4, 256 // 64)
        assert q_i8.dtype == jnp.int8 and k_i8.dtype == jnp.int8

    def test_per_warp(self):
        q = rand((2, 4, 256, 64))
        k = rand((2, 4, 256, 64), key=1)
        _, qs, _, ks = quant.per_warp_int8(q, k)
        assert qs.shape == (2, 4, 256 // 32)
        assert ks.shape == (2, 4, 256 // 64)

    def test_per_thread(self):
        q = rand((2, 4, 256, 64))
        k = rand((2, 4, 256, 64), key=1)
        _, qs, _, ks = quant.per_thread_int8(q, k)
        assert qs.shape == (2, 4, 256 // 4)
        assert ks.shape == (2, 4, 256 // 16)

    def test_nhd_layout(self):
        q = rand((2, 256, 4, 64))
        k = rand((2, 256, 4, 64), key=1)
        q_i8, qs, k_i8, ks = quant.per_block_int8(q, k, tensor_layout="NHD")
        assert q_i8.shape == q.shape
        assert qs.shape == (2, 4, 2)

    def test_sm_scale_fold(self):
        """Q quant must fold sm_scale*log2e (triton/quant_per_block.py:87)."""
        q = jnp.ones((1, 1, 128, 64))
        k = rand((1, 1, 128, 64), key=1)
        _, qs1, _, _ = quant.per_block_int8(q, k, sm_scale=1.0)
        _, qs2, _, _ = quant.per_block_int8(q, k, sm_scale=2.0)
        np.testing.assert_allclose(np.asarray(qs2), np.asarray(qs1) * 2.0, rtol=1e-6)

    def test_k_smoothing_subtracts_mean(self):
        k = rand((1, 2, 256, 64), key=3) + 7.0  # big common-mode offset
        q = rand((1, 2, 256, 64))
        km = quant.k_mean(k)
        np.testing.assert_allclose(np.asarray(km)[..., 0, :],
                                   np.asarray(k.mean(axis=2)), rtol=1e-5)
        _, _, k_i8, ks = quant.per_block_int8(q, k, km=km)
        # with the offset removed, scales should be ~ amax of the centered k
        assert float(ks.max()) < 0.1  # centered N(0,1): amax/127 ~ 0.03


class TestVQuant:
    def test_sub_mean(self):
        v = rand((1, 2, 256, 64), key=5) + 3.0
        v_sm, vm = quant.sub_mean(v)
        assert v_sm.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(v_sm.astype(jnp.float32) + vm), np.asarray(v), atol=0.05)

    def test_per_channel_int8(self):
        v = rand((1, 2, 256, 64), key=6)
        v_i8, vs, vm = quant.per_channel_int8(v, smooth_v=True)
        assert v_i8.shape == v.shape and vs.shape == (1, 2, 64)
        v_dq = v_i8.astype(jnp.float32) * vs[:, :, None, :] + vm
        assert float(jnp.abs(v_dq - v).max()) < float(vs.max()) * 0.51 + 1e-5

    def test_per_channel_fp8(self):
        v = rand((1, 2, 256, 64), key=7)
        v_f8, vs, vm = quant.per_channel_fp8(v, smooth_v=False)
        assert v_f8.dtype == jnp.float8_e4m3fn
        assert vm is None
        v_dq = v_f8.astype(jnp.float32) * vs[:, :, None, :]
        # e4m3 relative error <= 2^-4 on the mantissa
        rel = jnp.abs(v_dq - v) / (jnp.abs(v) + 1e-6)
        assert float(jnp.median(rel)) < 0.05

    def test_scale_max_respected(self):
        v = rand((1, 1, 128, 64), key=8, scale=10.0)
        v_f8, vs, _ = quant.per_channel_fp8(v, scale_max=2.25, smooth_v=False)
        assert float(jnp.abs(v_f8.astype(jnp.float32)).max()) <= 2.25 + 1e-3


class TestScaleExpansion:
    def test_rows(self):
        s = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8)
        e = quant.expand_scales_rows(s, 32, 256)
        assert e.shape == (1, 1, 256, 1)
        assert float(e[0, 0, 33, 0]) == 1.0

    def test_cols(self):
        s = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4)
        e = quant.expand_scales_cols(s, 64, 256)
        assert e.shape == (1, 1, 1, 256)
        assert float(e[0, 0, 0, 65]) == 1.0
