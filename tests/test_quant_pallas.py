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


def test_groupwise_with_norm():
    x = rand((1, 2, 512, 64), key=5)
    out, s, n2 = qp.quant_int8_groupwise_pallas(x, 32, fold=0.5,
                                                with_norm=True, interpret=True)
    ref = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=3, keepdims=True)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(ref), rtol=1e-6)


def test_fixed_with_norm():
    x = rand((1, 1, 256, 64), key=6)
    scale = jnp.full((1, 1, 1, 1), 0.02, jnp.float32)
    out, n2 = qp.quant_int8_fixed_pallas(x, scale, with_norm=True,
                                         interpret=True)
    ref = jnp.sum(jnp.square(out.astype(jnp.float32)), axis=3, keepdims=True)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(ref), rtol=1e-6)


def test_groupwise_with_capmax():
    x = rand((1, 2, 512, 64), key=5)
    out, s, cap = qp.quant_int8_groupwise_pallas(x, 32, fold=0.5,
                                                 with_capmax=True,
                                                 interpret=True)
    norms = jnp.sqrt(jnp.sum(jnp.square(out.astype(jnp.float32)), axis=3,
                             keepdims=True))
    scale_rows = jnp.repeat(s[..., None], 32, axis=2).reshape(1, 2, 512, 1)
    ref = jnp.max(scale_rows * norms, axis=2, keepdims=True)
    assert cap.shape == (1, 2, 1, 1)
    np.testing.assert_allclose(np.asarray(cap), np.asarray(ref), rtol=1e-6)


def test_fixed_with_capmax_masks_pad_rows():
    x = rand((1, 1, 512, 64), key=6)
    x = x.at[:, :, 400:].set(99.0)  # pad rows must not inflate the capmax
    scale = jnp.full((1, 1, 1, 1), 0.02, jnp.float32)
    km = jnp.mean(x[:, :, :400].astype(jnp.float32), axis=2, keepdims=True)
    out, cap = qp.quant_int8_fixed_pallas(x, scale, sub=km, with_capmax=True,
                                          s_true=400, interpret=True)
    norms = jnp.sqrt(jnp.sum(jnp.square(out[:, :, :400].astype(jnp.float32)),
                             axis=3))
    ref = jnp.max(norms, axis=2)[:, :, None, None]  # scalar-mode: no scale
    assert cap.shape == (1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(cap), np.asarray(ref), rtol=1e-6)


def test_channel_stats():
    x = rand((1, 2, 512, 64), key=7, scale=3.0)
    s_true = 400  # pad rows (>= 400) must not contaminate the stats
    x = x.at[:, :, 400:].set(99.0)
    mean, amax = qp.channel_stats_pallas(x, s_true, interpret=True)
    ref_mean = jnp.mean(x[:, :, :400].astype(jnp.float32), axis=2, keepdims=True)
    ref_amax = jnp.max(jnp.abs(x[:, :, :400].astype(jnp.float32) - ref_mean),
                       axis=2, keepdims=True)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(amax), np.asarray(ref_amax),
                               rtol=1e-5, atol=1e-5)


def test_groupwise_with_dot():
    x = rand((1, 4, 256, 64), key=8)
    w8 = (rand((1, 2, 256, 64), key=9) * 30).astype(jnp.int8)  # GQA operand
    out, s, n2, dot = qp.quant_int8_groupwise_pallas(
        x, 4, fold=0.3, with_norm=True, dot_with=w8, interpret=True)
    w_rep = jnp.repeat(w8, 2, axis=1).astype(jnp.float32)
    ref = jnp.sum(out.astype(jnp.float32) * w_rep, axis=3, keepdims=True)
    np.testing.assert_allclose(np.asarray(dot), np.asarray(ref), rtol=1e-6)


class TestNhdInput:
    """NHD (B,S,H,D) inputs read directly by the quant kernels (r3): the
    layout change rides the existing single read — no transpose pass."""

    def test_groupwise_nhd_matches_hnd(self):
        # NHD contract: group scales come back PER ROW [B,H,S,1]
        x_hnd = rand((2, 3, 256, 64), key=11)
        x_nhd = jnp.swapaxes(x_hnd, 1, 2)
        out_h, s_h = qp.quant_int8_groupwise_pallas(x_hnd, 32, fold=0.7,
                                                    interpret=True)
        out_n, s_n = qp.quant_int8_groupwise_pallas(x_nhd, 32, fold=0.7,
                                                    in_layout="NHD",
                                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(out_n), np.asarray(out_h))
        s_h_rows = quant.expand_scales_rows(s_h, 32, 256)
        assert s_n.shape == (2, 3, 256, 1)
        np.testing.assert_allclose(np.asarray(s_n), np.asarray(s_h_rows))

    def test_groupwise_nhd_capmax(self):
        x_hnd = rand((1, 2, 512, 64), key=12)
        x_nhd = jnp.swapaxes(x_hnd, 1, 2)
        out_h, s_h, cap_h = qp.quant_int8_groupwise_pallas(
            x_hnd, 32, with_capmax=True, interpret=True)
        out_n, s_n, cap_n = qp.quant_int8_groupwise_pallas(
            x_nhd, 32, with_capmax=True, in_layout="NHD", interpret=True)
        np.testing.assert_array_equal(np.asarray(out_n), np.asarray(out_h))
        np.testing.assert_allclose(np.asarray(cap_n), np.asarray(cap_h))

    def test_fixed_nhd_with_sub(self):
        x_hnd = rand((1, 2, 256, 64), key=13)
        x_nhd = jnp.swapaxes(x_hnd, 1, 2)
        sub = jnp.mean(x_hnd, axis=2, keepdims=True)
        amax = jnp.max(jnp.abs(x_hnd - sub), axis=2, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        out_h = qp.quant_int8_fixed_pallas(x_hnd, scale, sub=sub,
                                           interpret=True)
        out_n = qp.quant_int8_fixed_pallas(x_nhd, scale, sub=sub,
                                           in_layout="NHD", interpret=True)
        np.testing.assert_array_equal(np.asarray(out_n), np.asarray(out_h))

    def test_channel_stats_nhd(self):
        x_hnd = rand((1, 2, 512, 64), key=14, scale=3.0)
        x_nhd = jnp.swapaxes(x_hnd, 1, 2)
        m_h, a_h = qp.channel_stats_pallas(x_hnd, 512, interpret=True)
        m_n, a_n = qp.channel_stats_pallas(x_nhd, 512, in_layout="NHD",
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(m_n), np.asarray(m_h))
        np.testing.assert_allclose(np.asarray(a_n), np.asarray(a_h))


class TestSegmentedQuant:
    """Segment-aware fused quant (varlen prep, r3): scales confined to
    (group ∩ segment) via the in-kernel run-max."""

    def _ref(self, x, seg, group, fold=1.0, sub=None):
        return quant.quant_int8_groupwise_segmented(x, seg, group,
                                                    fold=fold, sub=sub)

    def test_matches_jnp_segmented(self):
        x = rand((1, 2, 512, 64), key=21)
        seg = jnp.array(([0] * 100 + [1] * 300 + [2] * 112), jnp.int32)
        out, srow = qp.quant_int8_segmented_pallas(x, seg, 32,
                                                   interpret=True)
        out_j, srow_j = self._ref(x, seg, 32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_j))
        np.testing.assert_allclose(np.asarray(srow[..., 0]),
                                   np.asarray(srow_j), rtol=1e-6)

    def test_norm_dot_capmax(self):
        x = rand((1, 2, 512, 64), key=22)
        w8 = (rand((1, 2, 512, 64), key=23) * 30).astype(jnp.int8)
        seg = jnp.array([0] * 200 + [1] * 312, jnp.int32)
        out, srow, n2, dot, cap = qp.quant_int8_segmented_pallas(
            x, seg, 32, fold=0.4, with_norm=True, dot_with=w8,
            with_capmax=True, s_true=512, interpret=True)
        of = out.astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(n2[..., 0]),
            np.asarray(jnp.sum(of * of, axis=3)), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(dot[..., 0]),
            np.asarray(jnp.sum(of * w8.astype(jnp.float32), axis=3)),
            rtol=1e-6)
        norms = jnp.sqrt(jnp.sum(of * of, axis=3, keepdims=True))
        ref_cap = jnp.max(srow * norms, axis=2, keepdims=True)
        np.testing.assert_allclose(np.asarray(cap), np.asarray(ref_cap),
                                   rtol=1e-6)

    def test_outlier_isolated_between_segments(self):
        x = rand((1, 1, 256, 64), key=24)
        x = x.at[:, :, 100:].mul(100.0)  # outlier segment
        seg = jnp.array([0] * 100 + [1] * 156, jnp.int32)
        out, srow = qp.quant_int8_segmented_pallas(x, seg, 128,
                                                   interpret=True)
        # segment-0 rows inside the straddling group 0..127 must use
        # segment-0-only scales: max|x| over rows 0..99 / 127
        seg0_amax = float(jnp.max(jnp.abs(x[:, :, :100])))
        np.testing.assert_allclose(np.asarray(srow[0, 0, :100, 0]),
                                   seg0_amax / 127.0, rtol=1e-6)
        # and the jnp segmented quantizer agrees everywhere
        out_j, srow_j = self._ref(x, seg, 128)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_j))
        np.testing.assert_allclose(np.asarray(srow[..., 0]),
                                   np.asarray(srow_j), rtol=1e-6)


class TestMergedKvPrep:
    """r3: K+V stats and K+V quant merged into single launches for the
    flagship combination — must agree exactly with the separate kernels."""

    def test_stats2_matches_singles(self):
        k = rand((1, 2, 512, 64), key=31, scale=2.0)
        v = rand((1, 2, 512, 64), key=32, scale=3.0)
        km2, ka2, vm2, va2 = qp.channel_stats2_pallas(k, v, 400,
                                                      interpret=True)
        km1, ka1 = qp.channel_stats_pallas(k, 400, interpret=True)
        vm1, va1 = qp.channel_stats_pallas(v, 400, interpret=True)
        for a, b in ((km2, km1), (ka2, ka1), (vm2, vm1), (va2, va1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_quant_kv_matches_singles(self):
        k = rand((1, 2, 512, 64), key=33)
        v = rand((1, 2, 512, 64), key=34)
        km, ka = qp.channel_stats_pallas(k, 512, interpret=True)
        vm, va = qp.channel_stats_pallas(v, 512, interpret=True)
        ks = jnp.max(ka, axis=3, keepdims=True) / 127.0
        vs = jnp.where(va > 0, va / 127.0, 1.0)
        k8m, v8m, cap_m = qp.quant_kv_pallas(k, ks, km, v, vs, vm,
                                             with_capmax=True, s_true=512,
                                             interpret=True)
        k8s, cap_s = qp.quant_int8_fixed_pallas(k, ks, sub=km,
                                                with_capmax=True, s_true=512,
                                                interpret=True)
        v8s = qp.quant_int8_fixed_pallas(v, vs, sub=vm, interpret=True)
        np.testing.assert_array_equal(np.asarray(k8m), np.asarray(k8s))
        np.testing.assert_array_equal(np.asarray(v8m), np.asarray(v8s))
        np.testing.assert_allclose(np.asarray(cap_m), np.asarray(cap_s),
                                   rtol=1e-6)

    def test_flagship_pipeline_merged_equals_separate(self):
        from sageattention_tpu.core import _sage_attention
        from sageattention_tpu.ops.reference import sdpa
        from sageattention_tpu.utils.testing import calc_diff
        ks_ = jax.random.split(jax.random.PRNGKey(35), 3)
        q, k, v = (jax.random.normal(kk, (1, 2, 512, 64), jnp.float32)
                   for kk in ks_)
        # the flagship combination routes through the merged launches
        # (fuse_q_quant pinned off: this test isolates the K/V prep math,
        # and the in-kernel Q quant uses finer per-row scales)
        out = _sage_attention(q, k, v, pv_dtype="int8", k_scale_mode="head",
                              use_fused=True, interpret=True,
                              fuse_q_quant=False)
        # separate-launch result via smooth_v False ... instead compare to
        # the jnp pipeline (identical math) and the oracle
        ref = _sage_attention(q, k, v, pv_dtype="int8", k_scale_mode="head",
                              use_fused=False, interpret=True)
        assert calc_diff(out, ref) < 2e-5
        assert calc_diff(out, sdpa(q, k, v)) < 1.5e-3


class TestOnepassPrep:
    """r3: single-read K/V prep (stats + scale + quant in one launch) —
    must agree with the two-pass kernels (same reduce order at one-block
    sizes, so int8 outputs match exactly)."""

    def test_prep_k_matches_two_pass(self):
        k = rand((1, 2, 512, 64), key=41, scale=2.0)
        k8_1, km_1, ka_1, cap_1 = qp.prep_k_onepass_pallas(
            k, 400, with_capmax=True, interpret=True)
        km_2, kach = qp.channel_stats_pallas(k, 400, interpret=True)
        ka_2 = jnp.max(kach, axis=3, keepdims=True)
        ks = jnp.where(ka_2 > 0, ka_2 * (1.0 / 127.0), 1.0)
        k8_2, cap_2 = qp.quant_int8_fixed_pallas(
            k, ks, sub=km_2, with_capmax=True, s_true=400, interpret=True)
        np.testing.assert_allclose(np.asarray(km_1), np.asarray(km_2),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ka_1), np.asarray(ka_2),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(k8_1), np.asarray(k8_2))
        np.testing.assert_allclose(np.asarray(cap_1), np.asarray(cap_2),
                                   rtol=1e-6)

    def test_prep_v_matches_two_pass(self):
        v = rand((1, 2, 512, 64), key=42, scale=3.0)
        v8_1, vm_1, va_1 = qp.prep_v_onepass_pallas(v, 512, interpret=True)
        vm_2, va_2 = qp.channel_stats_pallas(v, 512, interpret=True)
        vs = jnp.where(va_2 > 0, va_2 * (1.0 / 127.0), 1.0)
        v8_2 = qp.quant_int8_fixed_pallas(v, vs, sub=vm_2, interpret=True)
        np.testing.assert_allclose(np.asarray(vm_1), np.asarray(vm_2),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(va_1), np.asarray(va_2),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(v8_1), np.asarray(v8_2))

    def test_flagship_pipeline_onepass_equals_jnp(self):
        from sageattention_tpu.core import _sage_attention
        from sageattention_tpu.ops.reference import sdpa
        from sageattention_tpu.utils.testing import calc_diff
        ks_ = jax.random.split(jax.random.PRNGKey(43), 3)
        q, k, v = (jax.random.normal(kk, (1, 2, 640, 64), jnp.float32)
                   for kk in ks_)
        # unaligned S=640 pads up; flagship combination routes through the
        # one-pass prep (slice well under ONEPASS_MAX_ELS); fuse_q_quant
        # pinned off to isolate the prep math
        out = _sage_attention(q, k, v, pv_dtype="int8", k_scale_mode="head",
                              use_fused=True, interpret=True,
                              fuse_q_quant=False)
        ref = _sage_attention(q, k, v, pv_dtype="int8", k_scale_mode="head",
                              use_fused=False, interpret=True)
        assert calc_diff(out, ref) < 2e-5
        assert calc_diff(out, sdpa(q, k, v)) < 1.5e-3
