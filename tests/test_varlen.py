"""Varlen (ragged) attention vs per-sequence dense loop (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sageattention_tpu as sa
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.varlen import cu_seqlens_to_segment_ids
from sageattention_tpu.utils.testing import calc_diff


def packed(lengths, H=2, D=64, key=0):
    total = sum(lengths)
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (total, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (total, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (total, H, D), jnp.float32)
    cu = jnp.array(np.cumsum([0] + list(lengths)), jnp.int32)
    return q, k, v, cu


def dense_loop_oracle(q, k, v, cu, is_causal):
    outs = []
    bounds = np.asarray(cu)
    for a, b in zip(bounds[:-1], bounds[1:]):
        o = sdpa(jnp.swapaxes(q[a:b][None], 1, 2), jnp.swapaxes(k[a:b][None], 1, 2),
                 jnp.swapaxes(v[a:b][None], 1, 2), is_causal=is_causal)
        outs.append(jnp.swapaxes(o[0], 0, 1))
    return jnp.concatenate(outs, axis=0)


class TestSegmentIds:
    def test_conversion(self):
        cu = jnp.array([0, 3, 3, 7], jnp.int32)  # includes empty sequence
        seg = np.asarray(cu_seqlens_to_segment_ids(cu, 8))
        np.testing.assert_array_equal(seg[:7], [0, 0, 0, 2, 2, 2, 2])


@pytest.mark.parametrize("causal", [False, True], ids=["full", "causal"])
class TestVarlen:
    def test_matches_dense_loop(self, causal):
        lengths = [100, 300, 112]
        q, k, v, cu = packed(lengths)
        out = sa.sageattn_varlen(q, k, v, cu, cu, max(lengths), max(lengths),
                                 is_causal=causal, pv_dtype="bf16")
        ref = dense_loop_oracle(q, k, v, cu, causal)
        assert out.shape == q.shape
        assert calc_diff(out, ref) < 1e-3

    def test_single_sequence_matches_dense(self, causal):
        q, k, v, cu = packed([256])
        out = sa.sageattn_varlen(q, k, v, cu, cu, 256, 256, is_causal=causal,
                                 pv_dtype="bf16")
        dense = sa.sageattn_qk_int8_pv_bf16(
            jnp.swapaxes(q[None], 1, 2), jnp.swapaxes(k[None], 1, 2),
            jnp.swapaxes(v[None], 1, 2), is_causal=causal)
        assert calc_diff(out, jnp.swapaxes(dense[0], 0, 1)) < 2e-4


class TestVarlenModes:
    def test_int8_pv(self):
        q, k, v, cu = packed([128, 128])
        out = sa.sageattn_varlen(q, k, v, cu, cu, 128, 128, pv_dtype="int8")
        assert calc_diff(out, dense_loop_oracle(q, k, v, cu, False)) < 1.5e-3

    def test_lse(self):
        q, k, v, cu = packed([100, 156])
        out, lse = sa.sageattn_varlen(q, k, v, cu, cu, 156, 156,
                                      pv_dtype="bf16", return_lse=True)
        assert lse.shape == (q.shape[1], q.shape[0])
        assert bool(jnp.all(jnp.isfinite(lse)))
