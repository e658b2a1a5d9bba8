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


class TestVarlenAdversarial:
    """Quant-group boundary hardening: scales must not couple sequences."""

    def test_outlier_sequence_does_not_poison_neighbor(self):
        # seq A ends mid-group (100 % 4 != 0); seq B opens with a 1000x
        # outlier in the straddling group.  Segment-aware scales keep A's
        # quantization unaffected; group-blind scales would crush A's rows
        # sharing the group to ~0 codes.
        lengths = [100, 156]
        q, k, v, cu = packed(lengths, key=7)
        q = q.at[100].mul(1000.0)
        k = k.at[100].mul(1000.0)
        out = sa.sageattn_varlen(q, k, v, cu, cu, 156, 156,
                                 is_causal=False, pv_dtype="bf16",
                                 qk_quant_gran="per_thread")
        ref = dense_loop_oracle(q, k, v, cu, False)
        # compare only sequence A (the victim)
        assert calc_diff(out[:100], ref[:100]) < 1e-3

    def test_group_straddles_boundary_per_block(self):
        # per_block = 128-row Q groups; boundaries at 50/130 straddle them
        lengths = [50, 80, 126]
        q, k, v, cu = packed(lengths, key=9)
        k = k.at[50].mul(500.0)  # outlier at the head of sequence B
        out = sa.sageattn_varlen(q, k, v, cu, cu, 126, 126,
                                 is_causal=False, pv_dtype="bf16",
                                 qk_quant_gran="per_block")
        ref = dense_loop_oracle(q, k, v, cu, False)
        assert calc_diff(out[:50], ref[:50]) < 1e-3
        assert calc_diff(out[130:], ref[130:]) < 1e-3

    def test_causal_requires_matching_cu_seqlens(self):
        q, k, v, cu = packed([128, 128])
        cu_k = jnp.array([0, 100, 256], jnp.int32)
        with pytest.raises(ValueError, match="cu_seqlens_q == cu_seqlens_k"):
            sa.sageattn_varlen(q, k, v, cu, cu_k, 128, 156, is_causal=True)

    def test_attn_mask_bool(self):
        lengths = [100, 120]
        q, k, v, cu = packed(lengths, key=3)
        T = sum(lengths)
        keep = jax.random.bernoulli(jax.random.PRNGKey(1), 0.9, (T, T))
        out = sa.sageattn_varlen(q, k, v, cu, cu, 120, 120,
                                 pv_dtype="bf16", attn_mask=keep)
        # oracle: dense per-sequence loop with the corresponding mask slice
        outs = []
        bounds = np.asarray(cu)
        for a, b in zip(bounds[:-1], bounds[1:]):
            o = sdpa(jnp.swapaxes(q[a:b][None], 1, 2),
                     jnp.swapaxes(k[a:b][None], 1, 2),
                     jnp.swapaxes(v[a:b][None], 1, 2),
                     mask=keep[None, None, a:b, a:b])
            outs.append(jnp.swapaxes(o[0], 0, 1))
        ref = jnp.concatenate(outs, axis=0)
        assert calc_diff(out, ref) < 1e-3


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


class TestVarlenStaticSoftmax:
    """auto resolves to the static (flagship) softmax when the q/k packings
    match; safety falls back to the online kernel via lax.cond."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_static_matches_online(self, causal):
        q, k, v, cu = packed([100, 156], key=3)
        st = sa.sageattn_varlen(q, k, v, cu, cu, 156, 156, is_causal=causal,
                                pv_dtype="bf16", softmax_mode="static")
        on = sa.sageattn_varlen(q, k, v, cu, cu, 156, 156, is_causal=causal,
                                pv_dtype="bf16", softmax_mode="online")
        oracle = dense_loop_oracle(q, k, v, cu, causal)
        assert calc_diff(st, oracle) < 1e-3
        # same quantization pipeline, only softmax bookkeeping differs
        assert calc_diff(st, on) < 2e-5

    def test_unsafe_falls_back_online(self):
        # x50 magnitudes: the cap exceeds the exp2 budget, the global
        # predicate flips, and every row runs the online kernel (a static
        # run without the fallback would overflow to nan)
        q, k, v, cu = packed([100, 156], key=4)
        q, k = q * 50.0, k * 50.0
        out = sa.sageattn_varlen(q, k, v, cu, cu, 156, 156,
                                 softmax_mode="static")
        assert bool(jnp.all(jnp.isfinite(out)))
        # quant error at x50 magnitudes is inherently ~2e-2 (int8 logits on
        # near-one-hot softmax); the same bar the x100 single-chip tests use
        assert calc_diff(out, dense_loop_oracle(q, k, v, cu, False)) < 3e-2

    def test_auto_requires_matching_pack(self):
        # different k packing (same totals): auto must stay online — and
        # still be correct
        q, k, v, cu = packed([100, 156], key=5)
        cu_k = jnp.array([0, 128, 256], jnp.int32)
        out = sa.sageattn_varlen(q, k, v, cu, cu_k, 156, 156)
        bounds_q, bounds_k = np.asarray(cu), np.asarray(cu_k)
        outs = []
        for (a, b), (c, d) in zip(zip(bounds_q[:-1], bounds_q[1:]),
                                  zip(bounds_k[:-1], bounds_k[1:])):
            o = sdpa(jnp.swapaxes(q[a:b][None], 1, 2),
                     jnp.swapaxes(k[c:d][None], 1, 2),
                     jnp.swapaxes(v[c:d][None], 1, 2))
            outs.append(jnp.swapaxes(o[0], 0, 1))
        assert calc_diff(out, jnp.concatenate(outs, 0)) < 1e-3


class TestVarlenGuards:
    """Loud failures for configurations that would silently corrupt masks
    or safety bounds (r2 VERDICT weak #5, r2 ADVICE #1)."""

    def test_traced_causal_mismatched_packings_raise(self):
        # jitting with two DIFFERENT traced cu_seqlens arrays cannot be
        # verified equal -> must raise instead of silently misaligning the
        # causal mask
        q, k, v, cu = packed([128, 128])
        cu_k = jnp.array([0, 100, 256], jnp.int32)

        @jax.jit
        def f(q, k, v, cq, ck):
            return sa.sageattn_varlen(q, k, v, cq, ck, is_causal=True)

        with pytest.raises(ValueError, match="SAME array"):
            f(q, k, v, cu, cu_k)

    def test_traced_causal_same_array_ok(self):
        # the same array object for both packings is provably matched even
        # under tracing
        q, k, v, cu = packed([100, 156])

        @jax.jit
        def f(q, k, v, cu):
            return sa.sageattn_varlen(q, k, v, cu, cu, is_causal=True)

        out = f(q, k, v, cu)
        assert calc_diff(out, dense_loop_oracle(q, k, v, cu, True)) < 1e-3

    def test_explicit_static_mismatched_packings_raise(self):
        # explicit softmax_mode="static" with equal totals but different
        # packings: the diagonal safety anchor is invalid -> loud error
        # (ADVICE r2: previously approved an invalid bound)
        q, k, v, cu = packed([100, 156], key=5)
        cu_k = jnp.array([0, 128, 256], jnp.int32)
        with pytest.raises(ValueError, match="matching q/k packings"):
            sa.sageattn_varlen(q, k, v, cu, cu_k, softmax_mode="static")


class TestVarlenFusedPrep:
    """The fused (Pallas) varlen prep must agree with the jnp prep — same
    interpret backend, only the quant/prep implementation differs."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_fused_matches_jnp_prep(self, causal):
        q, k, v = packed([100, 156], key=12)[:3]
        cu = jnp.array([0, 100, 256], jnp.int32)
        a = sa.sageattn_varlen(q, k, v, cu, cu, is_causal=causal,
                               pv_dtype="int8", compute_dtype="native",
                               use_fused=True)
        b = sa.sageattn_varlen(q, k, v, cu, cu, is_causal=causal,
                               pv_dtype="int8", compute_dtype="native",
                               use_fused=False)
        assert calc_diff(a, b) < 2e-4
        assert calc_diff(a, dense_loop_oracle(q, k, v, cu, causal)) < 1.5e-3

    def test_fused_static_safety_stats(self):
        # static mode with the fused safety stats must match online
        q, k, v = packed([100, 156], key=13)[:3]
        cu = jnp.array([0, 100, 256], jnp.int32)
        st = sa.sageattn_varlen(q, k, v, cu, cu, softmax_mode="static",
                                pv_dtype="int8", compute_dtype="native",
                                use_fused=True)
        on = sa.sageattn_varlen(q, k, v, cu, cu, softmax_mode="online",
                                pv_dtype="int8", compute_dtype="native",
                                use_fused=True)
        assert calc_diff(st, on) < 2e-5

    def test_fused_unsafe_falls_back(self):
        q, k, v = packed([100, 156], key=14)[:3]
        q, k = q * 50.0, k * 50.0
        cu = jnp.array([0, 100, 256], jnp.int32)
        out = sa.sageattn_varlen(q, k, v, cu, cu, softmax_mode="static",
                                 pv_dtype="int8", compute_dtype="native",
                                 use_fused=True)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestVarlenFuseQQuant:
    """r3 in-kernel Q quant on the varlen path: per-row scales are
    segment-correct by construction, the Q-quant launch disappears, and
    static safety is the exact post-hoc lmin check — valid for ANY
    packing (the predictive diagonal anchor needed matching packings)."""

    @pytest.mark.parametrize("comp", ["native", "bf16"])
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_oracle(self, comp, causal):
        q, k, v, cu = packed([100, 300, 112], H=4, key=21)
        out = sa.sageattn_varlen(q, k, v, cu, cu, is_causal=causal,
                                 pv_dtype="int8", compute_dtype=comp,
                                 use_fused=True)
        assert calc_diff(out, dense_loop_oracle(q, k, v, cu, causal)) < 1.5e-3
        # at least as accurate as the pre-quantized pipeline
        pre = sa.sageattn_varlen(q, k, v, cu, cu, is_causal=causal,
                                 pv_dtype="int8", compute_dtype=comp,
                                 use_fused=True, fuse_q_quant=False)
        d_f = calc_diff(out, dense_loop_oracle(q, k, v, cu, causal))
        d_p = calc_diff(pre, dense_loop_oracle(q, k, v, cu, causal))
        assert d_f < d_p * 1.5 + 1e-6

    def test_mismatched_pack_static_allowed_and_exact(self):
        # the post-hoc check makes static safe for mismatched packings —
        # previously a loud ValueError
        q, k, v, cu = packed([100, 156], key=22)
        cu_k = jnp.array([0, 128, 256], jnp.int32)
        out = sa.sageattn_varlen(q, k, v, cu, cu_k, softmax_mode="static",
                                 pv_dtype="int8", compute_dtype="native",
                                 use_fused=True)
        bounds_q, bounds_k = np.asarray(cu), np.asarray(cu_k)
        outs = []
        for (a, b), (c, d) in zip(zip(bounds_q[:-1], bounds_q[1:]),
                                  zip(bounds_k[:-1], bounds_k[1:])):
            o = sdpa(jnp.swapaxes(q[a:b][None], 1, 2),
                     jnp.swapaxes(k[c:d][None], 1, 2),
                     jnp.swapaxes(v[c:d][None], 1, 2))
            outs.append(jnp.swapaxes(o[0], 0, 1))
        assert calc_diff(out, jnp.concatenate(outs, 0)) < 1e-3
        # without the fused path it must still refuse
        with pytest.raises(ValueError, match="packings"):
            sa.sageattn_varlen(q, k, v, cu, cu_k, softmax_mode="static",
                               pv_dtype="int8", compute_dtype="native",
                               use_fused=False)

    def test_underflow_pack_falls_back_online(self):
        # x60 inputs: every logit sits thousands of log2-units below the
        # Cauchy-Schwarz cap, so the kernel's min row denominator is 0 and
        # the post-hoc check must rerun online.  Had static run unguarded,
        # whole rows would collapse to ~0 and the oracle diff would be ~1.
        # (No bitwise check vs direct online: the fallback branch keeps
        # pv_via_bf16 P numerics by design — attention.py:110-113.)
        q, k, v, cu = packed([100, 156], key=23)
        q, k = q * 60.0, k * 60.0
        out = sa.sageattn_varlen(q, k, v, cu, cu, softmax_mode="static",
                                 pv_dtype="int8", compute_dtype="native",
                                 use_fused=True)
        ref = sa.sageattn_varlen(q, k, v, cu, cu, softmax_mode="online",
                                 pv_dtype="int8", compute_dtype="native",
                                 use_fused=True)
        # extreme-magnitude int8 logits degrade ~1e-2 vs the oracle
        # (inherent); both paths must agree with it and with each other
        oracle = dense_loop_oracle(q, k, v, cu, False)
        assert calc_diff(out, oracle) < 5e-2
        assert calc_diff(ref, oracle) < 5e-2
        assert calc_diff(out, ref) < 1e-2

    def test_gqa_fold_rows(self):
        # bf16-compute path: per-(head, segment) K scale rides the
        # fuse_k_rows input, repeated across GQA groups
        q, k, v, cu = packed([60, 196], H=4, key=24)
        k, v = k[:, :2], v[:, :2]
        out = sa.sageattn_varlen(q, k, v, cu, cu, pv_dtype="int8",
                                 compute_dtype="bf16", use_fused=True)
        outs = []
        bounds = np.asarray(cu)
        for a, b in zip(bounds[:-1], bounds[1:]):
            o = sdpa(jnp.swapaxes(q[a:b][None], 1, 2),
                     jnp.swapaxes(k[a:b][None], 1, 2),
                     jnp.swapaxes(v[a:b][None], 1, 2))
            outs.append(jnp.swapaxes(o[0], 0, 1))
        assert calc_diff(out, jnp.concatenate(outs, 0)) < 1.5e-3
