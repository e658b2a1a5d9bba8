"""Int8 KV-cache decode attention vs the fp32 oracle over the full cache.

Covers: T=1 decode (incl. the GQA head-folding fast path), windowed T>1
causal decode, cache growth via appends (fixed centering / per-token K
scales must stay exact as the cache fills), bucket slicing, bf16-V mode,
and NHD layout entry.  All interpret-mode (CPU CI lane).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.decode import (
    KVCache, kv_cache_init, kv_cache_append, sageattn_decode, decode_bucket)
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff

BAR = 1.5e-3  # int8 Q/K codes + int8 V storage


def _mk(B=1, Hq=4, Hk=None, S=192, T=1, D=64, seed=0):
    Hk = Hk or Hq
    r = jax.random.split(jax.random.PRNGKey(seed), 4)
    k = jax.random.normal(r[0], (B, Hk, S, D), jnp.float32)
    v = jax.random.normal(r[1], (B, Hk, S, D), jnp.float32)
    q = jax.random.normal(r[2], (B, Hq, T, D), jnp.float32)
    return q, k, v


def _expand(x, G):
    # repeat kv heads for the oracle: [B,Hk,S,D] -> [B,Hk*G,S,D]
    return jnp.repeat(x, G, axis=1)


def _oracle_decode(q, k_all, v_all, T):
    """Full-cache causal-window reference: q rows sit at the last T
    positions of k_all/v_all."""
    B, Hq, _, D = q.shape
    Hk = k_all.shape[1]
    G = Hq // Hk
    k_e, v_e = _expand(k_all, G), _expand(v_all, G)
    S = k_all.shape[2]
    qpos = jnp.arange(S - T, S)[:, None]
    mask = (jnp.arange(S)[None, :] <= qpos)[None, None]
    return sdpa(q, k_e, v_e, mask=mask)


class TestDecodeBasic:
    def test_t1_mha(self):
        q, k, v = _mk(B=2, Hq=3, S=200, T=1)
        cache = kv_cache_init(k, v, max_len=256)
        out = sageattn_decode(q, cache, interpret=True)
        assert out.shape == q.shape
        assert calc_diff(out, _oracle_decode(q, k, v, 1)) < BAR

    def test_t1_gqa_fold(self):
        # Hq=8, Hk=2 -> G=4 folds into the Q tile
        q, k, v = _mk(B=1, Hq=8, Hk=2, S=160, T=1, seed=1)
        cache = kv_cache_init(k, v, max_len=512)
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, 1)) < BAR

    def test_windowed_causal(self):
        # the last T=5 tokens' k/v are already in the cache; their queries
        # must each see only their own prefix
        T = 5
        q, k, v = _mk(B=1, Hq=2, S=150, T=T, seed=2)
        cache = kv_cache_init(k, v, max_len=256)
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, T)) < BAR

    def test_windowed_gqa_fold(self):
        # r4: T>1 GQA verify windows FOLD (G*T rows, causal_row_mod=T) so
        # the KV stream is fetched once per KV head, not per query head
        T = 3
        q, k, v = _mk(B=1, Hq=4, Hk=2, S=140, T=T, seed=3)
        cache = kv_cache_init(k, v, max_len=256)
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, T)) < BAR

    def test_windowed_gqa_fold_multi_tile(self):
        # folded rows G*T = 40 > _BQ (32): the row-mod causal mask must
        # stay correct across q-tile boundaries (rows are globally linear)
        T = 5
        q, k, v = _mk(B=1, Hq=8, Hk=1, S=140, T=T, seed=11)
        cache = kv_cache_init(k, v, max_len=256)
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, T)) < BAR

    def test_windowed_gqa_fold_noncausal(self):
        # non-causal T>1 fold: every row sees the whole cache
        T = 4
        q, k, v = _mk(B=1, Hq=6, Hk=2, S=120, T=T, seed=12)
        cache = kv_cache_init(k, v, max_len=256)
        out = sageattn_decode(q, cache, is_causal=False, interpret=True)
        import jax.numpy as _jnp
        G = 3
        ka = _jnp.repeat(k, G, axis=1)
        va = _jnp.repeat(v, G, axis=1)
        s = _jnp.einsum("bhtd,bhsd->bhts", q, ka) / (q.shape[-1] ** 0.5)
        ref = _jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(s, axis=-1), va)
        assert calc_diff(out, ref) < BAR

    def test_v_bf16_mode(self):
        q, k, v = _mk(B=1, Hq=2, S=130, T=1, seed=4)
        cache = kv_cache_init(k, v, max_len=256, v_quant=False)
        assert not cache.v_int8
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, 1)) < BAR

    def test_nhd_layout(self):
        q, k, v = _mk(B=1, Hq=2, S=130, T=1, seed=5)
        cache = kv_cache_init(jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
                              max_len=256, tensor_layout="NHD")
        out = sageattn_decode(jnp.swapaxes(q, 1, 2), cache,
                              tensor_layout="NHD", interpret=True)
        out = jnp.swapaxes(out, 1, 2)
        assert calc_diff(out, _oracle_decode(q, k, v, 1)) < BAR


class TestCacheGrowth:
    def test_append_then_decode(self):
        # prefill 100, append 3 steps of 1 token; decode after each step
        # must match the oracle over the grown cache
        B, H, D, S0 = 1, 2, 64, 100
        r = jax.random.split(jax.random.PRNGKey(7), 3)
        k_all = jax.random.normal(r[0], (B, H, S0 + 3, D), jnp.float32)
        v_all = jax.random.normal(r[1], (B, H, S0 + 3, D), jnp.float32)
        qs = jax.random.normal(r[2], (B, H, 3, D), jnp.float32)
        cache = kv_cache_init(k_all[:, :, :S0], v_all[:, :, :S0], max_len=256)
        for t in range(3):
            cache = kv_cache_append(cache, k_all[:, :, S0 + t: S0 + t + 1],
                                    v_all[:, :, S0 + t: S0 + t + 1])
            assert int(cache.length) == S0 + t + 1
            q = qs[:, :, t: t + 1]
            out = sageattn_decode(q, cache, interpret=True)
            ref = _oracle_decode(q, k_all[:, :, : S0 + t + 1],
                                 v_all[:, :, : S0 + t + 1], 1)
            assert calc_diff(out, ref) < BAR

    def test_append_block(self):
        # multi-token append (chunked prefill / speculative)
        B, H, D, S0, T = 1, 2, 64, 90, 6
        r = jax.random.split(jax.random.PRNGKey(8), 3)
        k_all = jax.random.normal(r[0], (B, H, S0 + T, D), jnp.float32)
        v_all = jax.random.normal(r[1], (B, H, S0 + T, D), jnp.float32)
        q = jax.random.normal(r[2], (B, H, T, D), jnp.float32)
        cache = kv_cache_init(k_all[:, :, :S0], v_all[:, :, :S0], max_len=256)
        cache = kv_cache_append(cache, k_all[:, :, S0:], v_all[:, :, S0:])
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k_all, v_all, T)) < BAR

    def test_jitted_step(self):
        # the (append -> decode) step jits with the cache as a pytree
        B, H, D, S0 = 1, 2, 64, 100
        r = jax.random.split(jax.random.PRNGKey(9), 3)
        k_all = jax.random.normal(r[0], (B, H, S0 + 2, D), jnp.float32)
        v_all = jax.random.normal(r[1], (B, H, S0 + 2, D), jnp.float32)
        qs = jax.random.normal(r[2], (B, H, 2, D), jnp.float32)

        @jax.jit
        def step(cache, k1, v1, q1):
            cache = kv_cache_append(cache, k1, v1)
            return cache, sageattn_decode(q1, cache, interpret=True)

        cache = kv_cache_init(k_all[:, :, :S0], v_all[:, :, :S0], max_len=256)
        for t in range(2):
            cache, out = step(cache, k_all[:, :, S0 + t: S0 + t + 1],
                              v_all[:, :, S0 + t: S0 + t + 1],
                              qs[:, :, t: t + 1])
            ref = _oracle_decode(qs[:, :, t: t + 1],
                                 k_all[:, :, : S0 + t + 1],
                                 v_all[:, :, : S0 + t + 1], 1)
            assert calc_diff(out, ref) < BAR


class TestBuckets:
    def test_bucket_slicing(self):
        q, k, v = _mk(B=1, Hq=2, S=200, T=1, seed=10)
        cache = kv_cache_init(k, v, max_len=2048)
        ref = _oracle_decode(q, k, v, 1)
        b = decode_bucket(int(cache.length), block=128)
        assert b == 256
        out = sageattn_decode(q, cache, bucket=b, interpret=True)
        assert calc_diff(out, ref) < BAR
        # a larger bucket must give the same answer
        out2 = sageattn_decode(q, cache, bucket=512, interpret=True)
        assert calc_diff(out2, ref) < BAR

    def test_bucket_non_pow2(self):
        # r4 regression: bucket 1152 keeps BK = 1152 (divides itself) but
        # min(BK, 256) does not divide it — the inner sub-tile must halve
        # to a divisor (128) instead of tripping the kernel's assert
        q, k, v = _mk(B=1, Hq=2, S=200, T=1, seed=13)
        cache = kv_cache_init(k, v, max_len=1152)
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, 1)) < BAR

    def test_bucket_too_large(self):
        q, k, v = _mk(S=128, T=1)
        cache = kv_cache_init(k, v, max_len=256)
        with pytest.raises(ValueError):
            sageattn_decode(q, cache, bucket=512, interpret=True)


class TestSplitStreams:
    """kv_split: the cache streams as 2 concurrent K/V operand pairs
    whenever the bucket holds >= 2 even KV blocks (probe_dma_rate: Pallas
    operand streams are element-rate bound but overlap ~linearly).  Ways
    run in ascending block order within a grid step, so the online-softmax
    accumulation order is IDENTICAL to the single-stream kernel."""

    def test_split_matches_unsplit_t1(self, monkeypatch):
        q, k, v = _mk(B=2, Hq=4, Hk=2, S=900, T=1, seed=21)
        cache = kv_cache_init(k, v, max_len=1024)
        # bucket 1024, block_k 256 -> n_kv = 4: split=2 engages
        monkeypatch.setenv("SAGE_DECODE_SPLIT", "2")
        out2 = sageattn_decode(q, cache, bucket=1024, block_k=256,
                               interpret=True)
        monkeypatch.setenv("SAGE_DECODE_SPLIT", "0")
        out1 = sageattn_decode(q, cache, bucket=1024, block_k=256,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(out1))
        assert calc_diff(out2, _oracle_decode(q, k, v, 1)) < BAR

    def test_split_verify_window(self, monkeypatch):
        # T>1 causal verify window (folded GQA rows) across split streams
        q, k, v = _mk(B=1, Hq=8, Hk=2, S=700, T=4, seed=22)
        cache = kv_cache_init(k, v, max_len=1024)
        monkeypatch.setenv("SAGE_DECODE_SPLIT", "2")
        out = sageattn_decode(q, cache, bucket=1024, block_k=256,
                              is_causal=True, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, 4)) < BAR

    def test_split_odd_blocks_falls_back(self, monkeypatch):
        # 3 KV blocks: not divisible by 2 -> single-stream path, still exact
        q, k, v = _mk(B=1, Hq=2, S=700, T=1, seed=23)
        cache = kv_cache_init(k, v, max_len=768)
        monkeypatch.setenv("SAGE_DECODE_SPLIT", "2")
        out = sageattn_decode(q, cache, bucket=768, block_k=256,
                              interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, 1)) < BAR


class TestValidation:
    def test_head_mismatch(self):
        q, k, v = _mk(Hq=3, S=128)
        cache = kv_cache_init(k[:, :2], v[:, :2], max_len=256)
        with pytest.raises(ValueError):
            sageattn_decode(q, cache, interpret=True)

    def test_max_len_too_small(self):
        _, k, v = _mk(S=300)
        with pytest.raises(ValueError):
            kv_cache_init(k, v, max_len=256)

    def test_kv_shape_mismatch(self):
        _, k, v = _mk(S=128)
        with pytest.raises(ValueError):
            kv_cache_init(k, v[:, :, :64], max_len=256)


class TestFP8VCache:
    """float8_e4m3fn V-cache mode (r4, VERDICT #8): the reference sm89
    per-channel fp8-V semantics (`qk_int_sv_f8_cuda_sm89.cuh:44-704`,
    scale_max=448) on the decode path — numerics validated in interpret/
    emulated mode so fast-fp8 generations are turn-key.  The per-channel
    rounding-bias fold into v_mean (kv_cache_init) keeps the p-weighted
    output mean exact, so fp8 V decodes at the same ~5e-4 level as int8
    V (measured; without the fold it was 8e-3 at S=5000)."""

    FP8_BAR = 2.5e-3

    def test_t1_fp8_cache(self):
        q, k, v = _mk(B=2, Hq=4, Hk=2, S=200, T=1, seed=7)
        cache = kv_cache_init(k, v, max_len=256, v_format="fp8")
        assert cache.v.dtype == jnp.float8_e4m3fn
        assert cache.v_fp8 and not cache.v_int8
        out = sageattn_decode(q, cache, interpret=True)
        assert out.shape == q.shape
        assert calc_diff(out, _oracle_decode(q, k, v, 1)) < self.FP8_BAR

    def test_fp8_append_then_decode(self):
        S0, T = 130, 3
        q, k, v = _mk(B=1, Hq=4, Hk=2, S=S0 + T, T=T, seed=8)
        cache = kv_cache_init(k[:, :, :S0], v[:, :, :S0], max_len=256,
                              v_format="fp8")
        cache = kv_cache_append(cache, k[:, :, S0:], v[:, :, S0:])
        assert cache.v.dtype == jnp.float8_e4m3fn
        assert int(cache.length) == S0 + T
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, T)) < self.FP8_BAR

    def test_fp8_windowed_causal(self):
        q, k, v = _mk(B=1, Hq=2, S=160, T=4, seed=9)
        cache = kv_cache_init(k, v, max_len=192, v_format="fp8")
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, 4)) < self.FP8_BAR

    def test_fp8_matches_int8_closely(self):
        """fp8 and int8 V caches must agree with each other far inside the
        oracle bar (both are small perturbations of the same math)."""
        q, k, v = _mk(B=1, Hq=4, Hk=2, S=192, T=1, seed=10)
        o8 = sageattn_decode(
            q, kv_cache_init(k, v, max_len=256), interpret=True)
        of8 = sageattn_decode(
            q, kv_cache_init(k, v, max_len=256, v_format="fp8"),
            interpret=True)
        assert calc_diff(o8, of8) < 1.5e-3

    def test_fp8_paged_pool(self):
        """Paged pool with fp8 V codes: prefill + ragged append + decode
        against the dense fp8 path (same math, pool-global stats)."""
        from sageattention_tpu.paged import (
            PageAllocator, build_table, paged_append, paged_prefill,
            pages_bucket_for, sageattn_decode_paged)

        PAGE, B, Hq, Hk, D = 256, 2, 4, 2, 64
        lens = [256, 192]
        r = jax.random.split(jax.random.PRNGKey(11), 3)
        k = jax.random.normal(r[0], (B, Hk, PAGE, D), jnp.float32)
        v = jax.random.normal(r[1], (B, Hk, PAGE, D), jnp.float32)
        q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.float32)
        alloc = PageAllocator(4, PAGE)
        table = build_table([alloc.reserve(1), alloc.reserve(1)], 1)
        cache = paged_prefill(k, v, jnp.asarray(lens, jnp.int32), table,
                              num_pages=4, v_format="fp8")
        assert cache.v_pool.dtype == jnp.float8_e4m3fn
        out = sageattn_decode_paged(q, cache,
                                    pages_bucket=pages_bucket_for(cache),
                                    interpret=True)
        for b in range(B):
            L = lens[b]
            ref = _oracle_decode(q[b:b + 1], k[b:b + 1, :, :L],
                                 v[b:b + 1, :, :L], 1)
            assert calc_diff(out[b:b + 1], ref) < self.FP8_BAR, b

    def test_bad_v_format_raises(self):
        q, k, v = _mk()
        with pytest.raises(ValueError, match="v_format"):
            kv_cache_init(k, v, max_len=256, v_format="int4")
