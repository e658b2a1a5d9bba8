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

    def test_windowed_gqa_no_fold(self):
        T = 3
        q, k, v = _mk(B=1, Hq=4, Hk=2, S=140, T=T, seed=3)
        cache = kv_cache_init(k, v, max_len=256)
        out = sageattn_decode(q, cache, interpret=True)
        assert calc_diff(out, _oracle_decode(q, k, v, T)) < BAR

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

    def test_bucket_too_large(self):
        q, k, v = _mk(S=128, T=1)
        cache = kv_cache_init(k, v, max_len=256)
        with pytest.raises(ValueError):
            sageattn_decode(q, cache, bucket=512, interpret=True)


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
