"""Serving runtime: native C++ page pool / radix prefix cache vs the
pure-python fallback, and end-to-end prefix-cached paged admission.

The native extension (`csrc/serving_runtime.cpp`) and the fallback must
implement identical semantics; the end-to-end test checks the whole flow:
request A quantizes a prompt, request B shares A's prefix pages and
prefills only its suffix, and B's decode matches a from-scratch build.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sageattention_tpu import serving
from sageattention_tpu.serving import PrefixCachingAllocator


BACKENDS = [False] + ([True] if serving.HAVE_NATIVE else [])


@pytest.fixture(params=BACKENDS, ids=lambda p: "native" if p else "fallback")
def use_native(request):
    return request.param


class TestPool:
    def test_reserve_release(self, use_native):
        a = PrefixCachingAllocator(8, page_size=4, use_native=use_native)
        adm = a.admit(list(range(10)))       # 3 pages, nothing cached
        assert adm.n_cached_pages == 0 and len(adm.pages) == 3
        assert a.free_pages == 5
        a.release(adm.pages)
        assert a.free_pages == 8

    def test_exhaustion_raises(self, use_native):
        a = PrefixCachingAllocator(2, page_size=4, use_native=use_native)
        a.admit(list(range(8)))
        with pytest.raises(MemoryError):
            a.admit(list(range(100, 140)))

    def test_double_release_raises(self, use_native):
        a = PrefixCachingAllocator(4, page_size=4, use_native=use_native)
        adm = a.admit(list(range(4)))
        a.release(adm.pages)
        with pytest.raises(ValueError):
            a.release(adm.pages)


class TestPrefixCache:
    def test_second_request_reuses_prefix(self, use_native):
        a = PrefixCachingAllocator(16, page_size=4, use_native=use_native)
        sys_prompt = list(range(8))          # 2 full blocks
        t1 = sys_prompt + [50, 51, 52, 53, 54]
        adm1 = a.admit(t1)
        assert adm1.n_cached_pages == 0
        a.commit(t1, adm1.pages)
        assert a.cached_blocks == 3          # 3 full blocks of t1 published

        t2 = sys_prompt + [70, 71, 72]
        adm2 = a.admit(t2)
        assert adm2.n_cached_pages == 2      # the shared system prompt
        assert adm2.pages[:2] == adm1.pages[:2]
        assert len(adm2.new_pages) == 1      # only the divergent tail

    def test_partial_block_never_cached(self, use_native):
        a = PrefixCachingAllocator(16, page_size=4, use_native=use_native)
        t = list(range(6))                   # 1 full block + partial
        adm = a.admit(t)
        a.commit(t, adm.pages)
        assert a.cached_blocks == 1
        adm2 = a.admit(list(range(6)))
        assert adm2.n_cached_pages == 1

    def test_cached_pages_survive_request_exit(self, use_native):
        a = PrefixCachingAllocator(16, page_size=4, use_native=use_native)
        t = list(range(8))
        adm = a.admit(t)
        a.commit(t, adm.pages)
        a.release(adm.pages)                 # request done
        # the trie's own references keep the pages out of the free list
        assert a.free_pages == 16 - 2
        adm2 = a.admit(t)
        assert adm2.n_cached_pages == 2 and adm2.pages == adm.pages

    def test_eviction_frees_lru_under_pressure(self, use_native):
        a = PrefixCachingAllocator(4, page_size=4, use_native=use_native)
        t1, t2 = list(range(8)), list(range(100, 108))
        adm1 = a.admit(t1)
        a.commit(t1, adm1.pages)
        a.release(adm1.pages)
        adm2 = a.admit(t2)                   # needs 2, free 2 -> no evict
        a.commit(t2, adm2.pages)
        a.release(adm2.pages)
        assert a.free_pages == 0 and a.cached_blocks == 4
        a.admit(list(range(200, 208)))       # forces eviction of t1 (LRU)
        assert a.cached_blocks == 2
        adm1b = a.admit(t1)                  # t1 is gone -> nothing cached
        assert adm1b.n_cached_pages == 0

    def test_commit_idempotent(self, use_native):
        a = PrefixCachingAllocator(8, page_size=4, use_native=use_native)
        t = list(range(8))
        adm = a.admit(t)
        a.commit(t, adm.pages)
        a.commit(t, adm.pages)               # no double trie refs
        a.release(adm.pages)
        assert a.free_pages == 6
        # evicting both blocks returns their pages exactly once
        freed = a._radix.evict(5)
        a._pool.release(freed)
        assert sorted(freed) == sorted(adm.pages) and a.free_pages == 8


@pytest.mark.skipif(not serving.HAVE_NATIVE,
                    reason="native extension not built")
class TestNativeFallbackParity:
    def test_randomized_trace(self):
        rng = np.random.RandomState(0)
        nat = PrefixCachingAllocator(64, page_size=4, use_native=True)
        pyf = PrefixCachingAllocator(64, page_size=4, use_native=False)
        prompts = [list(rng.randint(0, 5, rng.randint(4, 20)))
                   for _ in range(12)]
        live = []
        for step in range(60):
            op = rng.randint(3)
            if op == 0 or not live:
                t = prompts[rng.randint(len(prompts))]
                try:
                    a1 = nat.admit(t)
                except MemoryError:
                    with pytest.raises(MemoryError):
                        pyf.admit(t)
                    continue
                a2 = pyf.admit(t)
                assert a1 == a2, step
                live.append(a1.pages)
            elif op == 1:
                t = prompts[rng.randint(len(prompts))]
                adm1, adm2 = nat.admit(t), pyf.admit(t)
                assert adm1 == adm2, step
                nat.commit(t, adm1.pages)
                pyf.commit(t, adm2.pages)
                live.append(adm1.pages)
            else:
                pages = live.pop(rng.randint(len(live)))
                nat.release(pages)
                pyf.release(pages)
            assert nat.free_pages == pyf.free_pages, step
            assert nat.cached_blocks == pyf.cached_blocks, step


class TestPagedPrefixIntegration:
    def test_suffix_prefill_matches_full(self, use_native):
        # request B reuses request A's prefix pages; its decode must match
        # a from-scratch full prefill of the same tokens
        from sageattention_tpu.paged import (
            paged_prefill, paged_insert, build_table, pages_bucket_for,
            sageattn_decode_paged)

        PAGE, Hk, Hq, D = 256, 2, 4, 64
        S_a, prefix = 768, 512              # A: 3 pages; shared prefix: 2
        rng = jax.random.PRNGKey(0)
        r = jax.random.split(rng, 5)
        k_a = jax.random.normal(r[0], (Hk, S_a, D), jnp.float32)
        v_a = jax.random.normal(r[1], (Hk, S_a, D), jnp.float32)
        # B shares A's first 512 tokens, diverges after
        k_b = jnp.concatenate(
            [k_a[:, :prefix],
             jax.random.normal(r[2], (Hk, PAGE, D), jnp.float32)], axis=1)
        v_b = jnp.concatenate(
            [v_a[:, :prefix],
             jax.random.normal(r[3], (Hk, PAGE, D), jnp.float32)], axis=1)
        tok_a = list(range(S_a))
        tok_b = tok_a[:prefix] + list(range(1000, 1000 + PAGE))

        alloc = PrefixCachingAllocator(16, page_size=PAGE,
                                       use_native=use_native)
        adm_a = alloc.admit(tok_a)
        table = build_table([adm_a.pages, [0, 0, 0]], max_pages=3)
        kz = jnp.stack([k_a, jnp.zeros_like(k_a)])
        vz = jnp.stack([v_a, jnp.zeros_like(v_a)])
        cache = paged_prefill(kz, vz,
                              jnp.asarray([S_a, 0], jnp.int32),
                              table, num_pages=16, page_size=PAGE)
        alloc.commit(tok_a, adm_a.pages)

        adm_b = alloc.admit(tok_b)
        assert adm_b.n_cached_pages == 2
        cache = paged_insert(cache, 1, k_b[:, prefix:], v_b[:, prefix:],
                             S_a, adm_b.pages,
                             start_page=adm_b.n_cached_pages)

        q = jax.random.normal(r[4], (2, Hq, 1, D), jnp.float32)
        out = sageattn_decode_paged(q, cache,
                                    pages_bucket=pages_bucket_for(cache),
                                    interpret=True)

        # from-scratch build of B alone
        table2 = build_table([[3, 4, 5]], max_pages=3)
        cache2 = paged_prefill(k_b[None], v_b[None],
                               jnp.asarray([S_a], jnp.int32),
                               table2, num_pages=16, page_size=PAGE,
                               smooth_k=False, smooth_v=False,
                               v_quant=True)
        # NB: stats differ between pools (pool-global); compare against an
        # oracle instead of bit-exactness
        from sageattention_tpu.ops.reference import sdpa

        def oracle(qb, kf, vf):
            G = Hq // Hk
            return sdpa(qb[None], jnp.repeat(kf[None], G, 1),
                        jnp.repeat(vf[None], G, 1))[0]

        ref_b = oracle(q[1], k_b, v_b)
        diff = float(jnp.max(jnp.abs(out[1].astype(jnp.float32) - ref_b)) /
                     (jnp.max(jnp.abs(ref_b)) + 1e-9))
        assert diff < 0.02
        ref_a = oracle(q[0], k_a, v_a)
        diff_a = float(jnp.max(jnp.abs(out[0].astype(jnp.float32) - ref_a)) /
                       (jnp.max(jnp.abs(ref_a)) + 1e-9))
        assert diff_a < 0.02
