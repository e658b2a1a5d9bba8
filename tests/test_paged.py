"""Paged int8 KV cache vs the fp32 oracle (interpret-mode CI lane).

Covers: ragged per-sequence lengths (the feature the dense cache lacks),
shuffled non-contiguous page tables, appends crossing page boundaries,
GQA head folding, T>1 causal windows, bf16-V mode, prefix sharing
(two table rows referencing the same physical pages), and the allocator's
refcounted free list.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.paged import (
    PageAllocator, build_table, paged_prefill, paged_append,
    pages_bucket_for, sageattn_decode_paged, _select_ways)
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff

BAR = 1.5e-3
PAGE = 256


def _mk_ragged(B, Hk, lengths, D, seed=0, s_pad=None):
    s_pad = s_pad or -(-max(lengths) // PAGE) * PAGE
    r = jax.random.split(jax.random.PRNGKey(seed), 2)
    k = jax.random.normal(r[0], (B, Hk, s_pad, D), jnp.float32)
    v = jax.random.normal(r[1], (B, Hk, s_pad, D), jnp.float32)
    return k, v, s_pad


def _oracle(q, k, v, length, T=1):
    """One sequence's decode oracle: last-T-rows causal over its true
    prefix.  q [Hq, T, D]; k/v [Hk, S_pad, D] (pad ignored)."""
    Hq, Hk = q.shape[0], k.shape[0]
    G = Hq // Hk
    ke = jnp.repeat(k[:, :length], G, axis=0)[None]
    ve = jnp.repeat(v[:, :length], G, axis=0)[None]
    qpos = length - T + jnp.arange(T)[:, None]
    mask = (jnp.arange(length)[None, :] <= qpos)[None, None]
    return sdpa(q[None], ke, ve, mask=mask)[0]


def _build(k, v, lengths, *, num_pages=64, shuffle_seed=None, **kw):
    n = [-(-l // PAGE) for l in lengths]
    s_pad = k.shape[2]
    per_seq = s_pad // PAGE
    alloc = PageAllocator(num_pages, PAGE)
    rows = [alloc.reserve(per_seq) for _ in lengths]  # covers pad pages too
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed)
        for r in rows:
            rng.shuffle(r)  # non-contiguous, arbitrary-order physical pages
    table = build_table(rows, max_pages=per_seq + 2)
    cache = paged_prefill(k, v, jnp.asarray(lengths), table,
                          num_pages=num_pages, **kw)
    return cache, alloc, rows


class TestPagedDecode:
    def test_ragged_t1(self):
        B, Hq, Hk, D = 3, 4, 4, 64
        lengths = [300, 512, 117]
        k, v, _ = _mk_ragged(B, Hk, lengths, D)
        cache, _, _ = _build(k, v, lengths, shuffle_seed=0)
        q = jax.random.normal(jax.random.PRNGKey(2), (B, Hq, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, interpret=True)
        assert out.shape == (B, Hq, 1, D)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], lengths[b])
            assert calc_diff(out[b], ref) < BAR, b

    def test_gqa_fold(self):
        B, Hq, Hk, D = 2, 8, 2, 128
        lengths = [400, 256]
        k, v, _ = _mk_ragged(B, Hk, lengths, D, seed=1)
        cache, _, _ = _build(k, v, lengths, shuffle_seed=1)
        q = jax.random.normal(jax.random.PRNGKey(3), (B, Hq, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, interpret=True)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], lengths[b])
            assert calc_diff(out[b], ref) < BAR, b

    def test_append_crosses_page_boundary(self):
        B, H, D = 2, 2, 64
        lengths = [254, 100]  # seq 0 crosses into page 2 after 3 appends
        k, v, s_pad = _mk_ragged(B, H, [512, 512], D, seed=2)
        cache, _, _ = _build(k, v, lengths)
        grown = [l for l in lengths]
        for t in range(4):
            kn = jnp.stack([k[0, :, grown[0]], k[1, :, grown[1]]])[:, :, None]
            vn = jnp.stack([v[0, :, grown[0]], v[1, :, grown[1]]])[:, :, None]
            cache = paged_append(cache, kn, vn)
            grown = [g + 1 for g in grown]
        q = jax.random.normal(jax.random.PRNGKey(4), (B, H, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, interpret=True)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], grown[b])
            assert calc_diff(out[b], ref) < BAR, b
        assert [int(x) for x in cache.lengths] == grown

    def test_window_causal(self):
        B, H, D, T = 2, 2, 64, 4
        lengths = [200, 301]
        k, v, _ = _mk_ragged(B, H, lengths, D, seed=3)
        # hold back the last T tokens, then append them as a window
        pre = [l - T for l in lengths]
        cache, _, _ = _build(k, v, pre)
        kn = jnp.stack([k[b, :, pre[b]:pre[b] + T] for b in range(B)])
        vn = jnp.stack([v[b, :, pre[b]:pre[b] + T] for b in range(B)])
        cache = paged_append(cache, kn, vn)
        q = jax.random.normal(jax.random.PRNGKey(5), (B, H, T, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, interpret=True)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], lengths[b], T=T)
            assert calc_diff(out[b], ref) < BAR, b

    def test_bf16_v_mode(self):
        B, H, D = 1, 2, 64
        lengths = [333]
        k, v, _ = _mk_ragged(B, H, lengths, D, seed=4)
        cache, _, _ = _build(k, v, lengths, v_quant=False)
        assert not cache.v_int8
        q = jax.random.normal(jax.random.PRNGKey(6), (B, H, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, interpret=True)
        ref = _oracle(q[0], k[0], v[0], lengths[0])
        assert calc_diff(out[0], ref) < BAR

    def test_prefix_sharing(self):
        """Two sequences share the first page (same prompt prefix stored
        once); each then gets its own continuation page."""
        Hk, D = 2, 64
        r = jax.random.split(jax.random.PRNGKey(7), 4)
        shared = jax.random.normal(r[0], (Hk, PAGE, D), jnp.float32)
        contA = jax.random.normal(r[1], (Hk, PAGE, D), jnp.float32)
        contB = jax.random.normal(r[2], (Hk, PAGE, D), jnp.float32)
        kA = jnp.concatenate([shared, contA], axis=1)[None]
        kB = jnp.concatenate([shared, contB], axis=1)[None]
        # store as a 2-seq batch: prefill writes the shared page twice with
        # identical content (dedup is the allocator's job, demonstrated by
        # pointing both rows at seq 0's first page)
        k = jnp.concatenate([kA, kB], axis=0)
        v = k * 0.5 + 1.0
        lengths = [2 * PAGE, PAGE + 77]
        alloc = PageAllocator(16, PAGE)
        rowA = alloc.reserve(2)
        rowB = [rowA[0]] + alloc.reserve(1)   # share page 0
        alloc.share([rowA[0]])
        table = build_table([rowA, rowB], max_pages=3)
        cache = paged_prefill(k, v, jnp.asarray(lengths), table,
                              num_pages=16)
        q = jax.random.normal(r[3], (2, Hk, 1, D), jnp.float32)
        out = sageattn_decode_paged(q, cache, interpret=True)
        for b in range(2):
            ref = _oracle(q[b], k[b], v[b], lengths[b])
            assert calc_diff(out[b], ref) < BAR, b

    def test_insert_reuses_released_slot(self):
        """Continuous batching: seq 1 finishes, its pages are released, a
        NEW sequence is admitted into slot 1 reusing those physical pages;
        both the surviving seq 0 and the newcomer must stay exact."""
        from sageattention_tpu.paged import paged_insert
        B, H, D = 2, 2, 64
        lengths = [400, 512]
        k, v, _ = _mk_ragged(B, H, lengths, D, seed=6)
        cache, alloc, rows = _build(k, v, lengths)
        alloc.release(rows[1])
        k2, v2, _ = _mk_ragged(1, H, [290], D, seed=7)
        new_pages = alloc.reserve(2)
        cache = paged_insert(cache, 1, k2[0], v2[0], 290, new_pages)
        q = jax.random.normal(jax.random.PRNGKey(9), (B, H, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, interpret=True)
        assert calc_diff(out[0], _oracle(q[0], k[0], v[0], 400)) < BAR
        assert calc_diff(out[1], _oracle(q[1], k2[0], v2[0], 290)) < BAR
        # the newcomer keeps decoding; slot 0 is inactive this step (its
        # write is dropped, its length frozen) — the continuous-batching
        # one-jitted-step-for-all-slots pattern
        kn = k2[:, :, 290:291]
        vn = v2[:, :, 290:291]
        cache = paged_append(
            cache, jnp.concatenate([jnp.ones_like(kn) * 9, kn]),
            jnp.concatenate([jnp.ones_like(vn) * 9, vn]),
            active=jnp.array([False, True]))
        assert [int(x) for x in cache.lengths] == [400, 291]
        out2 = sageattn_decode_paged(q, cache, interpret=True)
        assert calc_diff(out2[0], _oracle(q[0], k[0], v[0], 400)) < BAR
        assert calc_diff(out2[1], _oracle(q[1], k2[0], v2[0], 291)) < BAR

    def test_pages_bucket_bounds_stream(self):
        B, H, D = 2, 2, 64
        lengths = [130, 500]
        k, v, _ = _mk_ragged(B, H, lengths, D, seed=5)
        cache, _, _ = _build(k, v, lengths)
        q = jax.random.normal(jax.random.PRNGKey(8), (B, H, 1, D),
                              jnp.float32)
        bucket = pages_bucket_for(cache)
        assert bucket == 2
        out = sageattn_decode_paged(q, cache, pages_bucket=bucket,
                                    interpret=True)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], lengths[b])
            assert calc_diff(out[b], ref) < BAR, b

    def test_multi_stream_ways_match_single(self, monkeypatch):
        # ways=2/4 page streams fuse their pages into ONE packed logit tile
        # per grid step (the online-softmax max is taken per group instead
        # of per page — same math, different fp association, so compare
        # with a tight tolerance); odd bucket rounds up to a ways multiple
        # with dead slots masked per column.
        B, Hq, Hk, D = 2, 8, 2, 64
        lengths = [700, 1000]   # 3 and 4 pages at page=256
        k, v, _ = _mk_ragged(B, Hk, lengths, D, seed=9)
        cache, _, _ = _build(k, v, lengths, shuffle_seed=3)
        q = jax.random.normal(jax.random.PRNGKey(11), (B, Hq, 1, D),
                              jnp.float32)
        monkeypatch.setenv("SAGE_PAGED_SPLIT", "1")
        out1 = sageattn_decode_paged(q, cache, interpret=True)
        for w in ("2", "4"):
            monkeypatch.setenv("SAGE_PAGED_SPLIT", w)
            outw = sageattn_decode_paged(q, cache, interpret=True)
            np.testing.assert_allclose(
                np.asarray(outw, np.float32), np.asarray(out1, np.float32),
                atol=2e-2, rtol=0)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], lengths[b])
            assert calc_diff(out1[b], ref) < BAR, b
            monkeypatch.setenv("SAGE_PAGED_SPLIT", "4")
            out4 = sageattn_decode_paged(q, cache, interpret=True)
            assert calc_diff(out4[b], ref) < BAR, b

    def test_prefill_dead_slots_do_not_clobber(self):
        """Regression (r4 TPU drive): a sequence reserving FEWER pages than
        the padded input has pad slots (value 0) inside its table row's
        first ``S_pad/page`` entries — paged_prefill's scatter must drop
        them instead of overwriting physical page 0 (which belongs to
        another sequence).  Repro: [700, 500] at S_pad=768, seq1 reserves
        2 pages, its dead 3rd slot pointed at seq0's first page."""
        B, H, D = 2, 2, 64
        lengths = [700, 500]
        k, v, s_pad = _mk_ragged(B, H, lengths, D, seed=9)
        alloc = PageAllocator(8, PAGE)
        rows = [alloc.reserve(-(-l // PAGE)) for l in lengths]  # 3 + 2
        assert rows[0][0] == 0 and len(rows[1]) < s_pad // PAGE
        table = build_table(rows, max_pages=3)
        cache = paged_prefill(k, v, jnp.asarray(lengths), table,
                              num_pages=8)
        q = jax.random.normal(jax.random.PRNGKey(10), (B, 2 * H, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache,
                                    pages_bucket=pages_bucket_for(cache),
                                    interpret=True)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], lengths[b])
            assert calc_diff(out[b], ref) < BAR, b

    def test_prefill_zero_length_slot_writes_nothing(self):
        """A length-0 slot (empty admission) must leave the pool untouched
        even though its table row is all pad."""
        B, H, D = 2, 2, 64
        lengths = [300, 0]
        k, v, _ = _mk_ragged(B, H, [300, 1], D, seed=11)
        alloc = PageAllocator(4, PAGE)
        rows = [alloc.reserve(2), []]
        table = build_table(rows, max_pages=2)
        cache = paged_prefill(k, v, jnp.asarray(lengths), table,
                              num_pages=4)
        q = jax.random.normal(jax.random.PRNGKey(12), (B, 2 * H, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache,
                                    pages_bucket=pages_bucket_for(cache),
                                    interpret=True)
        ref = _oracle(q[0], k[0], v[0], 300)
        assert calc_diff(out[0], ref) < BAR


class TestSlidingWindowDecode:
    def _swa_oracle(self, q, k, v, length, W):
        lo = max(0, length - W)
        Hq, Hk = q.shape[0], k.shape[0]
        G = Hq // Hk
        ke = jnp.repeat(k[:, lo:length], G, axis=0)[None]
        ve = jnp.repeat(v[:, lo:length], G, axis=0)[None]
        return sdpa(q[None], ke, ve)[0]

    @pytest.mark.parametrize("W", [100, 256, 300])
    def test_window_matches_cropped_oracle(self, W):
        B, Hq, Hk, D = 2, 4, 2, 64
        lengths = [520, 380]
        k, v, _ = _mk_ragged(B, Hk, lengths, D, seed=8, s_pad=768)
        cache, _, _ = _build(k, v, lengths, shuffle_seed=3)
        q = jax.random.normal(jax.random.PRNGKey(10), (B, Hq, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, sliding_window=W,
                                    interpret=True)
        for b in range(B):
            ref = self._swa_oracle(q[b], k[b], v[b], lengths[b], W)
            assert calc_diff(out[b], ref) < BAR, (W, b)

    def test_window_wider_than_cache_is_full(self):
        B, H, D = 1, 2, 64
        lengths = [300]
        k, v, _ = _mk_ragged(B, H, lengths, D, seed=9)
        cache, _, _ = _build(k, v, lengths)
        q = jax.random.normal(jax.random.PRNGKey(11), (B, H, 1, D),
                              jnp.float32)
        out_w = sageattn_decode_paged(q, cache, sliding_window=4096,
                                      interpret=True)
        out_f = sageattn_decode_paged(q, cache, interpret=True)
        # sliding streams keep ways=1 while the full path packs ways pages
        # per softmax step — same math, different fp association (bf16 out)
        assert calc_diff(out_w, out_f) < 5e-6

    def _sink_oracle(self, q, k, v, length, W, sinks):
        lo = max(max(0, length - W), sinks)
        Hq, Hk = q.shape[0], k.shape[0]
        G = Hq // Hk
        kv = jnp.concatenate([k[:, :min(sinks, length)], k[:, lo:length]], 1)
        vv = jnp.concatenate([v[:, :min(sinks, length)], v[:, lo:length]], 1)
        return sdpa(q[None], jnp.repeat(kv, G, 0)[None],
                    jnp.repeat(vv, G, 0)[None])[0]

    @pytest.mark.parametrize("sinks", [4, 100, 256])
    def test_attention_sinks(self, sinks):
        """StreamingLLM: first `sinks` tokens stay visible alongside the
        band — incl. a sink region overlapping the window (len 380 W 300:
        lo=80 < sinks=100/256 exercises the disjoint decomposition)."""
        B, Hq, Hk, D, W = 2, 4, 2, 64, 300
        lengths = [520, 380]
        k, v, _ = _mk_ragged(B, Hk, lengths, D, seed=12, s_pad=768)
        cache, _, _ = _build(k, v, lengths, shuffle_seed=4)
        q = jax.random.normal(jax.random.PRNGKey(13), (B, Hq, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, sliding_window=W,
                                    attention_sinks=sinks, interpret=True)
        for b in range(B):
            ref = self._sink_oracle(q[b], k[b], v[b], lengths[b], W, sinks)
            assert calc_diff(out[b], ref) < BAR, (sinks, b)

    def test_sinks_require_window(self):
        B, H, D = 1, 2, 64
        k, v, _ = _mk_ragged(B, H, [300], D)
        cache, _, _ = _build(k, v, [300])
        q = jnp.zeros((B, H, 1, D))
        with pytest.raises(ValueError, match="sliding_window"):
            sageattn_decode_paged(q, cache, attention_sinks=4,
                                  interpret=True)

    def test_window_rejects_multi_token(self):
        B, H, D = 1, 2, 64
        k, v, _ = _mk_ragged(B, H, [300], D)
        cache, _, _ = _build(k, v, [300])
        q = jnp.zeros((B, H, 4, D))
        with pytest.raises(ValueError, match="T=1"):
            sageattn_decode_paged(q, cache, sliding_window=128,
                                  interpret=True)


class TestAllocator:
    def test_refcounted_release(self):
        alloc = PageAllocator(4, PAGE)
        a = alloc.reserve(2)
        shared = alloc.share([a[0]])
        assert alloc.free_pages == 2
        alloc.release(a)
        assert alloc.free_pages == 3          # a[0] still referenced
        alloc.release(shared)
        assert alloc.free_pages == 4
        with pytest.raises(ValueError):
            alloc.release([a[0]])

    def test_exhaustion(self):
        alloc = PageAllocator(2, PAGE)
        alloc.reserve(2)
        with pytest.raises(MemoryError):
            alloc.reserve(1)

    def test_errors(self):
        with pytest.raises(ValueError):
            build_table([[0, 1, 2]], max_pages=2)
        B, H, D = 1, 2, 64
        k, v, _ = _mk_ragged(B, H, [100], D)
        cache, _, _ = _build(k, v, [100])
        q = jnp.zeros((B, 3, 1, D))
        with pytest.raises(ValueError):
            sageattn_decode_paged(q, cache, interpret=True)  # 3 % 2 != 0
        with pytest.raises(ValueError):
            sageattn_decode_paged(jnp.zeros((B, H, 64, D)), cache,
                                  interpret=True)  # window > TQ


class TestPageSizes:
    """Non-default page sizes (512/1024) with the adaptive ways default.

    probe_page_size.py measured page=1024 at dense-cache parity on v5e
    (the page-granular DMA is the whole paged-vs-dense residual), so big
    pages are a supported serving configuration, not just a probe: the
    ways default scales down as pages grow (ways*page ~ 4096)."""

    @pytest.mark.parametrize("page", [512, 1024])
    def test_ragged_vs_oracle(self, page, monkeypatch):
        monkeypatch.delenv("SAGE_PAGED_SPLIT", raising=False)
        B, Hq, Hk, D = 2, 4, 2, 64
        # span >= 8 pages and pad the table width to 16 so the adaptive
        # multi-way default (8 ways @512 / 4 ways @1024) survives the
        # `rounded <= max_pages` guard — this is what actually exercises
        # the packed multi-way kernel at non-default page sizes.
        lengths = [8 * page + 77, 2 * page + 1]
        s_pad = -(-max(lengths) // page) * page
        k, v, _ = _mk_ragged(B, Hk, lengths, D, seed=21, s_pad=s_pad)
        per_seq = s_pad // page
        max_pages = 16
        alloc = PageAllocator(B * per_seq, page)
        rng = np.random.RandomState(7)
        rows = []
        for _ in range(B):
            r = alloc.reserve(per_seq)
            rng.shuffle(r)
            rows.append(r)
        table = build_table(rows, max_pages=max_pages)
        cache = paged_prefill(k, v, jnp.asarray(lengths), table,
                              num_pages=B * per_seq, page_size=page)
        assert cache.page_size == page
        bucket = pages_bucket_for(cache)
        _, ways = _select_ways(page, bucket, max_pages)
        assert ways == 4096 // page, (page, ways)  # multi-way really runs
        q = jax.random.normal(jax.random.PRNGKey(22), (B, Hq, 1, D),
                              jnp.float32)
        out = sageattn_decode_paged(q, cache, pages_bucket=bucket,
                                    interpret=True)
        for b in range(B):
            ref = _oracle(q[b], k[b], v[b], lengths[b])
            assert calc_diff(out[b], ref) < BAR, (page, b)

    def test_select_ways_semantics(self, monkeypatch):
        # adaptive default: packed width ~4096, capped at the 16-way knee
        monkeypatch.delenv("SAGE_PAGED_SPLIT", raising=False)
        assert _select_ways(256, 64, 64) == (64, 16)
        assert _select_ways(64, 64, 64) == (64, 16)      # capped, not 64
        assert _select_ways(1024, 16, 16) == (16, 4)
        # guards collapse gracefully when the table is narrow
        assert _select_ways(512, 3, 4) == (4, 2)
        assert _select_ways(512, 3, 3) == (3, 1)
        assert _select_ways(512, 1, 1) == (1, 1)
        # explicit env wins; "0" and "1" both force single-stream
        monkeypatch.setenv("SAGE_PAGED_SPLIT", "0")
        assert _select_ways(256, 64, 64) == (64, 1)
        monkeypatch.setenv("SAGE_PAGED_SPLIT", "1")
        assert _select_ways(256, 64, 64) == (64, 1)
        monkeypatch.setenv("SAGE_PAGED_SPLIT", "4")
        assert _select_ways(256, 64, 64) == (64, 4)


class TestSuperpageRuns:
    """r5 superpage runs: groups of R consecutive R-aligned physical pages
    ride one (R,1,page,D) DMA block (run_len=R); the wrapper picks the
    run kernel vs the per-page kernel with a lax.cond on the traced table
    (all LIVE groups aligned).  The stream source must be invisible to the
    numerics: bitwise-equal outputs, and the fallback must fire for
    fragmented or unaligned tables."""

    def _cache(self, rows, lens=(2048, 1700)):
        PAGE, B, Hk, D = 256, 2, 2, 64
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        k = jax.random.normal(ks[0], (B, Hk, 2048, D), jnp.bfloat16)
        v = jax.random.normal(ks[1], (B, Hk, 2048, D), jnp.bfloat16)
        q = jax.random.normal(ks[2], (B, Hk, 32, D), jnp.bfloat16)
        table = build_table(rows, max_pages=8)
        cache = paged_prefill(k, v, jnp.asarray(list(lens)), table,
                              num_pages=16, page_size=PAGE)
        lengths = jnp.asarray(list(lens), jnp.int32)
        last_live = jnp.maximum((lengths - 1) // PAGE, 0)
        slot = jnp.broadcast_to(jnp.arange(8)[None], (B, 8))
        slot_c = jnp.minimum(slot, last_live[:, None])
        table_eff = jnp.take_along_axis(cache.page_table, slot_c, axis=1)
        return q, k, v, cache, table_eff, lengths

    def test_kernel_bitwise_vs_per_page(self):
        from sageattention_tpu.ops.paged_decode import paged_decode_call
        rows = [[0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10, 11, 12, 13, 14, 15]]
        q, k, v, cache, table_eff, lengths = self._cache(rows)
        qt = q * (64 ** -0.5) * 1.4426950408889634
        outs = {}
        for R in (1, 2, 4):
            outs[R] = paged_decode_call(
                qt, cache.k8_pool, cache.ks_pool, cache.v_pool,
                cache.v_scale, cache.v_mean, table_eff, lengths,
                n_pages=8, window=1, ways=8, run_len=R, interpret=True)
        assert bool(jnp.all(outs[1] == outs[2]))
        assert bool(jnp.all(outs[1] == outs[4]))
        ref = sdpa(q[0:1], k[0:1], v[0:1])
        assert calc_diff(outs[4][0:1], ref) < BAR

    @pytest.mark.parametrize("name,rows", [
        ("contig", [[0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10, 11, 12, 13, 14, 15]]),
        ("shuffled", [[3, 0, 6, 1, 7, 2, 5, 4], [15, 9, 8, 14, 10, 13, 11, 12]]),
        # consecutive but not R-aligned: the predicate must refuse
        ("unaligned", [[1, 2, 3, 4, 5, 6, 7, 0], [9, 10, 11, 12, 13, 14, 15, 8]]),
        # live groups aligned, DEAD tail group fragmented: runs still fire
        ("dead-tail", [[0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10, 11, 15, 13, 12, 14]]),
    ])
    def test_wrapper_cond_matches_oracle(self, name, rows, monkeypatch):
        monkeypatch.delenv("SAGE_PAGED_SPLIT", raising=False)
        monkeypatch.delenv("SAGE_PAGED_RUNS", raising=False)
        lens = (2048, 900) if name == "dead-tail" else (2048, 1700)
        q, k, v, cache, _, lengths = self._cache(rows, lens)
        qd = q[:, :, :1].astype(jnp.float32)
        B = q.shape[0]
        out = sageattn_decode_paged(qd, cache,
                                    pages_bucket=pages_bucket_for(cache),
                                    interpret=True)
        for b in range(B):
            ref = _oracle(qd[b], k[b], v[b], int(lengths[b]))
            assert calc_diff(out[b], ref) < BAR, (name, b)


class TestRunAwareAllocator:
    def test_fresh_pool_ascending_runs(self):
        alloc = PageAllocator(16, 256)
        assert alloc.reserve(8) == list(range(8))

    def test_aligned_runs_after_churn(self):
        """After interleaved release, reserve() prefers 4-aligned
        consecutive quads (the decode kernel's superpage-run grain) over
        recency order."""
        alloc = PageAllocator(32, 256)
        rows = [alloc.reserve(4) for _ in range(8)]   # whole pool out
        # free quads 1 and 5 (aligned runs) plus scattered singles from
        # rows 3 and 6, in a recency order a LIFO would hand back first
        alloc.release(rows[6][:2])
        alloc.release(rows[5])
        alloc.release(rows[3][1:3])
        alloc.release(rows[1])
        got = alloc.reserve(8)
        assert got[:8] == rows[1] + rows[5]           # the two aligned runs
        # remainder requests fall back to the scattered singles, ascending
        rest = alloc.reserve(4)
        assert rest == sorted(rows[3][1:3] + rows[6][:2])

    def test_native_pool_matches(self):
        serving = pytest.importorskip("sageattention_tpu.serving")
        if not serving.HAVE_NATIVE:
            pytest.skip("native serving runtime not built")
        pool = serving._ext.PagePool(32)
        rows = []
        for _ in range(8):
            rows.append(pool.reserve(4))
        pool.release(rows[6][:2])
        pool.release(rows[5])
        pool.release(rows[3][1:3])
        pool.release(rows[1])
        got = pool.reserve(8)
        assert list(got)[:8] == list(rows[1]) + list(rows[5])


class TestDeferredStep:
    """paged_decode_step_deferred: attention over the pre-append cache +
    exact softmax merge of the new token's contribution == append-then-
    decode (up to the new token being read unquantized vs its cache
    codes), with the kernel and the append data-independent in the step."""

    def _setup(self, B=2, Hq=4, Hk=2, D=64, lens=(300, 517)):
        k, v, s_pad = _mk_ragged(B, Hk, list(lens), D, seed=41)
        # channel-biased K: makes k_mean large, so the lse smooth-k repair
        # (and the merge's domain consistency) is actually load-bearing
        k = k.at[..., :2].add(jnp.asarray([7.0, -5.0]))
        cache, _, _ = _build(k, v, list(lens), shuffle_seed=3)
        r = jax.random.split(jax.random.PRNGKey(42), 3)
        q = jax.random.normal(r[0], (B, Hq, 1, D), jnp.float32)
        k1 = jax.random.normal(r[1], (B, Hk, 1, D), jnp.float32)
        v1 = jax.random.normal(r[2], (B, Hk, 1, D), jnp.float32)
        return q, k, v, k1, v1, cache, list(lens)

    def test_matches_append_then_decode(self):
        from sageattention_tpu.paged import paged_decode_step_deferred
        q, k, v, k1, v1, cache, lens = self._setup()
        bucket = pages_bucket_for(np.asarray(lens) + 1, PAGE)
        ref = sageattn_decode_paged(q, paged_append(cache, k1, v1),
                                    pages_bucket=bucket, interpret=True)
        out, cache2 = paged_decode_step_deferred(
            q, cache, k1, v1, pages_bucket=bucket, interpret=True)
        assert calc_diff(out, ref) < 5e-4
        assert [int(x) for x in cache2.lengths] == [L + 1 for L in lens]
        # exact vs the dense oracle including the new token
        for b in range(2):
            kk = jnp.concatenate([k[b, :, :lens[b]], k1[b]], axis=1)
            vv = jnp.concatenate([v[b, :, :lens[b]], v1[b]], axis=1)
            d = calc_diff(out[b], _oracle(q[b], kk, vv, lens[b] + 1))
            assert d < BAR, b

    def test_return_state_lse(self):
        # the emitted lse matches the oracle's logsumexp over live tokens
        q, k, v, k1, v1, cache, lens = self._setup()
        out, lse = sageattn_decode_paged(
            q, cache, pages_bucket=pages_bucket_for(cache),
            return_state=True, interpret=True)
        G = q.shape[1] // k.shape[1]
        sm = 1.0 / (k.shape[-1] ** 0.5)
        for b in range(2):
            ke = jnp.repeat(k[b, :, :lens[b]], G, axis=0)
            s = jnp.einsum("htd,hsd->hts", q[b].astype(jnp.float32),
                           ke.astype(jnp.float32)) * sm
            ref = jax.scipy.special.logsumexp(s, axis=-1)
            # int8 logits carry ~1% relative error at |s|~10 -> lse within
            # ~0.1 nat; the deferred merge only needs this order (one
            # token's weight off by e^0.1 among thousands)
            assert float(jnp.max(jnp.abs(lse[b] - ref))) < 1.5e-1, b

    def test_rejects_windows(self):
        from sageattention_tpu.paged import paged_decode_step_deferred
        q, k, v, k1, v1, cache, lens = self._setup()
        with pytest.raises(ValueError):
            sageattn_decode_paged(q, cache, sliding_window=128,
                                  return_state=True, interpret=True)


class TestBlockStaged:
    def test_matches_classic_steps(self):
        from sageattention_tpu.paged import paged_decode_block_staged
        B, Hq, Hk, D, T = 2, 4, 2, 64, 4
        lens = [300, 517]
        r = jax.random.split(jax.random.PRNGKey(0), 5)
        k = jax.random.normal(r[0], (B, Hk, 768, D), jnp.float32)
        k = k.at[..., :2].add(jnp.asarray([7.0, -5.0]))  # lse repair live
        v = jax.random.normal(r[1], (B, Hk, 768, D), jnp.float32)
        alloc = PageAllocator(16, PAGE)
        rows = [alloc.reserve(3) + alloc.reserve(1) for _ in range(B)]
        table = build_table(rows, max_pages=4)
        cache = paged_prefill(k, v, jnp.asarray(lens), table, num_pages=16)
        qs = jax.random.normal(r[2], (T, B, Hq, 1, D), jnp.float32)
        kn = jax.random.normal(r[3], (T, B, Hk, 1, D), jnp.float32)
        vn = jax.random.normal(r[4], (T, B, Hk, 1, D), jnp.float32)
        bucket = pages_bucket_for(np.asarray(lens) + T, PAGE)
        c = cache
        refs = []
        for t in range(T):
            c = paged_append(c, kn[t], vn[t])
            refs.append(sageattn_decode_paged(qs[t], c, pages_bucket=bucket,
                                              interpret=True))
        outs, c2 = paged_decode_block_staged(qs, cache, kn, vn,
                                             pages_bucket=bucket,
                                             interpret=True)
        assert calc_diff(outs, jnp.stack(refs)) < 5e-4
        assert [int(x) for x in c2.lengths] == [L + T for L in lens]
