"""Paged int8 KV cache: pooled pages + per-sequence block tables (serving).

The dense `decode.KVCache` preallocates one contiguous buffer per sequence
and shares a single length across the batch; real serving wants neither —
sequences arrive and finish independently, memory should be pooled, and a
common prompt prefix should be stored once.  This module provides the
vLLM-style answer on TPU: a page pool, per-sequence block tables, ragged
per-sequence lengths, and prefix sharing, with the table driving the
kernel's DMA schedule directly (`ops/paged_decode.py`).

Beyond the reference's scope (thu-ml/SageAttention is prefill-only,
`/root/reference/sageattention/core.py`); quantization choices mirror
`decode.py` with one structural difference: **centering and V scales are
pool-global** (per KV head/channel, not per sequence).  Pages are
sequence-agnostic objects — a page quantized under sequence-local stats
could not be shared, and mixing pages with different K means would break
the softmax shift-invariance that makes fixed centering exact.  Global
stats lose a little granularity vs the dense cache; per-token K scales
(exact for any append) carry the accuracy.

Typical flow::

    alloc = PageAllocator(num_pages=4096, page_size=256)
    table = np.stack([alloc.reserve(n_pages_for(seq)) for seq in batch])
    cache = paged_prefill(k, v, lengths, table, num_pages=4096)
    ...
    cache = paged_append(cache, k_new, v_new)        # one token per seq
    out = sageattn_decode_paged(q, cache, pages_bucket=...)
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import dispatch
from .decode import FP8_SCALE_MAX, _quant_v, _v_format
from .ops.attention import LOG2E
from .ops.paged_decode import _TQ, paged_decode_call
from .utils.layout import get_layout, round_up

_PAGE_DEFAULT = 256
# superpage-run consolidation default (R pages per DMA block when the
# table cooperates): validated + measured on v5e r5 (probe_superpage.py —
# page=256 decode 1.23x -> 0.83x dense @16K, 1.07x @128K).
_RUNS_DEFAULT = 4
_RUNS_GRAIN = 4   # allocator run-alignment grain == kernel run_len


class PagedKVCache(NamedTuple):
    """Pooled paged cache (a pytree — jit/donate friendly).

    ``page_table[b, j]`` is the physical page holding tokens
    ``j*page .. (j+1)*page-1`` of sequence ``b``; slots past the sequence's
    last live page are ignored (the decode wrapper clamps them for DMA
    reuse).  Rows of different sequences may reference the same physical
    page (shared prefix) — all stats are pool-global, so shared pages are
    exact for every reader.
    """

    k8_pool: jax.Array     # [P, Hk, page, D] int8 (centered by k_mean)
    ks_pool: jax.Array     # [P, Hk, 1, page] f32 per-token scales
    v_pool: jax.Array      # [P, Hk, page, D] int8 (centered) or bf16
    v_scale: jax.Array     # [1, Hk, 1, D] f32 (ones when V is bf16)
    v_mean: jax.Array      # [1, Hk, 1, D] f32
    k_mean: jax.Array      # [1, Hk, 1, D] f32
    page_table: jax.Array  # [B, max_pages] int32
    lengths: jax.Array     # [B] int32

    @property
    def page_size(self) -> int:
        return self.k8_pool.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k8_pool.shape[0]

    @property
    def v_int8(self) -> bool:
        return self.v_pool.dtype == jnp.int8


class PageAllocator:
    """Host-side free-list page allocator (numpy; never traced).

    The cache pytree stays device-side and jit-friendly; which physical
    pages a sequence owns is a host scheduling decision, exactly as in
    CPU-side serving engines.  ``reserve`` hands out pages, ``release``
    returns them (refcounted so shared prefixes free correctly).
    """

    def __init__(self, num_pages: int, page_size: int = _PAGE_DEFAULT):
        self.page_size = page_size
        self._free = list(range(num_pages - 1, -1, -1))
        self._refs = np.zeros(num_pages, np.int32)

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def reserve(self, n: int) -> list[int]:
        if n > len(self._free):
            raise MemoryError(f"page pool exhausted: need {n}, "
                              f"have {len(self._free)}")
        # Run-aware (r5): hand out _RUNS_GRAIN-aligned consecutive groups
        # first, remainder ascending — the decode kernel fetches aligned
        # runs as single DMA blocks (ops/paged_decode.py run_len), so
        # the allocator keeps run coverage high even after pool churn.
        R = _RUNS_GRAIN
        free = sorted(self._free)
        free_set = set(free)
        take: list[int] = []
        if n >= R:
            for p in free:
                if len(take) + R > n:
                    break
                if p % R == 0 and all(p + i in free_set for i in range(R)):
                    run = [p + i for i in range(R)]
                    take += run
                    free_set.difference_update(run)
        if len(take) < n:
            rest = [p for p in free if p in free_set][:n - len(take)]
            take += rest
            free_set.difference_update(rest)
        self._free = [p for p in free if p in free_set]
        self._refs[take] += 1
        return take

    def share(self, pages: Sequence[int]) -> list[int]:
        """Add a reference to already-reserved pages (prefix sharing)."""
        self._refs[list(pages)] += 1
        return list(pages)

    def release(self, pages: Sequence[int]) -> None:
        for p in pages:
            self._refs[p] -= 1
            if self._refs[p] == 0:
                self._free.append(p)
            elif self._refs[p] < 0:
                raise ValueError(f"double release of page {p}")

    def pages_for(self, length: int) -> int:
        return -(-max(length, 1) // self.page_size)


def build_table(rows: Sequence[Sequence[int]], max_pages: int) -> np.ndarray:
    """Pad per-sequence page lists into the rectangular [B, max_pages]
    table (pad value 0 — dead slots are clamped before the kernel sees
    them, so any valid page id works)."""
    table = np.zeros((len(rows), max_pages), np.int32)
    for b, r in enumerate(rows):
        if len(r) > max_pages:
            raise ValueError(f"sequence {b} needs {len(r)} pages > "
                             f"max_pages {max_pages}")
        table[b, :len(r)] = r
    return table


def _masked_mean(x, lengths):
    """Mean over each sequence's true tokens, pooled across the batch:
    [B, Hk, S, D] -> [1, Hk, 1, D]."""
    B, Hk, S, D = x.shape
    valid = (jnp.arange(S)[None, :, None] < lengths[:, None, None]
             )[:, None]                                     # [B,1,S,1]
    total = jnp.sum(jnp.where(valid, x, 0.0), axis=(0, 2), keepdims=True)
    count = jnp.maximum(jnp.sum(lengths), 1).astype(jnp.float32)
    return (total / count)[0:1]                             # [1,Hk,1,D]


def paged_prefill(
    k,
    v,
    lengths,
    page_table,
    *,
    num_pages: int,
    page_size: int = _PAGE_DEFAULT,
    tensor_layout: str = "HND",
    smooth_k: bool = True,
    smooth_v: bool = True,
    v_quant: bool = True,
    v_margin: float = 1.25,
    v_format: Optional[str] = None,
) -> PagedKVCache:
    """Quantize a ragged prefill batch into a fresh page pool.

    ``k``/``v``: [B, Hk, S_pad, D] (HND) with per-sequence true lengths in
    ``lengths`` (pad tokens are ignored for stats and masked at decode);
    ``page_table``: [B, max_pages] int (from :class:`PageAllocator` /
    :func:`build_table`).  S_pad must be a multiple of the page size
    implied by ``page_table``'s pool geometry — pass page-aligned padding.

    Only pages listed in the table are written; the rest of the pool stays
    zero (callers growing a pool incrementally should scatter into an
    existing cache via :func:`paged_append` instead).
    """
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    B, Hk, S, D = k.shape
    page_table = jnp.asarray(page_table, jnp.int32)
    max_pages = page_table.shape[1]
    page = page_size
    if S % page:
        raise ValueError(f"prefill length {S} must be page-aligned "
                         f"({page}); pad the input")
    n_seq_pages = S // page
    if n_seq_pages > max_pages:
        raise ValueError(f"{n_seq_pages} prefill pages > max_pages "
                         f"{max_pages}")
    lengths = jnp.asarray(lengths, jnp.int32)

    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    km = (_masked_mean(kf, lengths) if smooth_k
          else jnp.zeros((1, Hk, 1, D), jnp.float32))
    vm = (_masked_mean(vf, lengths) if smooth_v
          else jnp.zeros((1, Hk, 1, D), jnp.float32))

    valid = (jnp.arange(S)[None, :, None] < lengths[:, None, None])[:, None]
    kc = jnp.where(valid, kf - km, 0.0)
    a = jnp.max(jnp.abs(kc), axis=-1, keepdims=True)       # [B,Hk,S,1]
    ks = jnp.where(a > 1e-8, a * (1.0 / 127.0), 1.0)
    k8 = jnp.clip(jnp.rint(kc / ks), -127, 127).astype(jnp.int8)

    vc = jnp.where(valid, vf - vm, 0.0)
    fmt = _v_format(v_quant, v_format)
    if fmt != "bf16":
        qmax = 127.0 if fmt == "int8" else FP8_SCALE_MAX
        vdt = jnp.int8 if fmt == "int8" else jnp.float8_e4m3fn
        av = jnp.max(jnp.abs(vc), axis=(0, 2), keepdims=True)  # [1,Hk,1,D]
        vs = jnp.where(av > 1e-8, av * (v_margin / qmax), 1.0)
        vq = _quant_v(vc, 0.0, vs, vdt)
        # fold the pool-global per-channel rounding bias into v_mean
        # (see decode.kv_cache_init — decode outputs are means, channel
        # bias does not average out); pads quantize to 0 so the masked
        # mean is sum(codes)/valid-count
        count = jnp.maximum(jnp.sum(lengths), 1).astype(jnp.float32)
        # optimization_barrier: see core.py — without it XLA:TPU cancels
        # the fp8 quantize/upcast round-trip under jit and the fold
        # becomes a no-op
        vq = jax.lax.optimization_barrier(vq)
        code_mean = (jnp.sum(vq.astype(jnp.float32), axis=(0, 2),
                             keepdims=True) / count)[0:1]
        vm = vm - code_mean * vs
    else:
        vs = jnp.ones((1, Hk, 1, D), jnp.float32)
        vq = vc.astype(jnp.bfloat16)

    # scatter the sequences' pages into the pool: [B*n, Hk, page, D].
    # A sequence shorter than the padded input OWNS fewer pages than
    # n_seq_pages — its table row is padded with 0s (build_table), and
    # writing those slots would clobber whichever sequence really owns
    # page 0 (found by the r4 TPU drive: len-700/500 pair at S_pad=768,
    # seq1's dead third slot zeroed seq0's first page).  Redirect dead
    # slots out of range; ``mode='drop'`` discards them, the same
    # convention paged_append uses for page-crossing writes.
    n_pages_of = -(-lengths // page)                        # [B] ceil; 0→0
    slot_live = (jnp.arange(n_seq_pages)[None, :]
                 < n_pages_of[:, None])                     # [B,n]
    phys = jnp.where(slot_live, page_table[:, :n_seq_pages],
                     num_pages).reshape(-1)                 # [B*n]
    k_pages = k8.reshape(B, Hk, n_seq_pages, page, D)
    k_pages = jnp.moveaxis(k_pages, 2, 1).reshape(-1, Hk, page, D)
    v_pages = vq.reshape(B, Hk, n_seq_pages, page, D)
    v_pages = jnp.moveaxis(v_pages, 2, 1).reshape(-1, Hk, page, D)
    ks_rows = jnp.swapaxes(ks, 2, 3)                        # [B,Hk,1,S]
    ks_pages = ks_rows.reshape(B, Hk, 1, n_seq_pages, page)
    ks_pages = jnp.moveaxis(ks_pages, 3, 1).reshape(-1, Hk, 1, page)

    k8_pool = jnp.zeros((num_pages, Hk, page, D), jnp.int8
                        ).at[phys].set(k_pages, mode="drop")
    ks_pool = jnp.ones((num_pages, Hk, 1, page), jnp.float32
                       ).at[phys].set(ks_pages, mode="drop")
    v_pool = jnp.zeros((num_pages, Hk, page, D), vq.dtype
                       ).at[phys].set(v_pages, mode="drop")
    return PagedKVCache(k8_pool, ks_pool, v_pool, vs, vm, km,
                        page_table, lengths)


def paged_insert(
    cache: PagedKVCache,
    slot: int,
    k,
    v,
    length,
    pages: Sequence[int],
    *,
    start_page: int = 0,
    tensor_layout: str = "HND",
) -> PagedKVCache:
    """Admit a new sequence into batch ``slot`` of an existing pool
    (continuous batching: a finished sequence released its pages, a new
    request reuses the slot).  ``k``/``v``: [Hk, S_pad, D] page-aligned;
    ``pages``: the physical pages reserved for it (host-side list).

    ``start_page``: prefix caching (`serving.PrefixCachingAllocator`) —
    the first ``start_page`` entries of ``pages`` already hold this
    prompt's prefix (quantized by an earlier request; pool-global stats
    make shared pages exact for every reader), and ``k``/``v`` cover only
    the SUFFIX tokens from position ``start_page * page_size``.  Only the
    fresh pages are written; the table row points at all of them.

    Quantizes with the POOL's fixed stats — the pool's centering never
    changes after creation, which is what keeps every other sequence's
    codes valid.  New data with drastically different statistics than the
    pool was built on degrades gracefully (per-token K scales absorb K;
    V clips at the global scale) — rebuild the pool when the workload
    shifts regime.
    """
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        k = jnp.swapaxes(k, 0, 1)
        v = jnp.swapaxes(v, 0, 1)
    Hk, S, D = k.shape
    page = cache.page_size
    if S % page:
        raise ValueError(f"insert length {S} must be page-aligned ({page})")
    n = S // page
    if start_page + n > len(pages):
        raise ValueError(f"{start_page}+{n} pages of data but only "
                         f"{len(pages)} reserved")
    if len(pages) > cache.page_table.shape[1]:
        raise ValueError(f"{len(pages)} pages > table width "
                         f"{cache.page_table.shape[1]}")
    kc = k.astype(jnp.float32) - cache.k_mean[0]            # [Hk,S,D]
    a = jnp.max(jnp.abs(kc), axis=-1, keepdims=True)
    ks = jnp.where(a > 1e-8, a * (1.0 / 127.0), 1.0)
    k8 = jnp.clip(jnp.rint(kc / ks), -127, 127).astype(jnp.int8)
    vc = v.astype(jnp.float32) - cache.v_mean[0]
    if cache.v_pool.dtype == jnp.bfloat16:
        vq = vc.astype(jnp.bfloat16)
    else:
        vq = _quant_v(vc, 0.0, cache.v_scale[0], cache.v_pool.dtype)

    phys = jnp.asarray(list(pages[start_page:start_page + n]), jnp.int32)
    k_pages = jnp.moveaxis(k8.reshape(Hk, n, page, D), 1, 0)
    v_pages = jnp.moveaxis(vq.reshape(Hk, n, page, D), 1, 0)
    ks_pages = jnp.moveaxis(
        jnp.swapaxes(ks, 1, 2).reshape(Hk, 1, n, page), 2, 0)
    row = jnp.zeros((cache.page_table.shape[1],), jnp.int32
                    ).at[:len(pages)].set(jnp.asarray(list(pages), jnp.int32))
    return cache._replace(
        k8_pool=cache.k8_pool.at[phys].set(k_pages),
        ks_pool=cache.ks_pool.at[phys].set(ks_pages),
        v_pool=cache.v_pool.at[phys].set(v_pages),
        page_table=cache.page_table.at[slot].set(row),
        lengths=cache.lengths.at[slot].set(jnp.asarray(length, jnp.int32)),
    )


def paged_append(cache: PagedKVCache, k_new, v_new,
                 *, active=None, tensor_layout: str = "HND") -> PagedKVCache:
    """Quantize ``T`` new tokens per sequence (with the pool's fixed stats)
    and write each at its sequence's own ``lengths[b] + t`` — ragged-batch
    append.  The block table must already cover the grown length (reserve
    pages on the host before the jitted step).

    ``active``: optional [B] bool — continuous batching runs one jitted
    step over all slots, but finished/empty slots must neither write nor
    advance: their scatters are redirected out of range (``mode='drop'``,
    so nothing in the pool is touched) and their lengths stay put.
    """
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        k_new = jnp.swapaxes(k_new, 1, 2)
        v_new = jnp.swapaxes(v_new, 1, 2)
    B, Hk, T, D = k_new.shape
    page = cache.page_size
    kc = k_new.astype(jnp.float32) - cache.k_mean
    a = jnp.max(jnp.abs(kc), axis=-1, keepdims=True)
    ks = jnp.where(a > 1e-8, a * (1.0 / 127.0), 1.0)        # [B,Hk,T,1]
    k8 = jnp.clip(jnp.rint(kc / ks), -127, 127).astype(jnp.int8)
    vc = v_new.astype(jnp.float32) - cache.v_mean
    if cache.v_pool.dtype == jnp.bfloat16:
        vq = vc.astype(jnp.bfloat16)
    else:
        vq = _quant_v(vc, 0.0, cache.v_scale, cache.v_pool.dtype)

    k8_pool, ks_pool, v_pool = cache.k8_pool, cache.ks_pool, cache.v_pool
    bidx = jnp.arange(B)
    if active is None:
        grow = jnp.full((B,), T, jnp.int32)
    else:
        active = jnp.asarray(active, bool)
        grow = jnp.where(active, T, 0).astype(jnp.int32)
    if B * T <= 32:
        # Decode-class appends write via per-row dynamic_update_slice:
        # XLA:TPU aliases DUS in-place where the drop-mode scatter forced
        # a per-step copy of the k8/v pools inside serving scans —
        # measured 1.29x on the serving step, bitwise-identical
        # (r5_dus_probe.log / r5_step_profile2.log).  Inactive rows
        # write their OLD token back (a 1-token read-modify-write no-op).
        for t in range(T):
            pos = cache.lengths + t                         # [B]
            for b in range(B):
                phys = cache.page_table[b, pos[b] // page]
                off = pos[b] % page
                k1 = k8[b:b + 1, :, t:t + 1]                # [1,Hk,1,D]
                s1 = jnp.swapaxes(ks[b:b + 1, :, t:t + 1], 2, 3)
                v1 = vq[b:b + 1, :, t:t + 1]
                if active is not None:
                    k_old = jax.lax.dynamic_slice(
                        k8_pool, (phys, 0, off, 0), k1.shape)
                    s_old = jax.lax.dynamic_slice(
                        ks_pool, (phys, 0, 0, off), s1.shape)
                    v_old = jax.lax.dynamic_slice(
                        v_pool, (phys, 0, off, 0), v1.shape)
                    k1 = jnp.where(active[b], k1, k_old)
                    s1 = jnp.where(active[b], s1, s_old)
                    v1 = jnp.where(active[b], v1, v_old)
                k8_pool = jax.lax.dynamic_update_slice(
                    k8_pool, k1, (phys, 0, off, 0))
                ks_pool = jax.lax.dynamic_update_slice(
                    ks_pool, s1, (phys, 0, 0, off))
                v_pool = jax.lax.dynamic_update_slice(
                    v_pool, v1, (phys, 0, off, 0))
    else:
        for t in range(T):
            pos = cache.lengths + t                         # [B]
            phys = cache.page_table[bidx, pos // page]      # [B]
            if active is not None:
                phys = jnp.where(active, phys, cache.num_pages)  # drop
            off = pos % page                                # [B]
            k8_pool = k8_pool.at[phys, :, off].set(k8[:, :, t], mode="drop")
            ks_pool = ks_pool.at[phys, :, 0, off].set(ks[:, :, t, 0],
                                                      mode="drop")
            v_pool = v_pool.at[phys, :, off].set(vq[:, :, t], mode="drop")
    return cache._replace(k8_pool=k8_pool, ks_pool=ks_pool, v_pool=v_pool,
                          lengths=cache.lengths + grow)


def paged_decode_step_deferred(
    q,
    cache: PagedKVCache,
    k_new,
    v_new,
    *,
    pages_bucket: int = 0,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """One continuous-batching step with the append DEFERRED past the
    attention read: the heavy paged kernel attends the PRE-append cache
    while the new token's exact contribution is merged from (q, k_new,
    v_new) directly, so the kernel and the append are data-independent
    inside the step.  Measured NEUTRAL on v5e (logs/r5_deferred.log:
    1328 vs 1297 us/step, numerics 3.9e-6): XLA keeps the append in-place
    by ordering it after the kernel's pool reads, so the hoped-for
    overlap does not materialize — the fused-append kernel remains the
    documented next step (PERF_NOTES "Serving-step anatomy").  Kept as
    the exact-merge reference implementation; its ``return_state`` lse
    plumbing is independently useful (partial merges, ring-style
    serving).

    Exact softmax merge via the kernel's lse (``return_state``):
    out = (e^{lse_c - m} * o_c + e^{s1 - m} * v1) / (e^{lse_c - m} + e^{s1 - m}),
    s1 = q.k1 * sm_scale.  The merged step uses the UNQUANTIZED new token
    (slightly more accurate than the cache codes the next step reads — the
    difference is bounded by the per-token quant error, same order as the
    cache itself).  Plain T=1 decode only.

    Returns (out [B, Hq, 1, D], new_cache).  HND only.
    """
    B, Hq, T, D = q.shape
    if T != 1:
        raise ValueError("deferred step is T=1 decode only")
    Hk = cache.k8_pool.shape[1]
    G = Hq // Hk
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    o_c, lse_c = sageattn_decode_paged(
        q, cache, pages_bucket=pages_bucket, sm_scale=sm_scale,
        return_state=True, interpret=interpret)
    new_cache = paged_append(cache, k_new, v_new)
    k1 = jnp.repeat(k_new, G, axis=1).astype(jnp.float32)  # [B, Hq, 1, D]
    v1 = jnp.repeat(v_new, G, axis=1).astype(jnp.float32)
    s1 = jnp.sum(q.astype(jnp.float32) * k1, axis=-1) * sm_scale  # [B,Hq,1]
    m = jnp.maximum(lse_c, s1)
    w_c = jnp.exp(lse_c - m)
    w_1 = jnp.exp(s1 - m)
    out = ((w_c[..., None] * o_c.astype(jnp.float32) + w_1[..., None] * v1)
           / (w_c + w_1)[..., None])
    return out.astype(o_c.dtype), new_cache


def paged_decode_block_staged(
    qs,
    cache: PagedKVCache,
    ks_new,
    vs_new,
    *,
    pages_bucket: int = 0,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """T continuous-batching steps with ONE pool append (block staging).

    Built to test whether the serving scan's +800 us/step over
    decode-only was the per-step pool carry chain: T decodes run against
    a CONSTANT pool (data-independent), each step's not-yet-appended
    block prefix merged exactly via the kernel lse (``return_state``),
    then one T-token append.  Measured NEUTRAL on v5e like the deferred
    step (logs/r5_staged.log: 1.02-1.03x, numerics 4.2e-6) — the residual
    is invariant to classic/deferred/staged/unrolled structure
    (logs/r5_scan_overhead.log), pointing at the kernel<->small-op
    transition cost itself; PERF_NOTES has the anatomy.  Kept as the
    exact-merge reference for block-wise serving:

        out_t = merge(kernel(q_t, cache), dense_attn(q_t, block[:t+1]))

    Causal within the block; the in-block term uses the unquantized new
    tokens (the next block reads them quantized — difference bounded by
    the per-token quant error).  Plain full-attention decode only.

    ``qs``/``ks_new``/``vs_new``: [T, B, H, 1, D] (a scan-style block).
    Returns (outs [T, B, Hq, 1, D], new_cache).  HND only.
    """
    T = qs.shape[0]
    B, Hq, _, D = qs.shape[1:]
    Hk = cache.k8_pool.shape[1]
    G = Hq // Hk
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    kb = jnp.transpose(ks_new[:, :, :, 0], (1, 2, 0, 3))  # [B, Hk, T, D]
    vb = jnp.transpose(vs_new[:, :, :, 0], (1, 2, 0, 3))
    kbe = jnp.repeat(kb, G, axis=1).astype(jnp.float32)  # [B, Hq, T, D]
    vbe = jnp.repeat(vb, G, axis=1).astype(jnp.float32)
    outs = []
    for t in range(T):
        q1 = qs[t]                                      # [B, Hq, 1, D]
        o_c, lse_c = sageattn_decode_paged(
            q1, cache, pages_bucket=pages_bucket, sm_scale=sm_scale,
            return_state=True, interpret=interpret)
        # in-block causal tail: tokens 0..t of the block
        s_tail = jnp.einsum(
            "bhod,bhtd->bhot", q1.astype(jnp.float32),
            kbe[:, :, :t + 1]) * sm_scale               # [B, Hq, 1, t+1]
        m_tail = jnp.max(s_tail, axis=-1)               # [B, Hq, 1]
        w_tail = jnp.exp(s_tail - m_tail[..., None])
        l_tail = jnp.sum(w_tail, axis=-1)
        o_tail = jnp.einsum("bhot,bhtd->bhod", w_tail, vbe[:, :, :t + 1])
        m = jnp.maximum(lse_c, m_tail + jnp.log(l_tail))
        w_c = jnp.exp(lse_c - m)
        w_t = jnp.exp(m_tail - m)                       # tail in its own m
        den = w_c + w_t * l_tail
        out = ((w_c[..., None] * o_c.astype(jnp.float32)
                + w_t[..., None] * o_tail) / den[..., None])
        outs.append(out.astype(o_c.dtype))
    new_cache = paged_append(cache, kb, vb)
    return jnp.stack(outs), new_cache


def paged_trim(cache: PagedKVCache, n) -> PagedKVCache:
    """Roll back the last ``n`` tokens per sequence (speculative decoding:
    rejected draft tokens; scalar or [B] — each slot its own accept
    count).  O(1): lengths move, pages stay, stale codes are masked by
    every decode and overwritten by the next append."""
    n = jnp.asarray(n, jnp.int32)
    return cache._replace(
        lengths=jnp.maximum(cache.lengths - n, 0))


def pages_bucket_for(cache_or_lengths, page_size: int = _PAGE_DEFAULT) -> int:
    """Host-side static page budget covering every sequence (call with
    concrete lengths — bucketed serving picks this per compiled shape)."""
    if isinstance(cache_or_lengths, PagedKVCache):
        lengths = np.asarray(cache_or_lengths.lengths)
        page_size = cache_or_lengths.page_size
    else:
        lengths = np.asarray(cache_or_lengths)
    return int(-(-int(lengths.max()) // page_size))


def _select_ways(page: int, n_pages: int, max_pages: int):
    """Pick the multi-stream DMA width (`ways`) and the ways-rounded page
    budget for plain paged decode.

    Measured sweep @16K/@128K scan us (page=256): 1=2059/2225, 4=1098/1236,
    8=933/1095, 16=872/1013, 32=850/989 — 16 is the knee; beyond it the
    gain is ~2.5% while dead-page streaming at short contexts grows (the
    `want <= n_pages` guard bounds that waste: dead ways clamp to the last
    live page but still stream it once per step).  The knee is really a
    PACKED-WIDTH knee (ways*page ~ 4096): a page-size sweep holding
    ways*page = 4096 (probe_page_size.py) runs page=512 at 1.09-1.12x dense
    and page=1024 at 0.92-0.99x (= dense parity), so the default scales
    ways down as pages grow rather than widening the tile.

    SAGE_PAGED_SPLIT: explicitly set wins ("0" and "1" both force a single
    stream); unset selects the adaptive default.  The adaptive value is
    capped at the measured knee (16): the kernel unrolls a Python loop over
    ways, so tiny pages (e.g. 64) must not explode into 64-way unrolled
    programs for ~0 measured gain.
    """
    env = os.environ.get("SAGE_PAGED_SPLIT")
    want = max(1, int(env)) if env else min(16, max(1, 4096 // page))
    while want > 1:
        rounded = -(-n_pages // want) * want
        if want <= n_pages and rounded <= max_pages:
            return rounded, want
        want //= 2
    return n_pages, 1


def sageattn_decode_paged(
    q,
    cache: PagedKVCache,
    *,
    tensor_layout: str = "HND",
    sm_scale: Optional[float] = None,
    pages_bucket: int = 0,
    is_causal: bool = True,
    sliding_window: int = 0,
    attention_sinks: int = 0,
    return_state: bool = False,  # also return the per-row natural-log lse
    # [B, Hq, T] — the partial-merge hook (plain T=1 decode only; see
    # paged_decode_step_deferred)
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention of ``T`` fresh tokens per sequence against the paged pool.

    ``q``: [B, Hq, T, D] (HND); row ``t`` of sequence ``b`` sits at global
    position ``lengths[b] - T + t`` (append first, then decode).
    ``pages_bucket`` statically bounds the per-sequence page stream
    (0 = the table's full width); pick with :func:`pages_bucket_for`.

    ``sliding_window``: attend only the last ``W`` tokens (SWA-model
    serving, T=1 only).  Zero-copy: the window start shifts each
    sequence's page-table slots via scalar prefetch, so the kernel streams
    ceil(W/page)+1 pages per sequence regardless of how long the cache has
    grown — decode cost stays O(W).  ``attention_sinks``: additionally
    keep the FIRST ``n`` tokens visible (StreamingLLM): their pages ride
    the same stream ahead of the window slots, masked to [0, sinks) so no
    token is counted twice when the regions touch.

    Returns [B, Hq, T, D] bf16 in the input layout.
    """
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        q = jnp.swapaxes(q, 1, 2)
    B, Hq, T, D = q.shape
    _, Hk, page, Dk = cache.k8_pool.shape
    if D != Dk:
        raise ValueError(f"head_dim mismatch: q {D} vs pool {Dk}")
    if Hq % Hk != 0:
        raise ValueError(f"num_qo_heads ({Hq}) must be divisible by "
                         f"num_kv_heads ({Hk})")
    if T > _TQ:
        raise ValueError(f"decode window T={T} exceeds the q tile ({_TQ}); "
                         f"chunk the window")
    if interpret is None:
        interpret = dispatch.default_interpret()
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    max_pages = cache.page_table.shape[1]
    n_pages = pages_bucket or max_pages
    if n_pages > max_pages:
        raise ValueError(f"pages_bucket ({n_pages}) > table width "
                         f"({max_pages})")
    if attention_sinks and not sliding_window:
        raise ValueError("attention_sinks needs sliding_window (full "
                         "attention already sees the sinks)")
    sink_pages = 0
    if sliding_window:
        if T != 1:
            raise ValueError("sliding_window decode supports T=1 (chunk "
                             "verify windows are full-attention)")
        sink_pages = -(-attention_sinks // page) if attention_sinks else 0
        # the stream covers sink pages + at most ceil(W/page)+1 band pages;
        # band_w is the BAND's own slot count — the sink slots must not
        # squeeze it below the window's page span.  The effective table
        # below is built sink_pages + band_w wide, which may exceed
        # max_pages (logical slots, gathered per sequence), so the stream
        # length is NOT capped by pages_bucket/max_pages here: sliding
        # mode's DMA bound is already static in (window, sinks).
        band_w = min(max_pages, (-(-sliding_window // page)) + 1)
        n_pages = (sink_pages + band_w) if sink_pages else \
            min(n_pages, band_w)
    G = Hq // Hk

    # fold GQA heads into tile rows at T=1 (KV stream fetched once per KV
    # head); T>1 keeps per-head rows so the causal window mask sees t.
    fold = T == 1 and G > 1 and G <= _TQ
    if fold:
        qt, Hg = q.reshape(B, Hk, G, D), Hk
    else:
        qt, Hg = q, Hq
    rows = qt.shape[2]
    qt = (qt.astype(jnp.float32) * (sm_scale * LOG2E)).astype(jnp.bfloat16)
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, _TQ - rows), (0, 0)))

    # clamp dead table slots to each sequence's last live page: consecutive
    # grid steps then fetch the same physical block and Mosaic skips the
    # DMA (the bool-mask remap trick, `ops/attention.py:574-585`).  With a
    # sliding window the slots also SHIFT by each sequence's window-start
    # page, so logical stream page j is physical table[b, page0_b + j].
    last_live = jnp.maximum(cache.lengths - 1, 0) // page   # [B]
    lpage = win_lo = None
    slot = jnp.broadcast_to(jnp.arange(max_pages)[None, :],
                            (B, max_pages))
    if sliding_window:
        win_lo = jnp.maximum(cache.lengths - sliding_window, 0)   # [B]
        if attention_sinks:
            # disjoint decomposition: sinks own [0, sinks), the band owns
            # [max(lo, sinks), len) — the kernel masks each slot type to
            # its own region
            win_lo = jnp.maximum(win_lo, attention_sinks)
        band = ((win_lo // page)[:, None]
                + jnp.arange(band_w if sink_pages else max_pages)[None, :])
        slot = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(sink_pages)[None, :],
                              (B, sink_pages)), band], axis=1)
        lpage = slot
    slot_c = jnp.minimum(jnp.minimum(slot, last_live[:, None]),
                         max_pages - 1)
    table_eff = jnp.take_along_axis(cache.page_table, slot_c, axis=1)

    # Multi-stream page DMA (probe_dma_rate: each Pallas operand stream is
    # element-rate bound, streams overlap): fetch `ways` pages per grid
    # step as separate operands.  Plain decode only — the sliding-window
    # stream is already O(window) short.  The bucket rounds UP to a ways
    # multiple (extra slots are dead: table_eff clamps them to the last
    # live page and tok0 >= seq_len skips their compute).
    ways = 1
    run_len = 1
    if not sliding_window:
        n_pages, ways = _select_ways(page, n_pages, max_pages)
        # Superpage runs (r5): when every LIVE R-slot group's physical
        # pages are consecutive and R-aligned, fetch each group as ONE
        # (R,1,page,D) DMA block — the page-256 paged-vs-dense residual
        # was DMA program count, not bytes; measured 1.23x -> 0.83x dense
        # @16K (probe_superpage.py).  The run-aware allocators make this
        # the common case; fragmented tables take the per-page kernel via
        # lax.cond (a per-group mixed-stream kernel was built and measured
        # 1.3-1.9x SLOWER — dual operand sets defeat Mosaic pipelining).
        # SAGE_PAGED_RUNS=1 forces per-page streams (the r4 behavior).
        env = os.environ.get("SAGE_PAGED_RUNS")
        run_len = max(1, int(env)) if env else _RUNS_DEFAULT
        if (ways % run_len or ways < run_len or n_pages % run_len
                or cache.num_pages % run_len):
            run_len = 1

    if return_state and (sliding_window or T > 1):
        raise ValueError("return_state supports plain T=1 decode only")

    def _decode(rl):
        def f(table_arg):
            return paged_decode_call(
                qt, cache.k8_pool, cache.ks_pool, cache.v_pool,
                cache.v_scale, cache.v_mean,
                table_arg, cache.lengths,
                n_pages=n_pages,
                window=T if (is_causal and T > 1) else 1,
                lpage=lpage, win_lo=win_lo, sinks=attention_sinks,
                ways=ways, run_len=rl, emit_state=return_state,
                interpret=interpret,
            )
        return f

    if run_len > 1:
        R = run_len
        grp = table_eff[:, :n_pages].reshape(B, -1, R)
        aligned = jnp.logical_and(
            (grp[..., 0] % R) == 0,
            jnp.all(grp == grp[..., :1] + jnp.arange(R, dtype=grp.dtype),
                    axis=-1))                              # [B, n_groups]
        n_live = -(-cache.lengths // page)                 # [B]
        g_live = (jnp.arange(grp.shape[1], dtype=jnp.int32)[None] * R
                  < n_live[:, None])
        runs_ok = jnp.all(jnp.logical_or(aligned, ~g_live))
        out = jax.lax.cond(runs_ok, _decode(run_len), _decode(1), table_eff)
    else:
        out = _decode(1)(table_eff)
    lse = None
    if return_state:
        out, lse = out
        lse = lse[:, :, :rows, 0] / LOG2E          # base-2 -> natural
        lse = lse.reshape(B, Hq, 1) if fold else lse
        # smooth_k repair: the pool stores K centered by k_mean, so the
        # kernel's lse is shifted by -q.km*sm_scale (shift-invariance
        # hides it from the OUTPUT, not from lse) — same correction as
        # the reference's return_lse (`core.py:328-331`)
        kmq = jnp.repeat(cache.k_mean, Hq // Hk, axis=1)   # [1,Hq,1,D]
        lse = lse + jnp.sum(q.astype(jnp.float32) * kmq,
                            axis=-1) * sm_scale
    out = out[:, :, :rows]
    if fold:
        out = out.reshape(B, Hq, 1, D)
    if not layout.is_hnd:
        out = jnp.swapaxes(out, 1, 2)
    if return_state:
        return out, lse
    return out
