"""Paged decode-attention kernel: block-table KV gather via scalar prefetch.

Serving engines store the KV cache as a pool of fixed-size pages with a
per-sequence block table (vLLM's PagedAttention); the reference
(thu-ml/SageAttention) is prefill-only and has no counterpart — this is
the TPU-native completion of the serving story started in `decode.py`.

TPU-first design:

- **The block table IS the DMA schedule.** A Pallas index map that reads
  the page table from scalar prefetch turns "gather this sequence's pages"
  into the grid's ordinary block fetch — no gather op, no copy into a
  contiguous buffer.  This reuses the machinery proven for bool-mask
  block-skip (`attention.py:574-585`): the map returns a *physical* page id
  per grid step, and slots past a sequence's last live page are clamped to
  the last live id, so consecutive equal indices re-use the resident VMEM
  buffer (Mosaic skips the DMA) instead of streaming dead bytes.
- **bf16 compute on int8 storage.** Decode streams the whole cache past a
  handful of query rows — pure HBM bandwidth, zero MXU pressure — so the
  int8 win is the *byte count* (2x vs bf16), not the MXU rate.  int8 codes
  are exact in bf16 (8 mantissa bits, |code| <= 127), the per-token K scale
  multiplies the (TQ, page) logit tile along lanes (no transpose of the
  scale vector), and the per-channel V scale folds into the epilogue
  exactly as the main kernel's int8-PV path (`attention.py:528-532`).
- **Per-sequence lengths in scalar prefetch.** Each sequence masks its own
  tail (ragged batch decode — the dense `KVCache` shares one length);
  pages entirely past `lengths[b]` skip compute via `pl.when`, and only the
  boundary page pays the iota/compare mask.
- Fixed centering rides for free: K is stored centered by the prefill
  k_mean and q.(k_mean) is constant across a row's tokens, so softmax shift
  invariance erases it (`decode.py` smooth_k argument); V's mean adds back
  in the epilogue since sum_j p_ij = 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import LANES, LOG2E, M_CLAMP, MASK_NEG, _bcast

_TQ = 32  # q-tile rows (>= bf16 sublane tile; holds a GQA fold or a window)


def _paged_kernel(
    table_ref,    # [B, max_pages] int32 (scalar prefetch; index maps + body)
    len_ref,      # [B] int32 (scalar prefetch)
    lpage_ref,    # [B, max_pages] int32: LOGICAL page per grid step — the
    #               position math's counterpart of table_ref's physical ids
    #               (identity for plain decode; window/sink streams reorder)
    lo_ref,       # [B] int32: window lower bound position (0 = none)
    q_ref,        # (1, 1, TQ, D) bf16 — sm_scale*log2e folded by the host
    k_ref,        # (1, 1, page, D) int8 codes (centered)
    ks_ref,       # (1, 1, 1, page) f32 per-token scales
    v_ref,        # (1, 1, page, D) int8 codes or bf16 (centered)
    vs_ref,       # (1, 1, 1, D) f32 per-channel (int8 V; ones for bf16)
    vm_ref,       # (1, 1, 1, D) f32 per-channel mean
    o_ref,        # (1, 1, TQ, D) bf16
    m_scr, l_scr, acc_scr,
    *,
    n_pages: int,
    page: int,
    window: int,   # T: rows are a causal window of T fresh tokens (1 = none)
    sliding: bool,  # window lower-bound masking active (lo_ref is live)
    sinks: int,     # StreamingLLM attention sinks: the first `sinks` tokens
    #                 stay visible; grid steps jp < ceil(sinks/page) stream
    #                 the sink pages, the rest stream the window (disjoint
    #                 by construction: the wrapper raises lo to >= sinks)
):
    b = pl.program_id(0)
    jp = pl.program_id(2)
    seq_len = len_ref[b]
    sink_pages = -(-sinks // page) if sinks else 0

    @pl.when(jp == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, M_CLAMP)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    tok0 = lpage_ref[b, jp] * page
    run = tok0 < seq_len
    if sliding:
        in_band = tok0 + page > lo_ref[b]
        if sinks:
            in_band = jnp.logical_or(in_band, jp < sink_pages)
        run = jnp.logical_and(run, in_band)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]                                   # (TQ, D) bf16
        k = k_ref[0, 0].astype(jnp.bfloat16)              # codes exact
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (TQ, page)
        s = s * ks_ref[0, 0]                              # (1, page) lanes
        # base-2 logits from here (log2e folded into q by the host)

        if window > 1:
            # rows r < window sit at global position seq_len - window + r
            # (the causal compare subsumes the tail mask: cols <= seq_len-1);
            # pad rows (r >= window) compute garbage the host slices off.
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + tok0
            s = jnp.where(cols <= rows + (seq_len - window), s, MASK_NEG)
        else:
            # tail mask; pages entirely inside (tok0 + page <= seq_len) keep
            # the predicate all-true and the select folds to a no-op cheaply
            # relative to the page-wide dot (decode is DMA-bound anyway).
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + tok0
            keep = cols < seq_len
            if sliding and sinks:
                # sink slots keep [0, sinks); window slots keep [lo, len) —
                # the wrapper guarantees lo >= sinks, so no token is
                # softmax-counted twice even when the regions touch.
                # Boolean algebra, not jnp.where: Mosaic can't legalize
                # arith.select on i1 vectors (measured r4, probe_serving).
                is_sink_page = jp < sink_pages
                keep = jnp.logical_and(
                    keep,
                    jnp.logical_or(
                        jnp.logical_and(is_sink_page, cols < sinks),
                        jnp.logical_and(jnp.logical_not(is_sink_page),
                                        cols >= lo_ref[b])))
            elif sliding:
                keep = jnp.logical_and(keep, cols >= lo_ref[b])
            s = jnp.where(keep, s, MASK_NEG)

        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(jnp.maximum(m_prev, m_cur), M_CLAMP)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - _bcast(m_next, s.shape[1]))
        l_cur = jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, 0]
        if v.dtype != jnp.bfloat16:
            # int8 codes are exact in bf16 (8 mantissa bits >= |code| <= 127)
            # and so is fp8 e4m3 (3 mantissa bits < bf16's 7): storage-rate
            # win either way, scale applied in the epilogue
            v = v.astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[...] = m_next
        l_scr[...] = alpha * l_scr[...] + l_cur
        acc_scr[...] = acc_scr[...] * _bcast(alpha, acc_scr.shape[-1]) + pv

    @pl.when(jp == n_pages - 1)
    def _epilogue():
        D = acc_scr.shape[-1]
        l = l_scr[...]
        o = acc_scr[...] * _bcast(1.0 / jnp.where(l == 0.0, 1.0, l), D)
        o = o * vs_ref[0, 0] + vm_ref[0, 0]               # (1, D) broadcasts
        o_ref[0, 0] = o.astype(o_ref.dtype)


def paged_decode_call(
    q,            # [B, Hg, TQ, D] bf16, scale pre-folded, rows pre-padded
    k8_pool,      # [P, Hk, page, D] int8
    ks_pool,      # [P, Hk, 1, page] f32
    v_pool,       # [P, Hk, page, D] int8 | bf16
    v_scale,      # [1, Hk, 1, D] f32 — POOL-GLOBAL (pages are
    v_mean,       # [1, Hk, 1, D] f32   sequence-agnostic: prefix sharing)
    table_eff,    # [B, max_pages] int32 — dead slots clamped to last live
    lengths,      # [B] int32
    *,
    n_pages: int,     # static page budget (<= max_pages): the DMA bucket
    window: int,      # T>1 causal window; 1 for plain decode
    lpage=None,       # [B, max_pages] int32 logical page per grid step
    win_lo=None,      # [B] int32 sliding-window lower bound position
    sinks: int = 0,   # StreamingLLM sink tokens (sliding mode only)
    interpret: bool = False,
):
    """Launch the paged decode kernel.  ``Hg`` is the grid's head count:
    Hk when the host folded GQA query heads into the tile rows, else Hq
    (the kv index map divides by ``Hg // Hk``)."""
    B, Hg, TQ, D = q.shape
    P, Hk, page, _ = k8_pool.shape
    assert TQ == _TQ, (TQ, _TQ)
    assert Hg % Hk == 0
    G = Hg // Hk
    assert n_pages <= table_eff.shape[1], (n_pages, table_eff.shape)
    sliding = win_lo is not None
    if lpage is None:
        lpage = jnp.broadcast_to(jnp.arange(table_eff.shape[1],
                                            dtype=jnp.int32)[None],
                                 table_eff.shape)
    if win_lo is None:
        win_lo = jnp.zeros((B,), jnp.int32)

    def kv_im(b, h, jp, table, *_):
        return (table[b, jp], h // G, 0, 0)

    def ks_im(b, h, jp, table, *_):
        return (table[b, jp], h // G, 0, 0)

    grid = (B, Hg, n_pages)
    in_specs = [
        pl.BlockSpec((1, 1, TQ, D), lambda b, h, jp, *_: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, page, D), kv_im),
        pl.BlockSpec((1, 1, 1, page), ks_im),
        pl.BlockSpec((1, 1, page, D), kv_im),
        pl.BlockSpec((1, 1, 1, D), lambda b, h, jp, *_: (0, h // G, 0, 0)),
        pl.BlockSpec((1, 1, 1, D), lambda b, h, jp, *_: (0, h // G, 0, 0)),
    ]
    kernel = functools.partial(_paged_kernel, n_pages=n_pages, page=page,
                               window=window, sliding=sliding, sinks=sinks)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, TQ, D),
                                   lambda b, h, jp, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((TQ, LANES), jnp.float32),
                pltpu.VMEM((TQ, LANES), jnp.float32),
                pltpu.VMEM((TQ, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hg, TQ, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(table_eff.astype(jnp.int32), lengths.astype(jnp.int32),
      lpage.astype(jnp.int32), win_lo.astype(jnp.int32),
      q, k8_pool, ks_pool, v_pool, v_scale, v_mean)
