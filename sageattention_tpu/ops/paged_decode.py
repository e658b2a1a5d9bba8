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
    *rest,        # ways x k (1,1,page,D) int8, ways x ks (1,1,1,page) f32,
    #               ways x v (1,1,page,D) int8|bf16, then vs, vm, o_ref and
    #               the m/l/acc scratch — parsed below (kv_split-style
    #               multi-stream DMA, `attention.AttnConfig.kv_split`)
    n_pages: int,   # kv GRID extent (total page slots = n_pages * ways)
    page: int,
    window: int,   # T: rows are a causal window of T fresh tokens (1 = none)
    sliding: bool,  # window lower-bound masking active (lo_ref is live)
    sinks: int,     # StreamingLLM attention sinks: the first `sinks` tokens
    #                 stay visible; grid steps jp < ceil(sinks/page) stream
    #                 the sink pages, the rest stream the window (disjoint
    #                 by construction: the wrapper raises lo to >= sinks)
    ways: int,      # concurrent page streams per grid step (probe_dma_rate:
    #                 operand streams are element-rate bound but overlap)
    run_len: int,   # R consecutive physical pages per DMA block (1 = off):
    #                 each stream's block is (R, 1, page, D) so one DMA
    #                 program moves R pages — the page-granularity tax is
    #                 program COUNT, not bytes (probe_superpage.py)
    emit_state: bool,  # also write the per-row lse (base-2, lane-
    #                 replicated (TQ, LANES)) — the partial-merge hook for
    #                 the deferred-append serving step (paged.py
    #                 paged_decode_step_deferred) and ring-style merges
):
    R = run_len
    n_streams = ways // R
    if R > 1:
        # the run table rides as a 5th scalar-prefetch operand consumed
        # by the index maps only; q_ref actually holds it in that case
        _tsup_ref, q_ref, rest = q_ref, rest[0], rest[1:]
    k_refs = rest[0:n_streams]
    ks_refs = rest[n_streams:2 * n_streams]
    v_refs = rest[2 * n_streams:3 * n_streams]
    if emit_state:
        (vs_ref, vm_ref, o_ref, lse_ref,
         m_scr, l_scr, acc_scr) = rest[3 * n_streams:]
    else:
        vs_ref, vm_ref, o_ref, m_scr, l_scr, acc_scr = rest[3 * n_streams:]

    def k_tile(w):
        return k_refs[w // R][w % R, 0]

    def ks_tile(w):
        return ks_refs[w // R][w % R, 0]

    def v_tile(w):
        return v_refs[w // R][w % R, 0]
    b = pl.program_id(0)
    jp = pl.program_id(2)
    seq_len = len_ref[b]
    sink_pages = -(-sinks // page) if sinks else 0

    @pl.when(jp == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, M_CLAMP)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Group liveness: ways fetch ASCENDING page slots, so for the plain
    # stream the group is live iff its first slot is (later slots are
    # masked per column); sliding/sink streams OR the per-way conditions.
    tok0s = [lpage_ref[b, jp * ways + w] * page for w in range(ways)]
    run = tok0s[0] < seq_len
    if sliding:
        run = tok0s[0] < seq_len
        grp = jnp.logical_and(tok0s[0] < seq_len,
                              tok0s[0] + page > lo_ref[b])
        if sinks:
            grp = jnp.logical_or(grp, jp * ways < sink_pages)
        for w in range(1, ways):
            live = jnp.logical_and(tok0s[w] < seq_len,
                                   tok0s[w] + page > lo_ref[b])
            if sinks:
                live = jnp.logical_or(live, jp * ways + w < sink_pages)
            grp = jnp.logical_or(grp, live)
        run = grp

    @pl.when(run)
    def _body():
        # PACKED body: the ways' page tiles fuse into one (TQ, ways*page)
        # logit tile so the mask/softmax chain runs once at 4x the width —
        # per-op overhead on (32, 256) tiles was the paged kernel's real
        # bound (probe_decode_split.py: the dense kernel's same fix), not
        # DMA.  Dead ways inside a boundary group are masked per column
        # (cols >= seq_len), exactly like a partially-filled page.
        q = q_ref[0, 0]                                   # (TQ, D) bf16

        def _s_of(k_t, ks_t):
            sw = jax.lax.dot_general(
                q, k_t.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (TQ, page)
            return sw * ks_t                              # (1, page) lanes

        s_parts, col_parts, keep_parts = [], [], []
        for w in range(ways):
            s_parts.append(_s_of(k_tile(w), ks_tile(w)))
            cw = (jax.lax.broadcasted_iota(jnp.int32, (_TQ, page), 1)
                  + tok0s[w])
            col_parts.append(cw)
            if sliding and sinks:
                # sink slots keep [0, sinks); window slots keep [lo, len) —
                # the wrapper guarantees lo >= sinks, so no token is
                # softmax-counted twice even when the regions touch.
                # Boolean algebra, not jnp.where: Mosaic can't legalize
                # arith.select on i1 vectors (measured r4, probe_serving).
                is_sink_page = jp * ways + w < sink_pages
                keep_parts.append(jnp.logical_or(
                    jnp.logical_and(is_sink_page, cw < sinks),
                    jnp.logical_and(jnp.logical_not(is_sink_page),
                                    cw >= lo_ref[b])))
        s = (s_parts[0] if ways == 1
             else jnp.concatenate(s_parts, axis=1))
        cols = (col_parts[0] if ways == 1
                else jnp.concatenate(col_parts, axis=1))
        # base-2 logits from here (log2e folded into q by the host)

        if window > 1:
            # rows r < window sit at global position seq_len - window + r
            # (the causal compare subsumes the tail mask: cols <= seq_len-1);
            # pad rows (r >= window) compute garbage the host slices off.
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(cols <= rows + (seq_len - window), s, MASK_NEG)
        else:
            # tail mask; pages entirely inside keep the predicate all-true
            # and the select folds to a no-op cheaply relative to the
            # group-wide dot.
            keep = cols < seq_len
            if sliding and sinks:
                keep = jnp.logical_and(
                    keep, (keep_parts[0] if ways == 1
                           else jnp.concatenate(keep_parts, axis=1)))
            elif sliding:
                keep = jnp.logical_and(keep, cols >= lo_ref[b])
            s = jnp.where(keep, s, MASK_NEG)

        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(jnp.maximum(m_prev, m_cur), M_CLAMP)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - _bcast(m_next, s.shape[1]))
        l_cur = jnp.sum(p, axis=1, keepdims=True)
        def _pv_of(w, v):
            # int8 codes are exact in bf16 (8 mantissa bits >= |code| <=
            # 127) and so is fp8 e4m3 (3 mantissa bits < bf16's 7):
            # storage-rate win either way, scale applied in the epilogue
            if v.dtype != jnp.bfloat16:
                v = v.astype(jnp.bfloat16)
            pw = p[:, w * page:(w + 1) * page]            # static slice
            return jax.lax.dot_general(
                pw.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        pv = None
        for w in range(ways):
            pvw = _pv_of(w, v_tile(w))
            pv = pvw if pv is None else pv + pvw
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
        if emit_state:
            # base-2 lse, lane-replicated (per-row stores pay a lane
            # relayout — CLAUDE.md gotcha); rows that saw nothing get a
            # floor the merge treats as zero weight
            lse_ref[0, 0] = jnp.where(
                l > 0.0, m_scr[...] + jnp.log2(jnp.where(l > 0.0, l, 1.0)),
                -1e30)


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
    ways: int = 1,    # concurrent page streams per grid step (must divide
    #                   n_pages; wrapper rounds the bucket up) — the paged
    #                   counterpart of AttnConfig.kv_split
    emit_state: bool = False,  # also return the per-row base-2 lse
    #                   (lane-replicated (TQ, LANES)) for partial merges
    run_len: int = 1,  # R: fetch R physically-consecutive, R-aligned pages
    #                   per DMA block ((R,1,page,D) — a regular strided
    #                   slice of the pool, no relayout).  The caller must
    #                   guarantee every LIVE slot group is an aligned run
    #                   (sageattn_decode_paged's lax.cond checks the traced
    #                   table and falls back to R=1 otherwise); the DMA
    #                   program count drops R-fold, which was the page-256
    #                   granularity tax — measured 1.23x -> 0.83x dense
    #                   @16K (probe_superpage.py).  A per-group mixed-
    #                   stream fallback was built and measured 1.3-1.9x
    #                   SLOWER (dual operand sets + branchy scratch writes
    #                   defeat Mosaic's pipelining) — batch-level cond won.
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
    assert n_pages % ways == 0, (n_pages, ways)
    R = run_len
    assert ways % R == 0 and P % R == 0, (ways, R, P)
    sliding = win_lo is not None
    assert not (R > 1 and sliding), "runs are plain-stream only"
    if lpage is None:
        lpage = jnp.broadcast_to(jnp.arange(table_eff.shape[1],
                                            dtype=jnp.int32)[None],
                                 table_eff.shape)
    if win_lo is None:
        win_lo = jnp.zeros((B,), jnp.int32)
    n_streams = ways // R
    n_steps = n_pages // ways
    if R > 1:
        # per-stream run table in block units: slot group (g*R .. g*R+R-1)
        # -> table[b, g*R] // R (live groups are aligned runs by contract;
        # dead/clamped groups fetch junk pages the column mask hides)
        table_sup = table_eff[:, ::R] // R

    def _mk_sup(wg):
        def kv_im(b, h, jp, table, lens, lpage_, lo, tsup, *_):
            return (tsup[b, jp * n_streams + wg], h // G, 0, 0)
        return kv_im

    def _mk_way(w):
        # stream w of grid step jp fetches page slot ways*jp + w:
        # the same pool passed per stream becomes independent DMA channels
        def kv_im(b, h, jp, table, *_):
            return (table[b, ways * jp + w], h // G, 0, 0)
        return kv_im

    way_ims = ([_mk_sup(w) for w in range(n_streams)] if R > 1
               else [_mk_way(w) for w in range(n_streams)])
    kv_specs = (
        [pl.BlockSpec((R, 1, page, D), im) for im in way_ims]
        + [pl.BlockSpec((R, 1, 1, page), im) for im in way_ims]
        + [pl.BlockSpec((R, 1, page, D), im) for im in way_ims])
    kv_ops = ([k8_pool] * n_streams + [ks_pool] * n_streams
              + [v_pool] * n_streams)

    grid = (B, Hg, n_steps)
    in_specs = (
        [pl.BlockSpec((1, 1, TQ, D), lambda b, h, jp, *_: (b, h, 0, 0))]
        + kv_specs
        + [pl.BlockSpec((1, 1, 1, D), lambda b, h, jp, *_: (0, h // G, 0, 0)),
           pl.BlockSpec((1, 1, 1, D), lambda b, h, jp, *_: (0, h // G, 0, 0))]
    )
    kernel = functools.partial(_paged_kernel, n_pages=n_steps,
                               page=page, window=window, sliding=sliding,
                               sinks=sinks, ways=ways, run_len=R,
                               emit_state=emit_state)
    scalars = [table_eff.astype(jnp.int32), lengths.astype(jnp.int32),
               lpage.astype(jnp.int32), win_lo.astype(jnp.int32)]
    if R > 1:
        scalars.append(table_sup.astype(jnp.int32))
    scratch = [
        pltpu.VMEM((TQ, LANES), jnp.float32),
        pltpu.VMEM((TQ, LANES), jnp.float32),
        pltpu.VMEM((TQ, D), jnp.float32),
    ]
    out_specs = pl.BlockSpec((1, 1, TQ, D),
                             lambda b, h, jp, *_: (b, h, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, Hg, TQ, D), jnp.bfloat16)
    if emit_state:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1, TQ, LANES),
                                  lambda b, h, jp, *_: (b, h, 0, 0)))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, Hg, TQ, LANES), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*scalars, q, *kv_ops, v_scale, v_mean)
