"""Pallas TPU attention kernels.

One configurable FlashAttention-style kernel replaces the reference's CUDA
kernel zoo (`/root/reference/csrc/qattn/qk_int_sv_f16_cuda_sm80.cu`,
`qk_int_sv_f8_cuda_sm89.cuh`, `qk_int_sv_f8_cuda_sm90.cu` and the Triton
`sageattention/triton/attn_qk_int8_per_block*.py` kernels).  Where CUDA needs
one hand-scheduled kernel per (arch, accum dtype, fuse flag), on TPU the
Mosaic compiler handles layout/pipelining and a single kernel body is
specialized by closure over a static config:

  - ``quantized=False``           -> bf16 flash baseline (the 2x denominator)
  - ``quantized=True, pv='bf16'`` -> int8 QK^T on the MXU, bf16 PV
                                     (analogue of sm80 qk_int8_sv_f16)
  - ``quantized=True, pv='int8'`` -> int8 QK^T + int8 PV with per-channel
                                     V scales (TPU-native lowest-bit mode;
                                     v5e has no fast fp8, int8 = 2x bf16)
  - ``quantized=True, pv='fp8'``  -> fp8 e4m3 PV with the exp-offset trick
                                     (analogue of sm89 SageAttention2,
                                     `attn_utils.cuh:30,377-389`)

Design notes (TPU-first):
  - grid (batch, q_heads, q_blocks, kv_blocks), kv innermost/"arbitrary";
    Pallas double-buffers the K/V block DMAs across grid steps automatically.
  - online softmax in base 2 (sm_scale*log2e folded into Q by the quantizer,
    as in `triton/quant_per_block.py:87`); running stats m/l live in VMEM
    scratch shaped (block_q, 128).
  - scales enter as per-row tensors: q_scale [B,H,Sq,1], k_scale [B,H,1,Sk]
    (expanded from group scales by the front end) so the in-kernel scale
    application is a rank-1 broadcast multiply on the S tile — the TPU
    equivalent of the reference's per-warp/per-thread fragment indexing
    (`qk_int_sv_f16_cuda_sm80.cu:100-134`).
  - the kernel operates in HND; the public layer transposes NHD inputs once
    at entry (TPU block tiling requires the last two array dims to be the
    blocked ones, so (B,S,H,D) cannot be blocked per-head natively).  The
    reference's dedicated V-transpose kernel
    (`csrc/fused/fused.cu:262-313`) is still unnecessary: ``dot_general``
    contracts the seq dim of V directly.
  - causal masking takes dynamic q/kv start offsets (SMEM scalars) so the
    same kernel serves single-chip causal attention and rotating ring-
    attention shards; off-diagonal blocks are skipped with ``pl.when``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



LANES = 128
MASK_NEG = -1e30  # added to masked scores (finite: avoids exp(-inf - -inf))
M_CLAMP = -1e20   # lower clamp for running max => exp2(MASK_NEG - m) == 0
# log2(448): shifts p into (0, 448] to fill the e4m3 range; cancels in the
# normalization, subtracted from lse (`attn_utils.cuh:30,377-389`).
FP8_OFFSET_LOG2 = 8.807354922057604
# log2(127): folds the int8 P scale into the exp2 bias (one fewer VPU pass)
INT8_P_OFFSET_LOG2 = 6.988684686772166
LOG2E = 1.4426950408889634


@dataclasses.dataclass(frozen=True)
class AttnConfig:
    block_q: int = 128
    block_k: int = 128          # outer/major KV tile (grid + DMA granularity)
    block_k_inner: int = 0      # inner KV sub-tile (0 => block_k); the
    # unrolled sub-tile loop gives Mosaic independent MXU/VPU work to
    # interleave — the TPU analogue of the CUDA kernel's cp.async
    # double-buffered software pipeline (`qk_int_sv_f16_cuda_sm80.cu:263-355`)
    causal: bool = False
    # dynamic causal offsets (ring attention): q/kv start positions arrive
    # as SMEM scalars.  When False (single-device causal), the diagonal is
    # static: skip conditions use grid indices only and the K/V index maps
    # CLAMP to the last needed block so skipped steps re-use the resident
    # block instead of fetching one that will never be read.
    causal_dynamic: bool = False
    causal_row_mod: int = 0  # r4: folded-GQA verify windows (decode T>1).
    # The host folds the G query heads of a KV group into the Q tile as
    # rows r = g*T + t, so a row's GLOBAL position is q_start + (r mod T),
    # not q_start + r.  Nonzero => the causal row iota is taken mod this
    # value.  Lets a T-token speculative-verify window stream the KV cache
    # once per KV head instead of once per query head (G x less DMA on the
    # bandwidth-bound decode path).  causal_dynamic only.
    quantized: bool = True
    pv_dtype: str = "bf16"  # "bf16" | "int8" | "fp8"
    fp8_native_dot: bool = False  # True only on generations with a real
    # fp8 MXU (dispatch.has_fast_fp8): feed the e4m3 operands to
    # dot_general directly.  False (emulated fp8, v5e): upcast both
    # operands to bf16 EXPLICITLY — e4m3 values (subnormals included) are
    # exact in bf16, whereas Mosaic's emulated e4m3 dot flushes subnormal
    # P codes that l_cur's f32 sum keeps, a numerator/denominator mismatch
    # that grew with S (plain fp8 @4K: 3.6e-3 compiled vs 8e-4 interpret —
    # root-caused r5, benchsuite/logs/r5_fp8_probe.log; the decode kernels
    # always upcast explicitly, which is why the fp8 V cache measured
    # 4e-4 while the dense fp8 path did not).
    compute_dtype: str = "native"  # "native": dots run in the storage dtype
    # (int8 QK^T on the MXU).  "bf16": int8 *storage* with bf16 *compute* —
    # Q is dequantized once per Q-tile into a VMEM scratch, K/V tiles are
    # converted on the fly (exact: int8 integers fit bf16's 8-bit mantissa)
    # and all dots run in bf16.  On v5e this is the fastest mode: int8 MXU
    # ops contend with the VPU and lose the interleaving win, while int8
    # storage still halves HBM traffic (docs/PERF_NOTES.md).  Requires
    # fold_k_scale.
    layout: str = "HND"
    sm_scale: float = 1.0  # only used when quantized=False (folded by quant otherwise)
    kv_len: int = 0        # true kv length (pre-padding)
    out_dtype: jnp.dtype = jnp.bfloat16
    segmented: bool = False  # varlen segment-id masking
    fold_k_scale: bool = False  # K quantized per-head; its scalar scale is
    # pre-folded into q_scale on the host, so the kernel applies ONE per-row
    # broadcast multiply instead of row+column multiplies (the binding VPU
    # cost in the interleaved regime — see docs/PERF_NOTES.md).  Requires
    # smooth_k for accuracy (measured: per-head K scales cost <2e-5 diff).
    masked: str = "none"     # "none" | "bool" | "float" — user attn_mask
    # (bool: keep where true; float: additive bias in natural-log units,
    # like the reference triton path `attn_qk_int8_per_block.py:33-39`)
    fuse_v_mean: bool = False  # smooth_v repair fused into the epilogue:
    # o += vm after normalization (valid because sum(p)/l == 1 per row) —
    # the reference's fuse_v_mean kernels (`qk_int_sv_f16_cuda_sm80.cu:
    # 563-582`, `sm89 ..._fuse_v_mean`).  Saves a full read+write of the
    # output on the host (~0.8 ms at S=8192 B4 H32).
    pv_via_bf16: bool = False  # force the bf16-P path (V converted in-kernel
    # when stored int8) even under the online softmax — used by the static
    # path's unsafe-input fallback so both lax.cond branches share the same
    # (more accurate) P numerics and differ only in softmax bookkeeping.
    p_sim_fp4: bool = False  # SageAttention3 accuracy simulation: quantize
    # the P tile onto the e2m1 grid (scale = row absmax/6) before the PV dot
    # — the tiled, O(S)-memory analogue of the reference's fused P
    # re-quantization (`softmax_fused.h:28`, `mainloop_tma_ws.h:799-899`).
    # Simulation only (v5e has no 4-bit MXU; see benchsuite/probe_lowbit.py).
    kv_len_dynamic: bool = False  # the true kv length arrives as an SMEM
    # scalar at call time (ring-attention chunks whose real-row count
    # differs per source shard after padding, r3); cfg.kv_len is then the
    # padded extent and the boundary masks use the dynamic value
    emit_lse: bool = True  # write the lse output (r3: callers that don't
    # need it — the common inference path — skip the epilogue log2 and the
    # (B,H,S,1) store; the reference's RETURN_LSE dispatch macro,
    # `dispatch_utils.h:23-112`)
    fuse_q_quant: bool = False  # r3: Q arrives bf16 and is quantized
    # IN-KERNEL, per row, once per Q-tile (at j == 0, into VMEM scratch) —
    # each Q tile is loaded exactly once per (b, h, q_block), so the
    # standalone Q-quant launch (read bf16 + write int8 + re-read int8,
    # ~0.74 ms marginal at S=8192 B4 H32) disappears and the scale gets
    # per-ROW granularity (finer than the host kernels' 128-row groups).
    # In compute_dtype="bf16" mode Q is not quantized at all (q*fold*ks
    # goes straight to the bf16 scratch — strictly more accurate).
    # K-scale variants: with fold_k_scale the K scale arrives as the
    # k_head_scale input — per-head (1,1,1,1) by default, per-Q-ROW
    # ([B,Hq,Sq,1], fuse_k_rows=True) for the varlen per-segment fold;
    # without fold_k_scale the per-col K scales ride the usual ks input
    # and kn_max must already include them.  masked == "none" only
    # (segments are fine: per-row Q scales never cross a segment).  With
    # softmax_mode "static" the kernel also emits a per-(b,h,q_block) MIN
    # row denominator so the caller can make the underflow-safety decision
    # POST-HOC (exact) instead of predicting it from a q_capmax prepass.
    fuse_k_rows: bool = False  # fuse_q_quant only: the k_head_scale input
    # is per Q row ([B,Hq,Sq,1]) instead of per head — varlen folds each
    # segment's K scale into its own rows
    q_len: int = 0  # true q length (pre-padding); pad rows are excluded
    # from the lmin reduction (0 = no q padding)
    window: int = 0  # r3: sliding-window (local) attention — query row r
    # attends keys in [r - window + 1, r] (Mistral/Gemma2-class SWA; the
    # reference has no counterpart).  Static causal only: both diagonal
    # bounds are static functions of the grid indices, so the K/V index
    # maps CLAMP below-window blocks exactly like above-diagonal ones —
    # FLOPs AND DMA scale O(S*window) instead of O(S^2/2).  0 = disabled.
    sinks: int = 0  # r3: StreamingLLM attention sinks for the windowed
    # prefill — the first `sinks` key positions stay visible to every row
    # in ADDITION to its band (decode already supports this, paged_decode;
    # this is the prefill/training side).  Sink blocks stay DMA-live (the
    # below-window clamp passes them through), cost O(S*(window+sinks)).
    # Requires window; mutually exclusive with segments (sinks are global
    # positions — a packed batch would need per-segment sinks).
    kv_split: int = 1  # r4: stream the KV cache as this many CONCURRENT
    # operand pairs.  probe_dma_rate measured each Pallas operand stream
    # topping out at ~85 Gelements/s regardless of dtype, while streams
    # overlap almost linearly (2 -> ~170, 4 -> ~291 Gel/s) — so a decode
    # step (pure KV streaming past a tiny Q tile) is operand-bound, not
    # byte-bound.  kv_split=W passes K, V (and per-col k_scale) W times
    # with interleaved index maps (way w fetches blocks W*j + w) and the
    # kv grid dim shrinks by W: one grid step streams W blocks on 2W+
    # independent DMA channels.  Decode-path only: online softmax, no
    # masks/segments/windows, causal only via causal_dynamic (verify
    # windows).  Prefill keeps 1 (its big tiles already saturate).
    softmax_mode: str = "online"  # "online": classic flash running-max.
    # "static": the max is replaced by a precomputed per-row upper bound C_i
    # on the base-2 logits (Cauchy–Schwarz on the int8 payloads and scales,
    # supplied via ``logit_cap``).  exp2(s - C) with a constant C keeps full
    # float relative precision (the exponent offset is exact in fp), so
    # accuracy matches online softmax while the kernel drops the max-reduce,
    # the accumulator rescale, and — crucially — the sequential dependency
    # between KV sub-tiles that serializes the VPU behind the MXU.  The TPU
    # answer to the reference's "fp22" two-level accumulation tricks
    # (`attn_utils.cuh:813-894`): restructure the softmax instead of the
    # accumulator.  Requires a bf16 P path (pv bf16 or dq_compute): int8/fp8
    # P would spend the bound's slack in quantization codes.

    @property
    def bki(self) -> int:
        return self.block_k_inner or self.block_k

    @property
    def p_bf16(self) -> bool:
        """True when P stays bf16 and the PV dot runs in bf16 (V converted
        in-kernel if stored int8).  False -> P is quantized (int8/fp8 PV
        dots).  static softmax implies p_bf16 (bound slack must not eat
        quantization codes)."""
        return (not self.quantized or self.pv_dtype == "bf16"
                or self.compute_dtype == "bf16"
                or self.softmax_mode == "static"
                or self.pv_via_bf16)


def _bcast(x128, n):
    """Broadcast a (rows, 128) lane-replicated stat across n columns by
    concatenating full 128-lane registers.  Measured (r3 A/B, all three
    strategies on the five headline configs): the (rows, 1) implicit
    lane-broadcast and explicit broadcast_to both collapse pl.when-wrapped
    and online-softmax kernels to ~half speed (static-causal 66 vs 127
    TFLOPS, flash 76 vs 146) — Mosaic lowers the single-lane splat as a
    per-op cross-lane shuffle — while full-register concatenation costs
    nothing even in the plain static body (182.2 vs 183.6, noise)."""
    if n == 128:
        return x128
    if n < 128:
        return x128[:, :n]
    return jnp.concatenate([x128] * (n // 128), axis=1)


def _round_e2m1_tile(p, pmax):
    """Quantize a probability tile onto the e2m1 grid with per-row scale
    ``pmax/6`` (SageAttention3 P re-quantization semantics).  Pure
    elementwise/rowwise ops — no lane regrouping."""
    scale = jnp.maximum(pmax, 1e-30) * (1.0 / 6.0)   # (BQ, 1)
    x = p / scale
    mag = jnp.abs(x)
    # nearest on {0,.5,1,1.5,2,3,4,6}: midpoint thresholds
    grid = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)
    mids = (0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0)
    q = jnp.zeros_like(mag)
    for g, m in zip(grid[1:], mids):
        q = jnp.where(mag > m, g, q)
    return q * scale  # p >= 0, sign dropped


def _attn_kernel(
    # refs (built dynamically; see attention_call): [minfo table]
    # [offsets?] [kv_true?] q k v [qs ks] [vs] [q_seg kv_seg [kv_segpos]]
    # [mask]
    # out [lse] m_scr l_scr acc_scr [qbf_scr]
    *refs,
    cfg: AttnConfig,
    n_kv: int,
    mask_heads: int = 0,
):
    it = iter(refs)
    # bool masks ride scalar prefetch (the index maps need them too)
    minfo_ref = next(it) if cfg.masked == "bool" else None
    table_ref = next(it) if cfg.masked == "bool" else None
    del table_ref  # consumed by the index maps only
    # per-segment sinks: (B, n_kv_blocks) table — does block j hold any
    # within-segment sink token?  Scalar-prefetched so tile liveness and
    # the below-window DMA clamp read the SAME signal (the streamed
    # kv_segpos block can't serve liveness once dead blocks are remapped
    # to a resident buffer — it would show the redirected block's data).
    sinkblk_ref = next(it) if (cfg.segmented and cfg.sinks) else None
    offs_ref = next(it) if (cfg.causal and cfg.causal_dynamic) else None
    kvt_ref = next(it) if cfg.kv_len_dynamic else None
    W = max(cfg.kv_split, 1)
    q_ref = next(it)
    k_refs = [next(it) for _ in range(W)]
    v_refs = [next(it) for _ in range(W)]
    static_mode = cfg.softmax_mode == "static"
    knmax_ref = None
    vm_ref = None
    qs_ref = ksh_ref = None
    ks_refs = None
    if cfg.quantized:
        if cfg.fuse_q_quant:
            # per-head (or per-Q-row, fuse_k_rows) K scale; absent without
            # fold_k_scale (per-col ks rides the usual input below)
            ksh_ref = next(it) if cfg.fold_k_scale else None
        else:
            qs_ref = next(it)
        ks_refs = None if cfg.fold_k_scale else [next(it) for _ in range(W)]
        vs_ref = next(it) if cfg.pv_dtype in ("int8", "fp8") else None
        vm_ref = next(it) if cfg.fuse_v_mean else None
        knmax_ref = next(it) if static_mode else None
    q_seg_ref = next(it) if cfg.segmented else None
    kv_seg_ref = next(it) if cfg.segmented else None
    # per-segment sinks: each kv token's position WITHIN its segment
    kv_segpos_ref = next(it) if (cfg.segmented and cfg.sinks) else None
    mask_ref = next(it) if cfg.masked != "none" else None
    o_ref = next(it)
    lse_ref = next(it) if cfg.emit_lse else None
    lmin_ref = next(it) if (static_mode and cfg.fuse_q_quant) else None
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)
    dq_compute = cfg.quantized and cfg.compute_dtype == "bf16"
    qbf_scr = next(it) if dq_compute else None
    fuse_native = cfg.fuse_q_quant and not dq_compute
    q8_scr = next(it) if fuse_native else None
    qs_scr = next(it) if fuse_native else None

    i = pl.program_id(2)
    j = pl.program_id(3)
    BQ, BK, BKI = cfg.block_q, cfg.block_k, cfg.bki
    n_inner = BK // BKI

    @pl.when(j == 0)
    def _init():
        if cfg.fuse_q_quant:
            # Q quantization fused into the attention kernel: the bf16 Q
            # tile is resident exactly once per (b, h, q_block), so the
            # standalone quant launch is pure overhead.  Per-ROW scales
            # (finer than the host kernels' groups); fold = sm_scale*log2e
            # applied here; the per-head K scale (fold_k_scale) multiplies
            # the effective row scale.
            qf = q_ref[0, 0].astype(jnp.float32) * (cfg.sm_scale * LOG2E)
            # (1,1) per-head | (BQ,1) per-row | 1.0 when per-col ks rides
            # the usual input (then kn_max includes the k scales)
            ksh = ksh_ref[0, 0] if cfg.fold_k_scale else 1.0
            if dq_compute:
                # bf16-compute mode: Q is not quantized at all
                qe = qf * ksh
                qbf_scr[...] = qe.astype(jnp.bfloat16)
                if static_mode:
                    # C-S bound on the bf16 payload: |qe.k8| <= ||qe|| ||k8||;
                    # 1+2^-7 absorbs the bf16 rounding of the scratch store
                    # plus f32 reduction error.
                    qn = jnp.sqrt(jnp.sum(qe * qe, axis=1, keepdims=True))
                    cap = qn * (knmax_ref[0, 0] * (1.0 + 2.0 ** -7))
                    m_scr[...] = jnp.broadcast_to(cap, m_scr.shape)
            else:
                a = jnp.max(jnp.abs(qf), axis=1, keepdims=True)  # (BQ, 1)
                qs = jnp.where(a > 0, a * (1.0 / 127.0), 1.0)
                q8 = jnp.clip(jnp.rint(qf * (1.0 / qs)), -127, 127)
                q8_scr[...] = q8.astype(jnp.int8)
                qse = qs * ksh                                # (BQ, 1)
                qs_scr[...] = jnp.broadcast_to(qse, qs_scr.shape)
                if static_mode:
                    qn = jnp.sqrt(jnp.sum(q8 * q8, axis=1, keepdims=True))
                    cap = qse * qn * (knmax_ref[0, 0] * (1.0 + 1e-5))
                    m_scr[...] = jnp.broadcast_to(cap, m_scr.shape)
            if not static_mode:
                m_scr[...] = jnp.full_like(m_scr, M_CLAMP)
        elif static_mode:
            # The per-row logit bound C = qs_i * ||q8_i|| * max_j(ks_j *
            # ||k8_j||) plays the role of the final running max (the
            # epilogue's lse formula is then already correct).  ||q8_i|| is
            # computed HERE — the int8 q tile is resident anyway, and a
            # per-row (S, 1) norm store in the quant pass costs a slow lane
            # relayout (probe_prep.py); only the scalar max||k8|| arrives
            # as an input.  1+1e-5 absorbs f32 rounding so C stays a true
            # upper bound.
            q8 = q_ref[0, 0].astype(jnp.float32)
            qn = jnp.sqrt(jnp.sum(q8 * q8, axis=1, keepdims=True))
            cap = qs_ref[0, 0] * qn * (knmax_ref[0, 0] * (1.0 + 1e-5))
            m_scr[...] = jnp.broadcast_to(cap, m_scr.shape)
        else:
            m_scr[...] = jnp.full_like(m_scr, M_CLAMP)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if dq_compute and not cfg.fuse_q_quant:
            # dequantize Q once per Q-tile; int8*f32->bf16 keeps the int8
            # payload exact (8-bit mantissa) with the folded row scale applied
            qbf_scr[...] = (q_ref[0, 0].astype(jnp.float32)
                            * qs_ref[0, 0]).astype(jnp.bfloat16)

    n_blocks = n_kv * W   # total kv blocks (n_kv is the GRID extent)

    if cfg.causal and cfg.causal_dynamic:
        q_start = offs_ref[0]
        kv_start = offs_ref[1]
    elif cfg.causal:
        q_start = kv_start = 0
    else:
        q_start = kv_start = None

    def _way(w, k_ref, v_ref, ks_ref):
        jj = j * W + w   # this way's kv block index (jj == j when W == 1)
        if cfg.causal and cfg.causal_dynamic:
            # major tile participates iff its first kv position <= last q
            # position
            if cfg.causal_row_mod:
                # folded rows: positions cycle in [q_start, q_start + mod)
                run = (jj * BK + kv_start) <= (q_start + cfg.causal_row_mod - 1)
            else:
                run = (jj * BK + kv_start) <= (i * BQ + q_start + BQ - 1)
        elif cfg.causal:
            run = (jj * BK) <= (i * BQ + BQ - 1)
            if cfg.window:
                # major tile participates iff its last kv position is inside
                # the widest window any of the tile's rows can see (or the
                # tile holds sink keys, which every row sees)
                in_band = (jj * BK + BK - 1) >= (i * BQ - cfg.window + 1)
                if cfg.sinks and cfg.segmented:
                    # per-SEGMENT sinks: the tile is live iff some kv token
                    # sits in the first `sinks` positions of its own segment
                    # (dynamic — pads carry a huge segpos so they never
                    # match).  Read from the prefetched per-block table, NOT
                    # the streamed kv_segpos tile: below-window dead blocks
                    # are DMA-remapped to a resident buffer (r4), so their
                    # streamed data is another block's.
                    in_band = jnp.logical_or(
                        in_band, sinkblk_ref[pl.program_id(0), jj] != 0)
                elif cfg.sinks:
                    in_band = jnp.logical_or(in_band, jj * BK < cfg.sinks)
                run = jnp.logical_and(run, in_band)
        else:
            # skip kv blocks entirely past the true length (their DMA is also
            # clamped away in _specs on the static path).  Padding exists
            # whenever kv_len < the gridded extent — NOT merely when kv_len is
            # block-unaligned (pre-padded kv_true inputs can be aligned).
            if cfg.kv_len_dynamic:
                run = jj * BK < kvt_ref[0]
            elif cfg.kv_len < n_blocks * BK:
                run = jj * BK < cfg.kv_len
            else:
                run = True
        if minfo_ref is not None:
            # fully-masked block: skip all compute (the reference triton
            # block-skip, `attn_qk_int8_per_block.py:33-39`); its DMA was
            # already redirected to a resident block by the remap table
            b_idx = pl.program_id(0)
            h_idx = pl.program_id(1)
            hm = 0 if mask_heads == 1 else h_idx
            run = jnp.logical_and(run, minfo_ref[b_idx, hm, i, j] != 0)
        pl.when(run)(lambda: _body(jj, k_ref, v_ref, ks_ref))

    def _body(jj, k_ref, v_ref, ks_ref):
        if dq_compute:
            q = qbf_scr[...]
        elif fuse_native:
            q = q8_scr[...]
        else:
            q = q_ref[0, 0]
        D = q.shape[-1]

        def sub_tile(t, causal_mask=True, tail_mask=True):
            """One BKI-wide KV sub-tile; unrolled so consecutive sub-tiles'
            independent MXU/VPU work interleaves in Mosaic's schedule.
            ``causal_mask=False`` skips the causal iota/compare/select for
            tiles known to sit entirely below the diagonal (the reference's
            3-phase loop, `qk_int_sv_f16_cuda_sm80.cu:218-222`);
            ``tail_mask=False`` likewise skips the kv-length boundary mask
            for tiles known to sit entirely inside the true sequence (r3:
            the mask cost ~3 VPU ops/elem on EVERY tile for any unaligned
            kv_len — now only the boundary tiles pay)."""
            sl = slice(t * BKI, (t + 1) * BKI)
            k = k_ref[0, 0, sl, :]
            v = v_ref[0, 0, sl, :]
            col0 = jj * BK + t * BKI

            if dq_compute:
                # bf16 compute on int8 storage: k holds exact small integers
                s = jax.lax.dot_general(
                    q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # base-2 logits
            elif cfg.quantized:
                s32 = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                if fuse_native:
                    # per-row scale (x folded ks) from the in-kernel quant
                    s = s32.astype(jnp.float32) * _bcast(qs_scr[...], BKI)
                    if not cfg.fold_k_scale:
                        s = s * ks_ref[0, 0, :, sl]         # (1, BKI)
                elif cfg.fold_k_scale:
                    qs = qs_ref[0, 0]                   # (BQ, 1)
                    s = s32.astype(jnp.float32) * qs    # ks folded into qs
                else:
                    qs = qs_ref[0, 0]                   # (BQ, 1)
                    ks = ks_ref[0, 0, :, sl]            # (1, BKI)
                    s = s32.astype(jnp.float32) * qs * ks
                # s: base-2 logits
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s * (cfg.sm_scale * LOG2E)

            if tail_mask:
                kvl = kvt_ref[0] if cfg.kv_len_dynamic else cfg.kv_len
                cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, BKI), 1) + col0
                s = jnp.where(cols < kvl, s, MASK_NEG)
            if cfg.causal and causal_mask:
                rows = (jax.lax.broadcasted_iota(jnp.int32, (BQ, BKI), 0)
                        + i * BQ)
                if cfg.causal_row_mod:
                    rows = rows % cfg.causal_row_mod
                rows = rows + q_start
                cols = (jax.lax.broadcasted_iota(jnp.int32, (BQ, BKI), 1)
                        + col0 + kv_start)
                keep = cols <= rows
                if cfg.window:
                    band = cols >= rows - (cfg.window - 1)
                    if cfg.sinks and cfg.segmented:
                        # (1, BKI) position-in-segment; the same-segment
                        # mask below kills cross-segment sink leakage
                        band = jnp.logical_or(
                            band, kv_segpos_ref[0, :, sl] < cfg.sinks)
                    elif cfg.sinks:
                        band = jnp.logical_or(band, cols < cfg.sinks)
                    keep = jnp.logical_and(keep, band)
                s = jnp.where(keep, s, MASK_NEG)
            if cfg.segmented:
                q_seg = q_seg_ref[0]                    # (BQ, 1) int32
                kv_seg = kv_seg_ref[0, :, sl]           # (1, BKI) int32
                s = jnp.where(q_seg == kv_seg, s, MASK_NEG)
            if cfg.masked == "bool":
                s = jnp.where(mask_ref[0, 0, :, sl] != 0, s, MASK_NEG)
            elif cfg.masked == "float":
                # additive bias given in natural-log units -> base-2 domain
                s = s + mask_ref[0, 0, :, sl].astype(jnp.float32) * LOG2E

            if static_mode:
                # no running stats: C (in m_scr since init) is the exponent
                # shift; sub-tiles become independent accumulate-only work.
                # (r3: (BQ,1) implicit lane-broadcast — the old 128-lane
                # concat materialized a second (BQ,BKI) f32 tile per sub-tile)
                p = jnp.exp2(s - _bcast(m_scr[...], BKI))
                l_cur = jnp.sum(p, axis=1, keepdims=True)
                if cfg.quantized and cfg.pv_dtype == "int8":
                    v = v.astype(jnp.bfloat16)  # per-channel scale in epilogue
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                l_scr[...] = l_scr[...] + l_cur
                acc_scr[...] = acc_scr[...] + pv
                return

            m_prev = m_scr[...]                         # (BQ, 128)
            l_prev = l_scr[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)   # (BQ, 1)
            m_next = jnp.maximum(jnp.maximum(m_prev, m_cur), M_CLAMP)
            alpha = jnp.exp2(m_prev - m_next)           # (BQ, 128)

            if cfg.p_bf16:
                p = jnp.exp2(s - _bcast(m_next, BKI))
                if cfg.p_sim_fp4:
                    # row absmax of this tile's p is exp2(m_cur - m_next);
                    # m_next is lane-replicated — take one lane for (BQ, 1)
                    p = _round_e2m1_tile(p, jnp.exp2(m_cur - m_next[:, :1]))
                l_cur = jnp.sum(p, axis=1, keepdims=True)
                if cfg.quantized and cfg.pv_dtype == "int8":
                    v = v.astype(jnp.bfloat16)  # per-channel scale in epilogue
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), v,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            elif cfg.pv_dtype == "int8":
                # the *127 P scale is folded into the exp2 bias; l sums the
                # *quantized* P so normalization cancels rounding exactly, as
                # the reference's fp8 rowsum does (`mma.cuh:685-721`); 1/127
                # and per-channel v_scale fold into the epilogue.
                p_q = jnp.rint(jnp.exp2(s - _bcast(m_next, BKI)
                                        + INT8_P_OFFSET_LOG2))
                l_cur = jnp.sum(p_q, axis=1, keepdims=True) * (1.0 / 127.0)
                pv = jax.lax.dot_general(
                    p_q.astype(jnp.int8), v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            else:  # fp8 with exp-offset filling the e4m3 range
                p_q = jnp.exp2(s - _bcast(m_next, BKI) + FP8_OFFSET_LOG2
                               ).astype(jnp.float8_e4m3fn)
                l_cur = jnp.sum(p_q.astype(jnp.float32), axis=1, keepdims=True)
                if cfg.fp8_native_dot:
                    pv = jax.lax.dot_general(
                        p_q, v,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    # emulated fp8 (no fast-fp8 MXU): explicit bf16 upcast
                    # keeps e4m3 subnormal codes (exact in bf16) that the
                    # emulated e4m3 dot would flush — see AttnConfig
                    pv = jax.lax.dot_general(
                        p_q.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            m_scr[...] = m_next
            l_scr[...] = alpha * l_prev + l_cur
            acc_scr[...] = acc_scr[...] * _bcast(alpha, D) + pv

        # The kv-tail boundary mask is needed only on sub-tiles straddling
        # cfg.kv_len.  For static-offset causal it is never needed: causal
        # requires Sq == Sk == kv_len, so every REAL row r < kv_len and the
        # causal mask cols <= r already excludes the pad columns (pad rows
        # compute garbage that the caller slices off).  Segmented (varlen)
        # calls pass kv_len == Sk_pad, eliding it too.
        has_tail = cfg.kv_len < n_blocks * BK or cfg.kv_len_dynamic
        static_causal = cfg.causal and not cfg.causal_dynamic
        for t in range(n_inner):
            if cfg.causal:
                # 3-phase structure: skip above-diagonal sub-tiles entirely,
                # run strictly-below-diagonal ones WITHOUT the causal mask
                # (its iota/compare/select costs ~4 VPU ops/elem — most of
                # the static softmax's total), mask only boundary tiles.
                first_kv = jj * BK + t * BKI + kv_start
                last_kv = first_kv + BKI - 1
                first_q = i * BQ + q_start
                last_q = first_q + BQ - 1
                sub_run = first_kv <= last_q
                full = last_kv <= first_q
                if cfg.window:
                    # window lower bound: skip sub-tiles entirely below
                    # every row's window; mask unless the sub-tile is also
                    # fully inside the NARROWEST row's window.  Sink
                    # sub-tiles stay live: fully-below-sinks ones are
                    # maskless (every col < sinks is visible to every
                    # below-diagonal row), straddlers take the mask.
                    in_band = last_kv >= first_q - (cfg.window - 1)
                    band_full = first_kv >= last_q - (cfg.window - 1)
                    if cfg.sinks and cfg.segmented:
                        # per-segment sinks: sub-tile liveness is dynamic
                        # (min position-in-segment); never maskless — the
                        # masked branch carries the segpos disjunction
                        in_band = jnp.logical_or(
                            in_band,
                            jnp.min(kv_segpos_ref[
                                0, :, t * BKI:(t + 1) * BKI]) < cfg.sinks)
                    elif cfg.sinks:
                        in_band = jnp.logical_or(in_band,
                                                 first_kv < cfg.sinks)
                        band_full = jnp.logical_or(band_full,
                                                   last_kv < cfg.sinks)
                    sub_run = jnp.logical_and(sub_run, in_band)
                    full = jnp.logical_and(full, band_full)
                tail = cfg.kv_len_dynamic or (
                    (not static_causal) and has_tail)
                pl.when(jnp.logical_and(sub_run, full))(
                    lambda t=t: sub_tile(t, causal_mask=False, tail_mask=tail))
                pl.when(jnp.logical_and(sub_run, jnp.logical_not(full)))(
                    lambda t=t: sub_tile(t, causal_mask=True, tail_mask=tail))
            elif has_tail:
                col0 = jj * BK + t * BKI
                kvl = kvt_ref[0] if cfg.kv_len_dynamic else cfg.kv_len
                inside = col0 + BKI <= kvl          # fully inside: no mask
                beyond = col0 >= kvl                # fully past: skip
                pl.when(inside)(lambda t=t: sub_tile(t, tail_mask=False))
                pl.when(jnp.logical_and(jnp.logical_not(inside),
                                        jnp.logical_not(beyond)))(
                    lambda t=t: sub_tile(t, tail_mask=True))
            else:
                sub_tile(t, tail_mask=False)

    for w in range(W):
        _way(w, k_refs[w], v_refs[w], ks_refs[w] if ks_refs else None)

    @pl.when(j == n_kv - 1)
    def _epilogue():
        D = acc_scr.shape[-1]
        l128 = l_scr[...]
        l_safe = jnp.where(l128 == 0.0, 1.0, l128)
        o = acc_scr[...] * _bcast(1.0 / l_safe, D)
        if cfg.quantized and cfg.pv_dtype == "int8":
            # per-channel V scale; the extra 1/127 is the static P scale of
            # the int8-PV dot (absent whenever P stayed bf16)
            p_scale = 1.0 if cfg.p_bf16 else (1.0 / 127.0)
            o = o * (vs_ref[0, 0] * p_scale)  # (1, D)
        elif cfg.quantized and cfg.pv_dtype == "fp8":
            # fp8 exp-offset cancels in o (both acc and l carry 2^off)
            o = o * vs_ref[0, 0]
        if cfg.fuse_v_mean:
            o = o + vm_ref[0, 0]                  # (1, D) broadcast
        o_ref[0, 0] = o.astype(o_ref.dtype)
        if cfg.emit_lse:
            # lse in base 2 (converted to natural log by the host wrapper,
            # matching `core.py:328-331`); minus the fp8 offset carried by l.
            off = (FP8_OFFSET_LOG2
                   if (cfg.quantized and cfg.pv_dtype == "fp8") else 0.0)
            lse = m_scr[:, :1] + jnp.log2(jnp.maximum(l_scr[:, :1], 1e-37)) - off
            lse_ref[0, 0] = lse  # (BQ, 1)
        if lmin_ref is not None:
            # post-hoc static-safety signal: the MIN row denominator over
            # this block's TRUE rows.  l_i = sum_j exp2(s_ij - C_i) >=
            # exp2(rowmax_i - C_i); a tiny min means some row's entire
            # softmax underflowed the cap's slack and the caller must rerun
            # online (exact replacement for the q_capmax safety PREdiction).
            lv = l_scr[:, :1]
            if cfg.q_len:
                # NB: capture the kernel-top `i` — pl.program_id has no
                # interpret-mode lowering inside a pl.when body
                rows = jax.lax.broadcasted_iota(jnp.int32, lv.shape, 0) \
                    + i * cfg.block_q
                lv = jnp.where(rows < cfg.q_len, lv, 3e38)
            lmin_ref[0, 0] = jnp.broadcast_to(jnp.min(lv), (8, 128))


def _specs(cfg: AttnConfig, B, Hq, Hk, Sq, Sk, D, with_vscale, segmented,
           Hm: int = 0):
    """Build (in_specs skeleton is assembled by caller) block specs.

    All index maps take ``*_`` so the same specs serve the plain grid and
    the scalar-prefetch grid (bool masks: the liveness/remap tables arrive
    as trailing ref args the non-kv maps ignore).
    """
    BQ, BK = cfg.block_q, cfg.block_k
    G = Hq // Hk
    W = max(cfg.kv_split, 1)
    prefetch = cfg.masked == "bool"

    if prefetch:
        # the kv fetch index comes from the host-built remap table: dead
        # blocks (fully-masked, above-diagonal, past-the-tail) point at the
        # nearest live block so their DMA re-uses the resident buffer
        def kv_idx(b, h, i, j, minfo, table):
            return table[b, 0 if Hm == 1 else h, i, j]

        def kv_im(b, h, i, j, minfo, table):
            return (b, h // G, kv_idx(b, h, i, j, minfo, table), 0)

        def ks_im(b, h, i, j, minfo, table):
            return (b, h // G, 0, kv_idx(b, h, i, j, minfo, table))
    elif cfg.window and cfg.sinks and segmented:
        # per-SEGMENT sinks: sink-holding blocks are DYNAMIC (each packed
        # sequence's own first tokens), so the below-window clamp reads a
        # scalar-prefetched (B, n_kv) table — sink blocks pass through
        # (bounded by the diagonal), everything else takes the band clamp.
        # Restores the O(S*(window+sinks)) DMA bound the static clamp
        # gives dense sinks (r4; was: clamp disabled, O(S^2/2) streaming).
        def _j_sink(b, i, j, sinkblk):
            hi = ((i + 1) * BQ - 1) // BK
            lo = jnp.maximum(i * BQ - cfg.window + 1, 0) // BK
            clamped = jnp.minimum(jnp.maximum(j, lo), hi)
            return jnp.where(sinkblk[b, j] != 0,
                             jnp.minimum(j, hi), clamped)

        def kv_im(b, h, i, j, sinkblk):
            return (b, h // G, _j_sink(b, i, j, sinkblk), 0)

        def ks_im(b, h, i, j, sinkblk):
            return (b, h // G, 0, _j_sink(b, i, j, sinkblk))
    else:
        if cfg.causal and not cfg.causal_dynamic:
            # static diagonal: clamp the kv block index so above-diagonal
            # (and, with a sliding window, below-window) grid steps re-use
            # the resident block (no DMA)
            if cfg.window:
                def _j(i, j):
                    hi = ((i + 1) * BQ - 1) // BK
                    lo = jnp.maximum(i * BQ - cfg.window + 1, 0) // BK
                    clamped = jnp.minimum(jnp.maximum(j, lo), hi)
                    if cfg.sinks:
                        # sink blocks are live for every q block: pass
                        # them through (bounded by the diagonal)
                        clamped = jnp.where(j * BK < cfg.sinks,
                                            jnp.minimum(j, hi), clamped)
                    return clamped
            else:
                def _j(i, j):
                    return jnp.minimum(j, ((i + 1) * BQ - 1) // BK)
        elif not cfg.causal and cfg.kv_len < Sk:
            # clamp past-the-end blocks to the last live one
            last_live = (cfg.kv_len - 1) // BK

            def _j(i, j):
                return jnp.minimum(j, last_live)
        else:
            def _j(i, j):
                return j

        def kv_im(b, h, i, j, *_):
            return (b, h // G, _j(i, j), 0)

        def ks_im(b, h, i, j, *_):
            return (b, h // G, 0, _j(i, j))

    if W > 1:
        # kv_split: way w's index maps fetch block W*j + w — the same array
        # passed W times becomes W independent DMA channels (probe_dma_rate:
        # per-operand streams cap at ~85 Gel/s but overlap ~linearly)
        def _mk_way(w):
            def kv_im_w(b, h, i, j, *_):
                return (b, h // G, _j(i, W * j + w), 0)

            def ks_im_w(b, h, i, j, *_):
                return (b, h // G, 0, _j(i, W * j + w))
            return kv_im_w, ks_im_w

        way_maps = [_mk_way(w) for w in range(W)]
        k_specs = [pl.BlockSpec((1, 1, BK, D), m[0]) for m in way_maps]
        v_specs = [pl.BlockSpec((1, 1, BK, D), m[0]) for m in way_maps]
        ks_specs = [pl.BlockSpec((1, 1, 1, BK), m[1]) for m in way_maps]
    else:
        k_specs = [pl.BlockSpec((1, 1, BK, D), kv_im)]
        v_specs = [pl.BlockSpec((1, 1, BK, D), kv_im)]
        ks_specs = [pl.BlockSpec((1, 1, 1, BK), ks_im)]

    q_spec = pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j, *_: (b, h, i, 0))
    o_spec = pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j, *_: (b, h, i, 0))

    qs_spec = pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j, *_: (b, h, i, 0))
    vs_spec = pl.BlockSpec((1, 1, 1, D),
                           lambda b, h, i, j, *_: (b, h // G, 0, 0))
    # lse carries a trailing singleton dim so the (BQ, 1) block satisfies TPU
    # tiling rules; squeezed before returning.
    lse_spec = pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j, *_: (b, h, i, 0))
    qseg_spec = pl.BlockSpec((1, BQ, 1), lambda b, h, i, j, *_: (b, i, 0))
    kseg_spec = pl.BlockSpec((1, 1, BK), lambda b, h, i, j, *_: (b, 0, j))
    return q_spec, k_specs, v_specs, qs_spec, ks_specs, vs_spec, o_spec, lse_spec, qseg_spec, kseg_spec


def attention_call(
    q,
    k,
    v,
    q_scale=None,   # [B, Hq, Sq, 1] f32 per-row (quantized only)
    k_scale=None,   # [B, Hk, 1, Sk] f32 per-col (quantized only)
    v_scale=None,   # [B, Hk, 1, D] f32 per-channel (pv int8/fp8 only)
    offsets=None,   # (2,) int32 [q_start, kv_start] (causal only)
    q_segments=None,   # [B, Sq, 1] int32 (varlen only)
    kv_segments=None,  # [B, 1, Sk] int32 (varlen only)
    kv_segpos=None,    # [B, 1, Sk] int32 position-in-segment (varlen
    #                    per-segment sinks only; pads carry a huge value)
    attn_mask=None,    # [B, Hm, Sq, Sk] int8 (bool) or f32 (additive bias)
    kn_max=None,       # [B, Hq, 1, 1] f32: max_j of the K-side cap factor
    #                    (||k8_j|| with per-head scales folded into q_scale,
    #                    or ks_j*||k8_j|| in fine mode); the kernel builds
    #                    the per-row cap qs_i*||q8_i||*kn_max itself
    #                    (softmax_mode="static" only)
    v_mean=None,       # [B, Hk, 1, D] f32 (fuse_v_mean only)
    kv_true_dyn=None,  # () int32 true kv length (kv_len_dynamic only)
    k_head_scale=None,  # [B, Hk, 1, 1] f32 per-head K scale
    #                     (fuse_q_quant only; replaces the q_scale input)
    *,
    cfg: AttnConfig,
    interpret: bool = False,
):
    """Launch the attention kernel.  Inputs must be HND ([B, H, S, D] — the
    public layer transposes NHD); all seq dims pre-padded to the block
    sizes; masking of the kv tail uses ``cfg.kv_len``.

    Returns (out [B, Hq, Sq_pad, D], lse_base2 [B, Hq, Sq_pad] f32).
    """
    assert cfg.layout == "HND", "attention_call operates in HND; transpose first"
    B, Hq, Sq, D = q.shape
    _, Hk, Sk, _ = k.shape
    BQ, BK = cfg.block_q, cfg.block_k
    assert Sq % BQ == 0 and Sk % BK == 0, (Sq, Sk, BQ, BK)
    assert BK % cfg.bki == 0, (BK, cfg.bki)
    assert Hq % Hk == 0
    if cfg.compute_dtype == "bf16" and cfg.quantized:
        assert cfg.fold_k_scale, "bf16-compute mode needs head-folded K scales"
        assert cfg.pv_dtype in ("bf16", "int8"), cfg.pv_dtype
    if cfg.fuse_q_quant:
        assert cfg.quantized, "fuse_q_quant needs the quantized path"
        # masked paths are fine: the j == 0 quant step reads only the Q
        # tile (whose spec is never remapped by the bool-mask DMA tables),
        # and masks apply to s AFTER the quantized dot.  Under static mode
        # the post-hoc lmin check measures the ACTUAL denominators, so it
        # remains exact with bool masks and even float biases (a fully
        # masked row reads l = 0 and falls back online — correct, but
        # such workloads should prefer softmax_mode="online").
        assert (k_head_scale is not None) == cfg.fold_k_scale, \
            "k_head_scale iff fold_k_scale under fuse_q_quant"
        assert jnp.issubdtype(q.dtype, jnp.floating), q.dtype
        assert q_scale is None, "fuse_q_quant quantizes Q in-kernel"
    if cfg.window:
        assert cfg.causal and not cfg.causal_dynamic, \
            "sliding window needs static causal (row positions are grid-static)"
        assert cfg.masked == "none", \
            "sliding window composes with no user attn_mask"
        # segmented IS allowed: causal varlen requires identical q/k
        # packings, under which the global band equals each segment's own
        # band (both offsets share the segment start) and cross-segment
        # pairs are killed by the segment mask regardless
        assert cfg.window >= 1
        if cfg.sinks:
            assert cfg.sinks >= 1
            # dense: sinks are global positions.  segmented (varlen):
            # per-SEGMENT sinks — each sequence's own first tokens stay
            # visible; requires the kv_segpos input (position within
            # segment) and keeps the plain causal DMA clamp (sink columns
            # scatter through the pack, so below-band blocks must stream;
            # compute still skips dead non-sink tiles)
            assert (kv_segpos is not None) == cfg.segmented, \
                "segmented sinks need kv_segpos; dense sinks forbid it"
    else:
        assert cfg.sinks == 0, "attention_sinks requires sliding_window"
    if kv_segpos is not None:
        assert cfg.segmented and cfg.sinks
    if cfg.softmax_mode == "static":
        assert cfg.quantized, "static softmax needs int8 payload bounds"
        assert kn_max is not None, "softmax_mode='static' needs kn_max"
        assert cfg.pv_dtype != "fp8", \
            "static softmax is bf16-P (fp8 P needs the online exp-offset)"
        # A float bias breaks the PREDICTIVE cap (C no longer upper-bounds
        # s + bias) but not the algebra: static softmax is exact for ANY
        # shift C provided nothing under/overflows, and the fused post-hoc
        # lmin check measures the actual denominators (bias included) —
        # underflow is caught exactly, and overflow needs a bias beyond
        # ~127 log2 units (p <= exp2(bias_max), f32 headroom).
        assert cfg.masked != "float" or cfg.fuse_q_quant, \
            "static + float bias needs the fused post-hoc safety check"
        assert not cfg.p_sim_fp4, "fp4 P simulation needs the online row max"
    n_q, n_kv = Sq // BQ, Sk // BK
    W = max(cfg.kv_split, 1)
    if W > 1:
        # decode-path option (see AttnConfig.kv_split): the feature subset
        # is the KV-cache decode kernel's — online softmax, dynamic lengths,
        # dynamic-causal verify windows; everything whose index maps or
        # masks are per-block stays on the single-stream path.
        assert cfg.masked == "none" and not cfg.segmented, \
            "kv_split composes with no masks/segments"
        assert cfg.window == 0 and cfg.sinks == 0
        assert cfg.softmax_mode == "online" and not cfg.p_sim_fp4
        assert not (cfg.causal and not cfg.causal_dynamic), \
            "kv_split + static causal not supported (prefill keeps W=1)"
        assert n_kv % W == 0, (n_kv, W)
    n_g = n_kv // W   # kv GRID extent (each step streams W blocks)
    with_vscale = cfg.quantized and cfg.pv_dtype in ("int8", "fp8")

    Hm = attn_mask.shape[1] if cfg.masked != "none" else 0
    (q_spec, k_specs, v_specs, qs_spec, ks_specs, vs_spec, o_spec, lse_spec,
     qseg_spec, kseg_spec) = _specs(cfg, B, Hq, Hk, Sq, Sk, D, with_vscale,
                                    cfg.segmented, Hm)

    in_specs = []
    inputs = []
    prefetch_inputs = []
    if cfg.masked == "bool":
        # block-liveness table + DMA remap table, delivered by scalar
        # prefetch so the INDEX MAPS can see them: dead blocks (fully
        # masked / above-diagonal / past-the-tail) re-use the resident
        # K/V/mask buffers instead of fetching bytes the kernel will skip
        # (measured r3: without this, a 25%-live block-sparse mask ran
        # SLOWER than dense — DMA dominated).
        m6 = attn_mask.reshape(B, Hm, n_q, BQ, n_kv, BK)
        minfo = jnp.any(m6 != 0, axis=(3, 5)).astype(jnp.int32)
        livej = jnp.where(minfo != 0, jnp.arange(n_kv), -1)
        cummax = jax.lax.cummax(livej, axis=3)
        first_live = jnp.argmax(minfo != 0, axis=3, keepdims=True)
        table = jnp.where(cummax >= 0, cummax, first_live)
        if cfg.causal and not cfg.causal_dynamic:
            causal_last = (((jnp.arange(n_q) + 1) * BQ - 1) // BK
                           )[None, None, :, None]
            table = jnp.minimum(table, causal_last)
        elif not cfg.causal and cfg.kv_len < Sk:
            table = jnp.minimum(table, (cfg.kv_len - 1) // BK)
        prefetch_inputs = [minfo.astype(jnp.int32),
                           table.astype(jnp.int32)]
    if cfg.segmented and cfg.sinks:
        # (B, n_kv) per-block sink liveness: block j holds a within-segment
        # sink token iff the min position-in-segment over its BK tokens is
        # < sinks (pads carry a huge segpos).  Feeds both the kernel's tile
        # liveness and the below-window DMA clamp (_specs) — mutually
        # exclusive with the bool-mask tables (window forbids attn_mask).
        sinkblk = (jnp.min(kv_segpos.reshape(B, n_kv, BK), axis=-1)
                   < cfg.sinks)
        prefetch_inputs.append(sinkblk.astype(jnp.int32))
    if cfg.causal and cfg.causal_dynamic:
        assert offsets is not None, "causal_dynamic needs (q_start, kv_start)"
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(offsets.astype(jnp.int32))
    if cfg.kv_len_dynamic:
        assert kv_true_dyn is not None, "kv_len_dynamic needs kv_true_dyn"
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(kv_true_dyn, jnp.int32).reshape(1))
    in_specs += [q_spec] + k_specs + v_specs
    inputs += [q] + [k] * W + [v] * W
    if cfg.quantized:
        if cfg.fuse_q_quant:
            if cfg.fold_k_scale:
                in_specs.append(
                    qs_spec if cfg.fuse_k_rows else pl.BlockSpec(
                        (1, 1, 1, 1),
                        lambda b, h, i, j, *_: (b, h // (Hq // Hk), 0, 0)))
                inputs.append(k_head_scale.astype(jnp.float32))
        else:
            in_specs.append(qs_spec)
            inputs.append(q_scale.astype(jnp.float32))
        if not cfg.fold_k_scale:
            in_specs += ks_specs
            inputs += [k_scale.astype(jnp.float32)] * W
        if with_vscale:
            in_specs.append(vs_spec)
            inputs.append(v_scale.astype(jnp.float32))
        if cfg.fuse_v_mean:
            assert v_mean is not None, "fuse_v_mean needs v_mean"
            in_specs.append(vs_spec)  # same (1,1,1,D) per-channel geometry
            inputs.append(v_mean.astype(jnp.float32))
        if cfg.softmax_mode == "static":
            in_specs.append(pl.BlockSpec((1, 1, 1, 1),
                                         lambda b, h, i, j, *_: (b, h, 0, 0)))
            inputs.append(kn_max.astype(jnp.float32))
    if cfg.segmented:
        in_specs += [qseg_spec, kseg_spec]
        inputs += [q_segments.astype(jnp.int32), kv_segments.astype(jnp.int32)]
        if cfg.sinks:
            in_specs.append(kseg_spec)   # same tiling as the segment ids
            inputs.append(kv_segpos.astype(jnp.int32))
    if cfg.masked == "bool":
        # mask tiles follow the same remap table as K/V (dead blocks
        # re-use the resident tile; the kernel never reads it)
        in_specs.append(pl.BlockSpec(
            (1, 1, BQ, BK),
            lambda b, h, i, j, minfo, table:
                (b, 0 if Hm == 1 else h, i,
                 table[b, 0 if Hm == 1 else h, i, j])))
        inputs.append(attn_mask)
    elif cfg.masked == "float":
        in_specs.append(pl.BlockSpec(
            (1, 1, BQ, BK),
            lambda b, h, i, j, *_: (b, 0 if Hm == 1 else h, i, j)))
        inputs.append(attn_mask)

    out_shape_o = jax.ShapeDtypeStruct((B, Hq, Sq, D), cfg.out_dtype)
    out_shapes = (out_shape_o,)
    out_specs = (o_spec,)
    if cfg.emit_lse:
        out_shapes += (jax.ShapeDtypeStruct((B, Hq, Sq, 1), jnp.float32),)
        out_specs += (lse_spec,)
    emit_lmin = cfg.softmax_mode == "static" and cfg.fuse_q_quant
    if emit_lmin:
        out_shapes += (jax.ShapeDtypeStruct((B, Hq, n_q * 8, LANES),
                                            jnp.float32),)
        out_specs += (pl.BlockSpec((1, 1, 8, LANES),
                                   lambda b, h, i, j, *_: (b, h, i, 0)),)

    kernel = functools.partial(_attn_kernel, cfg=cfg, n_kv=n_g,
                               mask_heads=Hm)
    flops = 4 * B * Hq * Sq * Sk * D // (2 if cfg.causal else 1)
    dq_compute = cfg.quantized and cfg.compute_dtype == "bf16"
    scratch_shapes = [
        pltpu.VMEM((BQ, LANES), jnp.float32),
        pltpu.VMEM((BQ, LANES), jnp.float32),
        pltpu.VMEM((BQ, D), jnp.float32),
    ]
    if dq_compute:
        scratch_shapes.append(pltpu.VMEM((BQ, D), jnp.bfloat16))
    elif cfg.fuse_q_quant:
        scratch_shapes += [pltpu.VMEM((BQ, D), jnp.int8),
                           pltpu.VMEM((BQ, LANES), jnp.float32)]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        # v5e has 128 MB VMEM; large tiles need more than the 16 MB
        # default scoped allowance.
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=q.size + k.size + v.size + out_shape_o.size,
        transcendentals=B * Hq * Sq * Sk,
    )
    if prefetch_inputs:
        res = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=len(prefetch_inputs),
                grid=(B, Hq, n_q, n_g),
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*prefetch_inputs, *inputs)
    else:
        res = pl.pallas_call(
            kernel,
            grid=(B, Hq, n_q, n_g),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*inputs)
    if emit_lmin:
        if cfg.emit_lse:
            out, lse, lmin = res
            return out, lse[..., 0], lmin
        return res[0], None, res[1]
    if cfg.emit_lse:
        out, lse = res
        return out, lse[..., 0]
    return res[0], None
