"""Pallas backward kernels for attention (training path).

The reference is inference-only; our forward already exposes a
straight-through custom_vjp (ops/backward.py gives the chunked-jnp math).
These kernels are the production version: FlashAttention-style backward
with the score matrix recomputed per tile from the saved (q, k, v, lse),

    P_ij  = exp(q_i.k_j * scale - lse_i)
    dV_j  = sum_i P_ij^T dO_i
    dS_ij = P_ij * (dO_i . V_j - D_i),   D_i = sum(dO_i * O_i)
    dK_j  = scale * sum_i dS_ij^T Q_i
    dQ_i  = scale * sum_j dS_ij K_j

Two kernels with opposite iteration orders (the reference-world standard —
and jax's own flash backward — uses the same split):
  - dKV: grid (..., kv_blocks, q_blocks), q innermost, accumulates dK/dV
  - dQ:  grid (..., q_blocks, kv_blocks), kv innermost, accumulates dQ

Both run in bf16 with fp32 accumulation and base-2 softmax (log2e folded
into the lse operand).  GQA handled by computing per-q-head dK/dV and
group-summing outside (simple, correct; G is small in practice).

``quantized=True`` (r3) is the SageBwd-class training path (design source
arXiv 2505.11594, which the reference library does not ship — it is
inference-only), shaped by the measured v5e reality rather than the
paper's 6-of-7-int8 recipe: an int8 matmul only wins when its operands'
quantization is AMORTIZED outside the hot loop (the forward learned the
same — int8 QK^T wins, per-tile P quant does not; docs/PERF_NOTES.md
"int8 helps only QK^T").  So:

  int8:  S-recompute in BOTH kernels — q/k are quantized ONCE in the
         wrapper (per-ROW scales, sm_scale*log2e folded into the q codes
         so s32*qs*ks IS the base-2 logit) and their codes are reused by
         every tile; q/k HBM reads halve as a side effect.
  bf16:  everything else.  dV/dK/dQ would need P / dS quantized per
         tile — measured NET LOSS on v5e (probe_qbwd.py r3: all-int8
         99.2 vs bf16 113.5 TF-eff; the per-tile amax/rint VPU chain
         outweighs the 2x MXU rate).  dO V^T additionally feeds the
         cancellation dS = P * (dO V^T - D_i), which SageBwd itself
         keeps in high precision.

The dV/dK/dQ dots consume q/k dequantized in-register ((BQ,D)/(BK,D)
row-scale multiplies — O(S D) per tile, amortized over the (BQ,BK)
work).  dK therefore carries the q codes' folded sm_scale*log2e, undone
in the epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _band(p, i, j, BQ, BK, window, sinks=0):
    """Zero entries of the recomputed P outside the causal (and, with a
    sliding window, band — plus sink columns) region — mirrors the
    forward's mask exactly so lse (computed WITH the window) normalizes
    the same visible set."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0) + i * BQ
    cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1) + j * BK
    keep = cols <= rows
    if window:
        band = cols >= rows - (window - 1)
        if sinks:
            band = jnp.logical_or(band, cols < sinks)
        keep = jnp.logical_and(keep, band)
    return jnp.where(keep, p, 0.0)


def _band_run(run, i, j, BQ, BK, window, sinks):
    """Block-level liveness: inside the widest band any row sees, or a
    sink block (visible to every row)."""
    live = (j * BK + BK - 1) >= (i * BQ - window + 1)
    if sinks:
        live = jnp.logical_or(live, j * BK < sinks)
    return jnp.logical_and(run, live)


def _dkv_kernel(*refs, sm_scale, causal, masked, quantized, window, sinks,
                BQ, BK, n_q):
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = (next(it) for _ in range(6))
    qs_ref = ks_ref = None
    if quantized:
        qs_ref, ks_ref = next(it), next(it)   # (BQ,1) rows, (1,BK) cols
    mask_ref = next(it) if masked else None
    dk_ref, dv_ref, dk_acc, dv_acc = (next(it) for _ in range(4))
    j = pl.program_id(2)   # kv block
    i = pl.program_id(3)   # q block (innermost)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = (j * BK) <= (i * BQ + BQ - 1)
        if window:
            # skip kv blocks entirely below every row's window (sink
            # blocks stay live for every q block)
            run = _band_run(run, i, j, BQ, BK, window, sinks)

    @pl.when(run)
    def _():
        q = q_ref[0, 0]                      # (BQ, D) bf16 | int8
        k = k_ref[0, 0]                      # (BK, D) bf16 | int8
        v = v_ref[0, 0]                      # (BK, D) bf16
        do = do_ref[0, 0]                    # (BQ, D) bf16
        lse2 = lse_ref[0, 0]                 # (BQ, 1) f32, base-2 (lse*log2e)
        di = di_ref[0, 0]                    # (BQ, 1) f32

        if quantized:
            # int8 MXU recompute; q codes fold sm_scale*log2e, so
            # s32*qs*ks is the base-2 logit directly
            s32 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            s = s32.astype(jnp.float32) * qs_ref[0, 0] * ks_ref[0, 0]
        else:
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (sm_scale * LOG2E)
        p = jnp.exp2(s - lse2)               # (BQ, BK)
        if causal:
            p = _band(p, i, j, BQ, BK, window, sinks)
        if masked:
            # lse was computed WITH the mask in the forward; the recomputed
            # p must zero masked pairs or they'd leak spurious gradient
            p = jnp.where(mask_ref[0, 0] != 0, p, 0.0)
        # dS = P * (dO V^T - D) — dO V^T stays bf16 (cancellation vs D_i)
        dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dov - di)
        pb = p.astype(jnp.bfloat16)
        # dV += P^T dO  (contract over q rows)
        dv_acc[...] += jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if quantized:
            # dequant q in-register for the bf16 dK dot — (BQ,D) row-scale
            # multiply, amortized over the (BQ,BK) tile work (per-tile
            # quant of dS/P measured a net loss, module docstring)
            qd = (q.astype(jnp.float32) * qs_ref[0, 0]).astype(jnp.bfloat16)
        else:
            qd = q
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), qd, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == n_q - 1)
    def _():
        # quantized: the q codes already carry sm_scale*log2e, undo log2e
        fin = (1.0 / LOG2E) if quantized else sm_scale
        dk_ref[0, 0] = (dk_acc[...] * fin).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(*refs, sm_scale, causal, masked, quantized, window,
               sinks, BQ, BK, n_kv):
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = (next(it) for _ in range(6))
    qs_ref = ks_ref = ksr_ref = None
    if quantized:
        # (BQ,1) q-row scales, (1,BK) k-col scales (for s), (BK,1) k-row
        # scales (for the in-register k dequant)
        qs_ref, ks_ref, ksr_ref = next(it), next(it), next(it)
    mask_ref = next(it) if masked else None
    dq_ref, dq_acc = next(it), next(it)
    i = pl.program_id(2)   # q block
    j = pl.program_id(3)   # kv block (innermost)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = (j * BK) <= (i * BQ + BQ - 1)
        if window:
            run = _band_run(run, i, j, BQ, BK, window, sinks)

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0]
        di = di_ref[0, 0]
        if quantized:
            s32 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            s = s32.astype(jnp.float32) * qs_ref[0, 0] * ks_ref[0, 0]
        else:
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (sm_scale * LOG2E)
        p = jnp.exp2(s - lse2)
        if causal:
            p = _band(p, i, j, BQ, BK, window, sinks)
        if masked:
            p = jnp.where(mask_ref[0, 0] != 0, p, 0.0)
        dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dov - di)
        if quantized:
            # dequant k in-register for the bf16 dQ dot; ks arrives as the
            # per-COLUMN expansion (1,BK) — transpose-free row scaling of
            # the (BK,D) k tile needs (BK,1), so the wrapper also threads
            # the row expansion through ksr_ref
            kd = (k.astype(jnp.float32) * ksr_ref[0, 0]).astype(jnp.bfloat16)
        else:
            kd = k
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), kd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == n_kv - 1)
    def _():
        dq_ref[0, 0] = (dq_acc[...] * sm_scale).astype(dq_ref.dtype)


def attention_backward_pallas(q, k, v, o, lse, do, *, sm_scale, is_causal,
                              attn_mask=None, quantized: bool = False,
                              window: int = 0, sinks: int = 0,
                              block_q: int = 2048, block_k: int = 2048,
                              di=None, out_dtype=None,
                              interpret: bool = False):
    # default blocks from the r2 TPU sweep: 2048x2048 = 117 TFLOPS-eff vs
    # 92 at 512x512 (S=8192 hd128); small seqs shrink via the min() below.
    """HND inputs, Sq/Sk already multiples of the blocks are NOT required —
    this wrapper pads internally.  q/o/do [B,Hq,Sq,D]; k/v [B,Hk,Sk,D];
    lse [B,Hq,Sq] natural-log (computed WITH ``attn_mask`` if given).
    ``attn_mask``: bool keep-mask [B, 1|Hq, Sq, Sk] (float bias is handled
    one level up — its own gradient would be O(S^2) to materialize).
    ``quantized``: SageBwd-class int8 path (5 of 7 matmuls on the int8
    MXU; module docstring has the precision split).
    ``window``: sliding-window (local causal) attention — row r saw keys
    [r - window + 1, r] in the forward; requires ``is_causal``.  Out-of-band
    tiles are skipped at compute AND DMA level (index-map clamps below), so
    the backward is O(S*W) like the forward.
    ``sinks``: StreamingLLM attention sinks — the first ``sinks`` key
    positions stayed visible to every row in addition to its band; their
    kv blocks stay live in both grids (requires ``window``).
    ``di``: precomputed rowsum(dO*O) [B,Hq,Sq] f32 — lets ring attention
    rotate (q, do, lse, di) instead of the full ``o`` (which is only read
    for this reduction; pass ``o=None`` then).
    ``out_dtype``: gradient dtype override (ring partials accumulate in
    f32 across steps; default = the matching input's dtype).
    Returns (dq, dk, dv) with GQA group-sum."""
    if window:
        assert is_causal, "window requires is_causal"
    else:
        assert sinks == 0, "sinks requires window"
    B, Hq, Sq, D = q.shape
    _, Hk, Sk, _ = k.shape
    G = Hq // Hk
    masked = attn_mask is not None

    BQ = min(block_q, ((max(Sq, 128) + 127) // 128) * 128)
    BK = min(block_k, ((max(Sk, 128) + 127) // 128) * 128)
    pad_q = (-Sq) % BQ
    pad_k = (-Sk) % BK

    qb = jnp.pad(q.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    dob = jnp.pad(do.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kb = jnp.pad(k.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    vb = jnp.pad(v.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    if G > 1:
        kb = jnp.repeat(kb, G, axis=1)
        vb = jnp.repeat(vb, G, axis=1)
    # padded q rows: lse -> +inf makes p = exp2(s - inf) = 0 (no contribution)
    lse2 = jnp.pad(lse.astype(jnp.float32) * LOG2E,
                   ((0, 0), (0, 0), (0, pad_q)), constant_values=3e38)[..., None]
    if di is None:
        ob = jnp.pad(o.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        di = jnp.sum(dob.astype(jnp.float32) * ob, axis=-1, keepdims=True)
    else:
        di = jnp.pad(di.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, pad_q)))[..., None]
    Sqp, Skp = Sq + pad_q, Sk + pad_k
    n_q, n_kv = Sqp // BQ, Skp // BK

    # Index-map clamps (forward's trick, ops/attention.py `_j`): grid steps
    # whose tile lies outside the causal/band region are compute-skipped by
    # the kernels' `run` predicate; clamping their data index to the nearest
    # live block makes the DMA re-use the resident buffer — causal backward
    # touches only the lower triangle, windowed backward is O(S*W).
    if is_causal:
        def _iq(j, i):          # dKV grid: live q blocks for kv block j
            lo = (j * BK) // BQ
            if window:
                hi = jnp.minimum(
                    (j * BK + BK - 1 + window - 1) // BQ, n_q - 1)
                clamped = jnp.minimum(jnp.maximum(i, lo), hi)
                if sinks:
                    # sink kv blocks are live for EVERY q block at/after
                    # the diagonal: drop the window's upper clamp
                    clamped = jnp.where(j * BK < sinks,
                                        jnp.maximum(i, lo), clamped)
                return clamped
            return jnp.maximum(i, lo)

        def _jk(i, j):          # dQ grid: live kv blocks for q block i
            hi = ((i + 1) * BQ - 1) // BK
            if window:
                lo = jnp.maximum(i * BQ - window + 1, 0) // BK
                clamped = jnp.minimum(jnp.maximum(j, lo), hi)
                if sinks:
                    # sink blocks pass through (bounded by the diagonal)
                    clamped = jnp.where(j * BK < sinks,
                                        jnp.minimum(j, hi), clamped)
                return clamped
            return jnp.minimum(j, hi)
    else:
        _iq = lambda j, i: i    # noqa: E731
        _jk = lambda i, j: j    # noqa: E731

    scale_in = []
    scale_specs = lambda order: []  # noqa: E731
    if quantized:
        from . import quant as quant_ops
        # fresh per-ROW quant of the SAVED tensors (independent of the
        # forward's codes — the backward approximates the gradient of exact
        # attention, SageBwd-style); fold makes s32*qs*ks the base-2 logit
        q8, qs_g = quant_ops.quant_int8_groupwise(
            qb, 1, fold=sm_scale * LOG2E)
        k8, ks_g = quant_ops.quant_int8_groupwise(kb, 1)
        qs_rows = quant_ops.expand_scales_rows(qs_g, 1, Sqp)
        ks_cols = quant_ops.expand_scales_cols(ks_g, 1, Skp)
        ks_rows = quant_ops.expand_scales_rows(ks_g, 1, Skp)
        qb, kb = q8, k8
        scale_in = [qs_rows, ks_cols]

        def scale_specs(order):
            # qs rides the q-block index, ks the kv-block index; the dq
            # grid ("ij") also gets the k-row-scale expansion for the
            # in-register k dequant
            if order == "ji":
                return [
                    pl.BlockSpec((1, 1, BQ, 1),
                                 lambda b, h, j, i: (b, h, _iq(j, i), 0)),
                    pl.BlockSpec((1, 1, 1, BK), lambda b, h, j, i: (b, h, 0, j)),
                ]
            return [
                pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, 1, BK),
                             lambda b, h, i, j: (b, h, 0, _jk(i, j))),
                pl.BlockSpec((1, 1, BK, 1),
                             lambda b, h, i, j: (b, h, _jk(i, j), 0)),
            ]

    mask_in = []
    if masked:
        Hm = attn_mask.shape[1]
        mb = jnp.pad(attn_mask.astype(jnp.int8),
                     ((0, 0), (0, 0), (0, pad_q), (0, pad_k)))
        mask_in = [mb]

        def mask_spec(order):
            # order: "ji" (dkv grid: j=kv outer, i=q inner) or "ij"
            if order == "ji":
                return pl.BlockSpec(
                    (1, 1, BQ, BK),
                    lambda b, h, j, i: (b, 0 if Hm == 1 else h, _iq(j, i), j))
            return pl.BlockSpec(
                (1, 1, BQ, BK),
                lambda b, h, i, j: (b, 0 if Hm == 1 else h, i, _jk(i, j)))

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, causal=is_causal,
                          masked=masked, quantized=quantized, window=window,
                          sinks=sinks,
                          BQ=BQ, BK=BK, n_q=n_q),
        grid=(B, Hq, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D),
                         lambda b, h, j, i: (b, h, _iq(j, i), 0)),          # q
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),   # k
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),   # v
            pl.BlockSpec((1, 1, BQ, D),
                         lambda b, h, j, i: (b, h, _iq(j, i), 0)),          # do
            pl.BlockSpec((1, 1, BQ, 1),
                         lambda b, h, j, i: (b, h, _iq(j, i), 0)),          # lse
            pl.BlockSpec((1, 1, BQ, 1),
                         lambda b, h, j, i: (b, h, _iq(j, i), 0)),          # di
        ] + scale_specs("ji") + ([mask_spec("ji")] if masked else []),
        out_specs=(
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),
        ),
        # outputs land in the CALLER dtype directly: the kernels accumulate
        # in f32 scratch and cast once in their final write, so an f32
        # out_shape would only add a separate XLA convert kernel + 2x the
        # HBM write traffic (measured ~4 ms of the 9.6 ms causal gap to the
        # probe_bwd_anatomy skeleton at 8K)
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, Skp, D), out_dtype or k.dtype),
            jax.ShapeDtypeStruct((B, Hq, Skp, D), out_dtype or v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((BK, D), jnp.float32),
                        pltpu.VMEM((BK, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qb, kb, vb, dob, lse2, di, *scale_in, *mask_in)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, causal=is_causal,
                          masked=masked, quantized=quantized, window=window,
                          sinks=sinks,
                          BQ=BQ, BK=BK, n_kv=n_kv),
        grid=(B, Hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BK, D),
                         lambda b, h, i, j: (b, h, _jk(i, j), 0)),
            pl.BlockSpec((1, 1, BK, D),
                         lambda b, h, i, j: (b, h, _jk(i, j), 0)),
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0)),
        ] + scale_specs("ij") + ([mask_spec("ij")] if masked else []),
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sqp, D), out_dtype or q.dtype),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qb, kb, vb, dob, lse2, di,
      *(scale_in + [ks_rows] if quantized else []), *mask_in)

    dq = dq[:, :, :Sq]
    dk = dk[:, :, :Sk]
    dv = dv[:, :, :Sk]
    if G > 1:
        # f32 accumulation over the GQA group; the per-head slices are
        # already caller-dtype (their own bf16 dots dominate the rounding)
        dk = dk.reshape(B, Hk, G, Sk, D).sum(axis=2, dtype=jnp.float32)
        dv = dv.reshape(B, Hk, G, Sk, D).sum(axis=2, dtype=jnp.float32)
    return (dq, dk.astype(out_dtype or k.dtype),
            dv.astype(out_dtype or v.dtype))
