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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _dkv_kernel(*refs, sm_scale, causal, masked, BQ, BK, n_q):
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = (next(it) for _ in range(6))
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

    @pl.when(run)
    def _():
        q = q_ref[0, 0]                      # (BQ, D) bf16
        k = k_ref[0, 0]                      # (BK, D) bf16
        v = v_ref[0, 0]
        do = do_ref[0, 0]                    # (BQ, D)
        lse2 = lse_ref[0, 0]                 # (BQ, 1) f32, base-2 (lse*log2e)
        di = di_ref[0, 0]                    # (BQ, 1) f32

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (sm_scale * LOG2E)
        p = jnp.exp2(s - lse2)               # (BQ, BK)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0) + i * BQ
            cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1) + j * BK
            p = jnp.where(cols <= rows, p, 0.0)
        if masked:
            # lse was computed WITH the mask in the forward; the recomputed
            # p must zero masked pairs or they'd leak spurious gradient
            p = jnp.where(mask_ref[0, 0] != 0, p, 0.0)
        pb = p.astype(jnp.bfloat16)
        # dV += P^T dO  (contract over q rows)
        dv_acc[...] += jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        # dS = P * (dO V^T - D)
        dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = (p * (dov - di)).astype(jnp.bfloat16)
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == n_q - 1)
    def _():
        dk_ref[0, 0] = (dk_acc[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(*refs, sm_scale, causal, masked, BQ, BK, n_kv):
    it = iter(refs)
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = (next(it) for _ in range(6))
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

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0]
        di = di_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (sm_scale * LOG2E)
        p = jnp.exp2(s - lse2)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0) + i * BQ
            cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1) + j * BK
            p = jnp.where(cols <= rows, p, 0.0)
        if masked:
            p = jnp.where(mask_ref[0, 0] != 0, p, 0.0)
        dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = (p * (dov - di)).astype(jnp.bfloat16)
        dq_acc[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == n_kv - 1)
    def _():
        dq_ref[0, 0] = (dq_acc[...] * sm_scale).astype(dq_ref.dtype)


def attention_backward_pallas(q, k, v, o, lse, do, *, sm_scale, is_causal,
                              attn_mask=None,
                              block_q: int = 2048, block_k: int = 2048,
                              interpret: bool = False):
    # default blocks from the r2 TPU sweep: 2048x2048 = 117 TFLOPS-eff vs
    # 92 at 512x512 (S=8192 hd128); small seqs shrink via the min() below.
    """HND inputs, Sq/Sk already multiples of the blocks are NOT required —
    this wrapper pads internally.  q/o/do [B,Hq,Sq,D]; k/v [B,Hk,Sk,D];
    lse [B,Hq,Sq] natural-log (computed WITH ``attn_mask`` if given).
    ``attn_mask``: bool keep-mask [B, 1|Hq, Sq, Sk] (float bias is handled
    one level up — its own gradient would be O(S^2) to materialize).
    Returns (dq, dk, dv) with GQA group-sum."""
    B, Hq, Sq, D = q.shape
    _, Hk, Sk, _ = k.shape
    G = Hq // Hk
    masked = attn_mask is not None

    BQ = min(block_q, ((max(Sq, 128) + 127) // 128) * 128)
    BK = min(block_k, ((max(Sk, 128) + 127) // 128) * 128)
    pad_q = (-Sq) % BQ
    pad_k = (-Sk) % BK

    qb = jnp.pad(q.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    ob = jnp.pad(o.astype(jnp.float32), ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    dob = jnp.pad(do.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kb = jnp.pad(k.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    vb = jnp.pad(v.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    if G > 1:
        kb = jnp.repeat(kb, G, axis=1)
        vb = jnp.repeat(vb, G, axis=1)
    # padded q rows: lse -> +inf makes p = exp2(s - inf) = 0 (no contribution)
    lse2 = jnp.pad(lse.astype(jnp.float32) * LOG2E,
                   ((0, 0), (0, 0), (0, pad_q)), constant_values=3e38)[..., None]
    di = jnp.sum(dob.astype(jnp.float32) * ob, axis=-1, keepdims=True)
    Sqp, Skp = Sq + pad_q, Sk + pad_k
    n_q, n_kv = Sqp // BQ, Skp // BK

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
                    lambda b, h, j, i: (b, 0 if Hm == 1 else h, i, j))
            return pl.BlockSpec(
                (1, 1, BQ, BK),
                lambda b, h, i, j: (b, 0 if Hm == 1 else h, i, j))

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, causal=is_causal,
                          masked=masked, BQ=BQ, BK=BK, n_q=n_q),
        grid=(B, Hq, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, j, i: (b, h, i, 0)),   # q
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),   # k
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),   # v
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, j, i: (b, h, i, 0)),   # do
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, j, i: (b, h, i, 0)),   # lse
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, j, i: (b, h, i, 0)),   # di
        ] + ([mask_spec("ji")] if masked else []),
        out_specs=(
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, Skp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, Skp, D), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((BK, D), jnp.float32),
                        pltpu.VMEM((BK, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qb, kb, vb, dob, lse2, di, *mask_in)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, causal=is_causal,
                          masked=masked, BQ=BQ, BK=BK, n_kv=n_kv),
        grid=(B, Hq, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0)),
        ] + ([mask_spec("ij")] if masked else []),
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sqp, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qb, kb, vb, dob, lse2, di, *mask_in)

    dq = dq[:, :, :Sq].astype(q.dtype)
    dk = dk[:, :, :Sk]
    dv = dv[:, :, :Sk]
    if G > 1:
        dk = dk.reshape(B, Hk, G, Sk, D).sum(axis=2)
        dv = dv.reshape(B, Hk, G, Sk, D).sum(axis=2)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)
