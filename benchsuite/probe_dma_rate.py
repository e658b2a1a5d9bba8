#!/usr/bin/env python
"""What bounds the decode kernel's DMA rate? (r4)

probe_decode_anatomy measured the decode skeleton's K+V int8 stream at
~150-175 GB/s — far under the chip's ~819 and under the 300 GB/s the prep
copy-floor reaches.  This probe isolates the axes:

  read-bf16-1   one bf16 stream, (1,1,BK,D) blocks, trivial touch
  read-int8-1   one int8 stream, same blocks — is DMA per-byte or
                per-ELEMENT (int8 halves bytes; equal time => per-element)
  read-int8-2   two int8 streams (K+V, the decode shape)
  read-int8-2w  two int8 streams, WIDE blocks (1,1,BK*4,D) — fewer, bigger
                grid steps at the same total bytes
  read-bf16-2   two bf16 streams (the bf16-cache decode shape)

All grids (B, Hk, n) with the last dim arbitrary (the decode accumulator
pattern), B=8 Hk=8 L=16384 D=128 — the 16K decode workload exactly.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_dma_rate.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sageattention_tpu.utils.testing import time_fn

B, Hk, L, D = 8, 8, 16384, 128
TQ = 32


def _k1(a_ref, o_ref, acc, *, n):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += a_ref[0, 0][:TQ].astype(jnp.float32)

    @pl.when(j == n - 1)
    def _():
        o_ref[0, 0] = acc[...].astype(o_ref.dtype)


def _kN(*refs, n):
    *in_refs, o_ref, acc = refs
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    tot = in_refs[0][0, 0][:TQ].astype(jnp.float32)
    for r in in_refs[1:]:
        tot = tot + r[0, 0][:TQ].astype(jnp.float32)
    acc[...] += tot

    @pl.when(j == n - 1)
    def _():
        o_ref[0, 0] = acc[...].astype(o_ref.dtype)


def run(name, dtype, streams, BK, reps=30):
    n = L // BK
    spec = pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0))
    r = jax.random.split(jax.random.PRNGKey(0), streams)
    ops = [(jax.random.normal(r[i], (B, Hk, L, D)) * 3).astype(dtype)
           for i in range(streams)]
    kern = _k1 if streams == 1 else _kN
    fn = pl.pallas_call(
        functools.partial(kern, n=n),
        grid=(B, Hk, n),
        in_specs=[spec] * streams,
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hk, TQ, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TQ, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    t = time_fn(jax.jit(fn), *ops, reps=reps)
    bytes_ = streams * B * Hk * L * D * ops[0].dtype.itemsize
    els = streams * B * Hk * L * D
    print(f"{name:>14} BK={BK:>5}: {t * 1e6:8.1f} us  "
          f"{bytes_ / t / 1e9:6.1f} GB/s  {els / t / 1e9:6.1f} Gel/s",
          flush=True)
    return t


if __name__ == "__main__":
    if "--streams" in sys.argv:
        # does the per-operand ~85 Gel/s rate scale with operand count?
        for s in (2, 3, 4, 6):
            run(f"read-int8-{s}", jnp.int8, s, 2048)
        sys.exit(0)
    for BK in (2048, 8192):
        run("read-bf16-1", jnp.bfloat16, 1, BK)
        run("read-int8-1", jnp.int8, 1, BK)
        run("read-int8-2", jnp.int8, 2, BK)
        run("read-bf16-2", jnp.bfloat16, 2, BK)


# --- split-stream decode prototype: the REAL online-softmax decode body,
# --- K and V each split into even/odd-block operands (4 concurrent DMA
# --- streams).  Confirms the stream-scaling win composes with compute
# --- before the production kernel adopts it.

def _decode_split_kernel(q_ref, ka_ref, kb_ref, ksa_ref, ksb_ref, va_ref,
                         vb_ref, o_ref, acc, m_scr, l_scr, *, n2):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_scr[...] = jnp.full_like(m_scr, -1e20)
        l_scr[...] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0]

    def upd(k, ks, v):
        s = jax.lax.dot_general(q, k.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks
        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - jnp.broadcast_to(m_next[:, :1], s.shape))
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        acc[...] *= jnp.broadcast_to(alpha[:, :1], acc.shape)
        m_scr[...] = m_next
        acc[...] += jax.lax.dot_general(p.astype(jnp.bfloat16),
                                        v.astype(jnp.bfloat16),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    upd(ka_ref[0, 0], ksa_ref[0, 0], va_ref[0, 0])
    upd(kb_ref[0, 0], ksb_ref[0, 0], vb_ref[0, 0])

    @pl.when(j == n2 - 1)
    def _():
        o_ref[0, 0] = acc[...].astype(o_ref.dtype)


def run_decode_split(BK=2048, split=True, reps=30):
    n = L // BK
    n2 = n // 2 if split else n
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(r[0], (B, Hk, TQ, D), jnp.bfloat16)
    k = (jax.random.normal(r[1], (B, Hk, L, D)) * 30).astype(jnp.int8)
    v = (jax.random.normal(r[2], (B, Hk, L, D)) * 30).astype(jnp.int8)
    ks = jax.random.uniform(r[3], (B, Hk, 1, L), jnp.float32)
    qspec = pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0))
    if split:
        ka = pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, 2 * j, 0))
        kb = pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, 2 * j + 1, 0))
        sa = pl.BlockSpec((1, 1, 1, BK), lambda b, h, j: (b, h, 0, 2 * j))
        sb = pl.BlockSpec((1, 1, 1, BK), lambda b, h, j: (b, h, 0, 2 * j + 1))
        in_specs = [qspec, ka, kb, sa, sb, ka, kb]
        ops = (q, k, k, ks, ks, v, v)
    else:
        kk = pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0))
        ss = pl.BlockSpec((1, 1, 1, BK), lambda b, h, j: (b, h, 0, j))
        in_specs = [qspec, kk, kk, ss, ss, kk, kk]
        # same-operand aliasing baseline: A == B == block j (reads twice)
        ops = (q, k, k, ks, ks, v, v)
    fn = pl.pallas_call(
        functools.partial(_decode_split_kernel, n2=n2),
        grid=(B, Hk, n2),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hk, TQ, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TQ, D), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    t = time_fn(jax.jit(fn), *ops, reps=reps)
    bytes_ = 2 * B * Hk * L * D + 4 * B * Hk * L
    print(f"decode-{'split4' if split else 'base2'} BK={BK:>5}: "
          f"{t * 1e6:8.1f} us  {bytes_ / t / 1e9:6.1f} GB/s(kv)", flush=True)
    return t


def _decode_splitN_kernel(*refs, n2, ways):
    q_ref = refs[0]
    ks_refs = refs[1:1 + ways]
    k_refs = refs[1 + ways:1 + 2 * ways]
    v_refs = refs[1 + 2 * ways:1 + 3 * ways]
    o_ref, acc, m_scr, l_scr = refs[1 + 3 * ways:]
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_scr[...] = jnp.full_like(m_scr, -1e20)
        l_scr[...] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0]

    def upd(k, ks, v):
        s = jax.lax.dot_general(q, k.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks
        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - jnp.broadcast_to(m_next[:, :1], s.shape))
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        acc[...] *= jnp.broadcast_to(alpha[:, :1], acc.shape)
        m_scr[...] = m_next
        acc[...] += jax.lax.dot_general(p.astype(jnp.bfloat16),
                                        v.astype(jnp.bfloat16),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    for w in range(ways):
        upd(k_refs[w][0, 0], ks_refs[w][0, 0], v_refs[w][0, 0])

    @pl.when(j == n2 - 1)
    def _():
        o_ref[0, 0] = acc[...].astype(o_ref.dtype)


def run_decode_splitN(BK=2048, ways=3, reps=30):
    n = L // BK
    n2 = n // ways
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(r[0], (B, Hk, TQ, D), jnp.bfloat16)
    k = (jax.random.normal(r[1], (B, Hk, L, D)) * 30).astype(jnp.int8)
    v = (jax.random.normal(r[2], (B, Hk, L, D)) * 30).astype(jnp.int8)
    ks = jax.random.uniform(r[3], (B, Hk, 1, L), jnp.float32)
    qspec = pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0))
    kvspecs = [pl.BlockSpec((1, 1, BK, D),
                            functools.partial(
                                lambda w, b, h, j: (b, h, ways * j + w, 0), w))
               for w in range(ways)]
    sspecs = [pl.BlockSpec((1, 1, 1, BK),
                           functools.partial(
                               lambda w, b, h, j: (b, h, 0, ways * j + w), w))
              for w in range(ways)]
    fn = pl.pallas_call(
        functools.partial(_decode_splitN_kernel, n2=n2, ways=ways),
        grid=(B, Hk, n2),
        in_specs=[qspec] + sspecs + kvspecs + kvspecs,
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hk, TQ, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TQ, D), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    ops = [q] + [ks] * ways + [k] * ways + [v] * ways
    t = time_fn(jax.jit(fn), *ops, reps=reps)
    bytes_ = 2 * B * Hk * L * D + 4 * B * Hk * L
    print(f"decode-split{2 * ways} BK={BK:>5}: {t * 1e6:8.1f} us  "
          f"{bytes_ / t / 1e9:6.1f} GB/s(kv)", flush=True)
    return t
