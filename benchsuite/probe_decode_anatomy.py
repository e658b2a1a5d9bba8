#!/usr/bin/env python
"""Decode-attention anatomy: where the per-grid-step ~6 us goes.

The r4 decode probe showed the int8-cache decode kernel is NOT
bandwidth-bound (int8 and bf16-V caches take the same wall time despite a
1.5x byte difference; ~155 GB/s vs the chip's ~819).  This probe runs the
decode structure — (B, Hk, n_kv) grid, (TQ=32, D) folded-GQA q tile,
(BK, D) int8 K/V tiles — with components toggled:

  dma-only      load tiles, trivial reduce (the DMA/grid floor)
  dots-only     QK^T + PV dots, softmax ablated
  full          dots + online softmax + scales (the real body)

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_decode_anatomy.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sageattention_tpu.dispatch import default_interpret
from sageattention_tpu.utils.testing import time_fn

TQ = 32


def _kernel(q_ref, k_ref, ks_ref, v_ref, o_ref, acc_scr, m_scr, l_scr,
            *, n_kv: int, body: str):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        m_scr[...] = jnp.full_like(m_scr, -1e20)
        l_scr[...] = jnp.zeros_like(l_scr)

    k = k_ref[0, 0]
    v = v_ref[0, 0]
    if body == "dma":
        # touch every input tile cheaply (sublane-wise adds, no MXU)
        acc_scr[...] += (k[:TQ].astype(jnp.float32)
                         + v[:TQ].astype(jnp.float32))
    else:
        q = q_ref[0, 0]
        s = jax.lax.dot_general(q, k.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if body == "dots":
            p = s * 1e-9
        else:  # full online-softmax body (mirrors ops/paged_decode.py)
            s = s * ks_ref[0, 0]
            m_prev = m_scr[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - jnp.broadcast_to(m_next[:, :1], s.shape))
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1,
                                                      keepdims=True)
            acc_scr[...] *= jnp.broadcast_to(alpha[:, :1], acc_scr.shape)
            m_scr[...] = m_next
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] += pv

    @pl.when(j == n_kv - 1)
    def _():
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)


def probe(body, B=8, Hk=8, L=16384, D=128, BK=2048, reps=20):
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(r[0], (B, Hk, TQ, D), jnp.bfloat16)
    k = (jax.random.normal(r[1], (B, Hk, L, D)) * 30).astype(jnp.int8)
    v = (jax.random.normal(r[2], (B, Hk, L, D)) * 30).astype(jnp.int8)
    ks = jax.random.uniform(r[3], (B, Hk, 1, L), jnp.float32)
    n_kv = L // BK
    fn = pl.pallas_call(
        functools.partial(_kernel, n_kv=n_kv, body=body),
        grid=(B, Hk, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, 1, BK), lambda b, h, j: (b, h, 0, j)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hk, TQ, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TQ, D), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=default_interpret(),
    )
    t = time_fn(jax.jit(fn), q, k, ks, v, reps=reps)
    steps = B * Hk * n_kv
    gbs = (2 * B * Hk * L * D + 4 * B * Hk * L) / t / 1e9
    print(f"BK={BK:>5} {body:>5}: {t * 1e6:8.1f} us  "
          f"{t / steps * 1e6:6.2f} us/step  {gbs:6.1f} GB/s", flush=True)
    return t


def _kernel_t(q_ref, kt_ref, ks_ref, vt_ref, o_ref, acc_scr, m_scr, l_scr,
              *, n_kv: int, body: str):
    """Transposed-cache variant: K/V stored [B, Hk, D, L] so the KV block's
    MINOR dim is the long seq axis — contiguous DMA rows of BK bytes
    instead of D(=128).  The dots consume the layout directly:
    s = q (TQ,D) . kt (D,BK); pv = p (TQ,BK) .contract-BK. vt (D,BK)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        m_scr[...] = jnp.full_like(m_scr, -1e20)
        l_scr[...] = jnp.zeros_like(l_scr)

    kt = kt_ref[0, 0]
    vt = vt_ref[0, 0]
    if body == "dma":
        acc_scr[...] += (kt[:, :128].astype(jnp.float32).T[:TQ]
                         + vt[:, :128].astype(jnp.float32).T[:TQ])
    else:
        q = q_ref[0, 0]
        s = jax.lax.dot_general(q, kt.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if body == "dots":
            p = s * 1e-9
        else:
            s = s * ks_ref[0, 0]
            m_prev = m_scr[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - jnp.broadcast_to(m_next[:, :1], s.shape))
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1,
                                                      keepdims=True)
            acc_scr[...] *= jnp.broadcast_to(alpha[:, :1], acc_scr.shape)
            m_scr[...] = m_next
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16),
                                 vt.astype(jnp.bfloat16),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] += pv

    @pl.when(j == n_kv - 1)
    def _():
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)


def probe_t(body, B=8, Hk=8, L=16384, D=128, BK=2048, reps=20):
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(r[0], (B, Hk, TQ, D), jnp.bfloat16)
    kt = (jax.random.normal(r[1], (B, Hk, D, L)) * 30).astype(jnp.int8)
    vt = (jax.random.normal(r[2], (B, Hk, D, L)) * 30).astype(jnp.int8)
    ks = jax.random.uniform(r[3], (B, Hk, 1, L), jnp.float32)
    n_kv = L // BK
    fn = pl.pallas_call(
        functools.partial(_kernel_t, n_kv=n_kv, body=body),
        grid=(B, Hk, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, BK), lambda b, h, j: (b, h, 0, j)),
            pl.BlockSpec((1, 1, 1, BK), lambda b, h, j: (b, h, 0, j)),
            pl.BlockSpec((1, 1, D, BK), lambda b, h, j: (b, h, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hk, TQ, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TQ, D), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=default_interpret(),
    )
    t = time_fn(jax.jit(fn), q, kt, ks, vt, reps=reps)
    steps = B * Hk * n_kv
    gbs = (2 * B * Hk * L * D + 4 * B * Hk * L) / t / 1e9
    print(f"BK={BK:>5} {body:>5}T: {t * 1e6:8.1f} us  "
          f"{t / steps * 1e6:6.2f} us/step  {gbs:6.1f} GB/s", flush=True)
    return t


def _kernel_slot(q_ref, k_ref, ks_ref, v_ref, o_ref, *, body: str):
    """Per-grid-step SLOT outputs, no scratch, no output revisit — tests
    whether the accumulator + revisited-o pattern (which forces
    conservative pipelining, CLAUDE.md gotcha) is what caps the DMA rate.
    'dma': trivial touch; 'full': dots + per-step (pv, m, l) partials the
    host would lse-merge (the ring-merge identity over KV chunks)."""
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    if body == "dma":
        o_ref[0, 0, 0] = (k[:TQ].astype(jnp.float32)
                          + v[:TQ].astype(jnp.float32)).astype(o_ref.dtype)
    else:
        q = q_ref[0, 0]
        s = jax.lax.dot_general(q, k.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * ks_ref[0, 0]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - jnp.broadcast_to(m, s.shape))
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, 0, 0] = pv.astype(o_ref.dtype)


def probe_slot(body, B=8, Hk=8, L=16384, D=128, BK=2048, reps=20):
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(r[0], (B, Hk, TQ, D), jnp.bfloat16)
    k = (jax.random.normal(r[1], (B, Hk, L, D)) * 30).astype(jnp.int8)
    v = (jax.random.normal(r[2], (B, Hk, L, D)) * 30).astype(jnp.int8)
    ks = jax.random.uniform(r[3], (B, Hk, 1, L), jnp.float32)
    n_kv = L // BK
    fn = pl.pallas_call(
        functools.partial(_kernel_slot, body=body),
        grid=(B, Hk, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, 1, BK), lambda b, h, j: (b, h, 0, j)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TQ, D),
                               lambda b, h, j: (b, h, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hk, n_kv, TQ, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=default_interpret(),
    )
    t = time_fn(jax.jit(fn), q, k, ks, v, reps=reps)
    steps = B * Hk * n_kv
    gbs = (2 * B * Hk * L * D + 4 * B * Hk * L) / t / 1e9
    print(f"BK={BK:>5} {body:>5}S: {t * 1e6:8.1f} us  "
          f"{t / steps * 1e6:6.2f} us/step  {gbs:6.1f} GB/s", flush=True)
    return t


if __name__ == "__main__":
    if "--transposed" in sys.argv:
        runner = probe_t
    elif "--slot" in sys.argv:
        runner = probe_slot
    else:
        runner = probe
    bodies = ("dma", "full") if "--slot" in sys.argv else ("dma", "dots",
                                                           "full")
    for BK in (2048, 4096, 8192):
        for body in bodies:
            runner(body, BK=BK)


def _kernel_pack(q_ref, kp_ref, ks_ref, vp_ref, o_ref, acc_scr, m_scr, l_scr,
                 *, n_kv: int, body: str, pack: int):
    """Quad-token row packing: K/V stored [B, Hk, L/pack, pack*D] int8 —
    rows are pack*D bytes wide (DMA rate tracks row width), and the kernel
    consumes the TOKEN-INTERLEAVED tiles directly: slice g of the packed
    tile holds tokens {pack*r + g}, the online softmax is column-order
    invariant, and V packed identically keeps PV exact.  No relayout."""
    j = pl.program_id(2)
    D = q_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        m_scr[...] = jnp.full_like(m_scr, -1e20)
        l_scr[...] = jnp.zeros_like(l_scr)

    kp = kp_ref[0, 0]                      # (BK/pack, pack*D) int8
    vp = vp_ref[0, 0]
    if body == "dma":
        acc_scr[...] += (kp[:TQ, :D].astype(jnp.float32)
                         + vp[:TQ, :D].astype(jnp.float32))
        return
    q = q_ref[0, 0]
    parts = []
    for g in range(pack):
        kg = kp[:, g * D:(g + 1) * D].astype(jnp.bfloat16)
        parts.append(jax.lax.dot_general(
            q, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    s = jnp.concatenate(parts, axis=1)     # (TQ, BK) shuffled-token order
    if body == "dots":
        p = s * 1e-9
    else:
        s = s * ks_ref[0, 0]               # ks pre-shuffled to match
        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - jnp.broadcast_to(m_next[:, :1], s.shape))
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[...] *= jnp.broadcast_to(alpha[:, :1], acc_scr.shape)
        m_scr[...] = m_next
    n = s.shape[1] // pack
    pb = p.astype(jnp.bfloat16)
    pv = None
    for g in range(pack):
        vg = vp[:, g * D:(g + 1) * D].astype(jnp.bfloat16)
        d = jax.lax.dot_general(pb[:, g * n:(g + 1) * n], vg,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        pv = d if pv is None else pv + d
    acc_scr[...] += pv

    @pl.when(j == n_kv - 1)
    def _():
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)


def probe_pack(body, B=8, Hk=8, L=16384, D=128, BK=2048, pack=4, reps=20):
    r = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(r[0], (B, Hk, TQ, D), jnp.bfloat16)
    kp = (jax.random.normal(r[1], (B, Hk, L // pack, pack * D)) * 30
          ).astype(jnp.int8)
    vp = (jax.random.normal(r[2], (B, Hk, L // pack, pack * D)) * 30
          ).astype(jnp.int8)
    ks = jax.random.uniform(r[3], (B, Hk, 1, L), jnp.float32)
    n_kv = L // BK
    fn = pl.pallas_call(
        functools.partial(_kernel_pack, n_kv=n_kv, body=body, pack=pack),
        grid=(B, Hk, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, BK // pack, pack * D),
                         lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, 1, BK), lambda b, h, j: (b, h, 0, j)),
            pl.BlockSpec((1, 1, BK // pack, pack * D),
                         lambda b, h, j: (b, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, D), lambda b, h, j: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hk, TQ, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TQ, D), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32),
                        pltpu.VMEM((TQ, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=default_interpret(),
    )
    t = time_fn(jax.jit(fn), q, kp, ks, vp, reps=reps)
    steps = B * Hk * n_kv
    gbs = (2 * B * Hk * L * D + 4 * B * Hk * L) / t / 1e9
    print(f"BK={BK:>5} pack{pack} {body:>5}: {t * 1e6:8.1f} us  "
          f"{t / steps * 1e6:6.2f} us/step  {gbs:6.1f} GB/s", flush=True)
    return t
