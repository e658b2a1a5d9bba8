"""Attention-anatomy probes — where the cycles go on this TPU.

Committed experimental evidence for BASELINE.md's measured column.  Rather
than synthetic matmul/VPU loops (whose accumulator traffic dominates and
misrepresents the machine — first attempt at this file measured a "ceiling"
20x below the real kernel), these probes run the REAL attention structure —
same grid, same tiles, same accumulators as ops/attention.py — with one
component toggled at a time:

  flash-bf16      bf16 QK dot + online softmax + bf16 PV   (the baseline)
  int8-online     int8 QK dot + online softmax + bf16 PV
  int8-static     int8 QK dot + static-cap softmax + bf16 PV  (the flagship)
  int8-noexp      int8 QK dot + s*eps passthrough + bf16 PV  (softmax ablated)
  bf16-noexp      bf16 QK dot + s*eps passthrough + bf16 PV

From the differences:
  t(noexp) bf16 vs int8          -> realizable int8 MXU advantage at QK
  t(static) - t(noexp)           -> true cost of the static softmax
  t(online) - t(static)          -> cost of the running max + dependency
and the headline conclusion for the 2x target: the noexp-int8 number IS the
hardware ceiling for any int8-QK attention kernel on this chip — no softmax
restructuring can beat it.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_roofline.py
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.utils.testing import time_fn  # noqa: E402
from sageattention_tpu.dispatch import default_interpret  # noqa: E402


def _anatomy_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr, l_scr,
                    *, softmax: str, n_kv: int, cast_int4: bool = False,
                    causal: str = "off", BQ: int = 0, BK: int = 0):
    """Minimal flash-structured kernel: grid (BH, n_q, n_kv), flat tiles.
    ``softmax``: "online" | "static" | "none".  ``cast_int4``: cast int8
    Q/K to int4 before the dot (4-bit MXU rate probe).  ``causal``:
    "off" | "skip" (skip above-diagonal tiles — the pure structural
    ceiling) | "mask" (skip + the 3-phase diagonal iota/compare/select on
    straddling tiles — the real kernel's mask cost)."""
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        l_scr[...] = jnp.full_like(l_scr, 1.0 if softmax == "none" else 0.0)

    def body(diag_mask):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        if q.dtype == jnp.int8:
            if cast_int4:
                q = q.astype(jnp.int4)
                k = k.astype(jnp.int4)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32) * 1.7e-4
        else:
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * 0.02
        if diag_mask:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * BQ
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * BK
            s = jnp.where(cols <= rows, s, -1e30)

        if softmax == "none":
            p = s * 1e-9  # passthrough: dots + minimal epilogue only
        elif softmax == "static":
            p = jnp.exp2(s - 40.0)
            l_scr[...] = l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        else:  # online
            m_prev = l_scr[...]  # (BQ, 128) lane-replicated running max
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - jnp.broadcast_to(m_next[:, :1], s.shape))
            acc_scr[...] = acc_scr[...] * jnp.broadcast_to(
                alpha[:, :1], acc_scr.shape)
            l_scr[...] = m_next
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] + pv

    if causal == "off":
        body(False)
    else:
        first_kv, last_kv = j * BK, j * BK + BK - 1
        first_q, last_q = i * BQ, i * BQ + BQ - 1
        live = first_kv <= last_q
        if causal == "skip":
            pl.when(live)(lambda: body(False))
        else:  # 3-phase: full tiles maskless, straddlers masked
            full = last_kv <= first_q
            pl.when(jnp.logical_and(live, full))(lambda: body(False))
            pl.when(jnp.logical_and(live, jnp.logical_not(full)))(
                lambda: body(True))

    @pl.when(j == n_kv - 1)
    def _():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def probe_anatomy(qk_dtype="int8", softmax="static", BH=128, S=8192, D=128,
                  BQ=2048, BK=2048, reps=8, interpret=False, causal="off"):
    key = jax.random.PRNGKey(0)
    cast_int4 = qk_dtype == "int4"
    if cast_int4:
        qk_dtype = "int8"  # payloads ship int8, cast to int4 in-kernel
    if qk_dtype == "int8":
        q = (jax.random.normal(key, (BH, S, D)) * 30).astype(jnp.int8)
        k = (jax.random.normal(jax.random.PRNGKey(1), (BH, S, D)) * 30
             ).astype(jnp.int8)
    else:
        q = jax.random.normal(key, (BH, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (BH, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, S, D), jnp.bfloat16)

    def kv_im(b, i, j):
        if causal != "off":
            # static diagonal clamp: above-diagonal steps re-use the
            # resident block (no DMA), like ops/attention.py:652-669
            return (b, jnp.minimum(j, ((i + 1) * BQ - 1) // BK), 0)
        return (b, j, 0)

    fn = pl.pallas_call(
        functools.partial(_anatomy_kernel, softmax=softmax, n_kv=S // BK,
                          cast_int4=cast_int4, causal=causal, BQ=BQ, BK=BK),
        grid=(BH, S // BQ, S // BK),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, BK, D), kv_im),
            pl.BlockSpec((1, BK, D), kv_im),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32),
                        pltpu.VMEM((BQ, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    t = time_fn(jax.jit(fn), q, k, v, reps=reps)
    flops = 4.0 * BH * S * S * D / (2 if causal != "off" else 1)
    return flops / t / 1e12


def _packed_kernel(iq_ref, jk_ref, last_ref, q_ref, k_ref, v_ref, o_ref,
                   acc_scr, *, mask: bool, BQ: int, BK: int):
    """Causal skeleton on a COMPRESSED grid: every step is a live tile —
    (i, j) come from scalar-prefetch tables, dead above-diagonal steps
    simply don't exist.  Softmax ablated (ceiling row)."""
    s_id = pl.program_id(1)
    i = iq_ref[s_id]
    j = jk_ref[s_id]

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * 1.7e-4
    if mask:
        # only diagonal-straddling tiles pay the compare (3-phase analogue)
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * BQ
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * BK
        s = jnp.where(jnp.logical_or((j + 1) * BK - 1 <= i * BQ,
                                     cols <= rows), s, -1e30)
    p = s * 1e-9
    pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[...] += pv

    @pl.when(last_ref[s_id] == 1)
    def _():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def probe_causal_packed(BH=128, S=8192, D=128, BQ=1024, BK=1024, reps=8,
                        interpret=False, mask=True):
    import numpy as np
    key = jax.random.PRNGKey(0)
    q = (jax.random.normal(key, (BH, S, D)) * 30).astype(jnp.int8)
    k = (jax.random.normal(jax.random.PRNGKey(1), (BH, S, D)) * 30
         ).astype(jnp.int8)
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, S, D), jnp.bfloat16)

    iq, jk, last = [], [], []
    for i in range(S // BQ):
        hi = ((i + 1) * BQ - 1) // BK
        for j in range(hi + 1):
            iq.append(i)
            jk.append(j)
            last.append(1 if j == hi else 0)
    iq = jnp.asarray(np.array(iq, np.int32))
    jk = jnp.asarray(np.array(jk, np.int32))
    last = jnp.asarray(np.array(last, np.int32))
    n_steps = int(iq.shape[0])

    fn = pl.pallas_call(
        functools.partial(_packed_kernel, mask=mask, BQ=BQ, BK=BK),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(BH, n_steps),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda b, s, iq, jk, last: (b, iq[s], 0)),
                pl.BlockSpec((1, BK, D), lambda b, s, iq, jk, last: (b, jk[s], 0)),
                pl.BlockSpec((1, BK, D), lambda b, s, iq, jk, last: (b, jk[s], 0)),
            ],
            out_specs=pl.BlockSpec((1, BQ, D),
                                   lambda b, s, iq, jk, last: (b, iq[s], 0)),
            scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    t = time_fn(jax.jit(fn), iq, jk, last, q, k, v, reps=reps)
    return 2.0 * BH * S * S * D / t / 1e12  # TFLOPS-eff (causal /2)


def main():
    causal_only = "--causal-only" in sys.argv
    interp = default_interpret()
    rows = {}
    for label, qk, sm in [] if causal_only else [
        ("bf16-noexp", "bf16", "none"),
        ("int8-noexp", "int8", "none"),
        ("bf16-online (flash structure)", "bf16", "online"),
        ("int8-online", "int8", "online"),
        ("int8-static (flagship structure)", "int8", "static"),
        ("int4-noexp (4-bit MXU probe)", "int4", "none"),
    ]:
        tf = probe_anatomy(qk, sm, interpret=interp)
        rows[label] = round(tf, 1)
        print(f"  {label:34s} {tf:7.1f} TFLOPS", flush=True)

    # r4: causal skeleton ceiling (VERDICT r3 weak #1) — same diagonal
    # schedule as ops/attention.py (above-diagonal tiles skipped + DMA
    # clamped), softmax ablated.  "skip" is the pure structural ceiling
    # (tile-granularity diagonal waste only); "mask" adds the 3-phase
    # straddler iota/compare/select.  TFLOPS-eff (the causal /2 formula),
    # so the structural factor S/(S+BQ) shows directly.
    for BQ, BK in ((1024, 1024), (2048, 2048), (512, 1024), (1024, 2048)):
        for mode in ("skip", "mask"):
            tf = probe_anatomy("int8", "none", BQ=BQ, BK=BK, causal=mode,
                               interpret=interp)
            label = f"causal-{mode} noexp BQ{BQ} BK{BK}"
            rows[label] = round(tf, 1)
            print(f"  {label:34s} {tf:7.1f} TFLOPS-eff", flush=True)
    tf = probe_anatomy("int8", "static", BQ=1024, BK=1024, causal="mask",
                       interpret=interp)
    rows["causal-mask static BQ1024 (struct)"] = round(tf, 1)
    print(f"  {'causal-mask static BQ1024 (struct)':34s} {tf:7.1f} "
          f"TFLOPS-eff", flush=True)
    # compressed live-step grid: (i, j) from scalar-prefetch tables — dead
    # above-diagonal steps don't exist.  If this clears the skip rows, the
    # real kernel should adopt the packed schedule.
    for BQ, BK in ((1024, 1024), (2048, 2048), (1024, 2048), (512, 512)):
        for m in (False, True):
            tf = probe_causal_packed(BQ=BQ, BK=BK, mask=m, interpret=interp)
            label = f"causal-packed{'-mask' if m else ''} BQ{BQ} BK{BK}"
            rows[label] = round(tf, 1)
            print(f"  {label:34s} {tf:7.1f} TFLOPS-eff", flush=True)

    noexp = rows.get("int8-noexp", 0.0)
    static = rows.get("int8-static (flagship structure)", 0.0)
    print(f"\nint8 QK hardware ceiling (softmax ablated): {noexp} TFLOPS")
    print(f"softmax cost at static structure: "
          f"{noexp - static:+.1f} TFLOPS from ceiling")
    print(json.dumps({"anatomy_tflops": rows}))


if __name__ == "__main__":
    main()
