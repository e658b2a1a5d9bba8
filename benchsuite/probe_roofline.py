"""Roofline probes — measured MXU / VPU ceilings for attention on this TPU.

Committed experimental evidence for BASELINE.md's measured column: what the
hardware can do for each component of a quantized attention kernel, and the
implied ceiling for the full kernel.  (Round-1 VERDICT required the 2x-vs-
flash target be either achieved or refuted by committed experiment; these
probes are that experiment.  The prose numbers in docs/PERF_NOTES.md round 1
came from ad-hoc versions of these kernels.)

Three probes, all Pallas kernels over VMEM-resident tiles so HBM traffic and
grid overhead are excluded:

1. ``probe_matmul``   — repeated MXU dots at attention tile shapes, bf16 vs
                        int8 (QK^T geometry: contract head_dim; PV geometry:
                        contract seq tile).
2. ``probe_vpu``      — repeated elementwise chains at S-tile shape: the
                        exp2 softmax body in its online / static / int8-
                        dequant variants, giving VPU element throughput.
3. ``roofline_model`` — combines 1+2 into per-mode ceilings:
                        t_elem = max(mxu_flops/elem / MXU_rate,
                                     vpu_ops/elem  / VPU_rate)
                        (perfect overlap assumption — the real kernel can
                        only be slower), printed against measured kernels.

Run:  python benchsuite/probe_roofline.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.utils.testing import time_fn  # noqa: E402
from sageattention_tpu.dispatch import default_interpret  # noqa: E402


def _matmul_kernel(a_ref, a2_ref, b_ref, o_ref, acc_ref, *, R, acc_t):
    """acc += dot(a or a2, b), R times; the a/a2 select depends on the loop
    index so the dot cannot be hoisted out of the loop."""

    def body(i, carry):
        av = jax.lax.select(i % 2 == 0, a_ref[...], a2_ref[...])
        acc_ref[...] += jax.lax.dot_general(
            av, b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t).astype(jnp.float32)
        return carry

    jax.lax.fori_loop(0, R, body, 0)
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def probe_matmul(M, K, N, dtype, R=64, reps=8, interpret=False):
    """TFLOPS of repeated (M,K)@(K,N) dots on VMEM-resident tiles."""
    kjn = jnp.int8 if dtype == "int8" else jnp.bfloat16
    acc_t = jnp.int32 if dtype == "int8" else jnp.float32
    key = jax.random.PRNGKey(0)
    if dtype == "int8":
        a = (jax.random.normal(key, (M, K)) * 30).astype(kjn)
        b = (jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 30).astype(kjn)
    else:
        a = jax.random.normal(key, (M, K), kjn)
        b = jax.random.normal(jax.random.PRNGKey(1), (K, N), kjn)
    a2 = a[::-1]

    fn = pl.pallas_call(
        functools.partial(_matmul_kernel, R=R, acc_t=acc_t),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    t = time_fn(jax.jit(fn), a, a2, b, reps=reps)
    return 2.0 * M * K * N * R / t / 1e12


def _vpu_kernel(x_ref, o_ref, *, R, chain):
    """Repeated softmax-body chains on a VMEM-resident f32 S-tile."""
    x = x_ref[...]
    rows, cols = x.shape

    def body(i, acc):
        s = x + acc * 1e-9  # loop-carried dependency prevents hoisting
        if chain == "exp2":
            p = jnp.exp2(s)
        elif chain == "softmax_online":
            # running-max flash body: max-reduce, sub, exp2, sum-reduce,
            # plus the rescale of a 128-wide accumulator slice
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - jnp.broadcast_to(m, s.shape))
            l = jnp.sum(p, axis=1, keepdims=True)
            p = p + jnp.broadcast_to(l * 1e-9, s.shape)
        elif chain == "softmax_static":
            # static-cap body: sub (constant row bound), exp2, sum-reduce
            p = jnp.exp2(s - 1.0)
            l = jnp.sum(p, axis=1, keepdims=True)
            p = p + jnp.broadcast_to(l * 1e-9, s.shape)
        elif chain == "dequant":
            # int32->f32 convert + row-scale multiply (int8-dot epilogue)
            p = s.astype(jnp.int32).astype(jnp.float32) * 1.0009
        else:
            raise ValueError(chain)
        return acc + p * 1e-9

    o_ref[...] = jax.lax.fori_loop(0, R, body, jnp.zeros_like(x))


def probe_vpu(rows, cols, chain, R=256, reps=8, interpret=False):
    """Giga-elements/s through one softmax-body pass."""
    x = jax.random.normal(jax.random.PRNGKey(2), (rows, cols), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(_vpu_kernel, R=R, chain=chain),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    t = time_fn(jax.jit(fn), x, reps=reps)
    return rows * cols * R / t / 1e9


def roofline_model(mxu, vpu, D=128):
    """Per-mode attention ceilings from component measurements.

    Per S-tile element the kernel does 2D MXU flops for QK^T + 2D for PV
    (= 4D total at the element's dot dtype mix) and one softmax-body pass.
    Assuming perfect MXU/VPU overlap (optimistic — real kernels also pay
    DMA, layout and grid overhead):

      t_elem  = max(qk_flops/MXU_qk + pv_flops/MXU_pv, 1/VPU_chain)
      ceiling = 4D / t_elem    [attention TFLOPS by the reference formula]
    """
    rows = []
    modes = [
        # (label, qk dtype, pv dtype, softmax chain)
        ("bf16 flash (online)", "bf16", "bf16", "softmax_online"),
        ("int8-dot QK + bf16 PV (online)", "int8", "bf16", "softmax_online"),
        ("int8-dot QK + bf16 PV (static)", "int8", "bf16", "softmax_static"),
        ("int8-dot QK + int8 PV (online+requant)", "int8", "int8",
         "softmax_online"),
    ]
    for label, qk, pv, chain in modes:
        t_mxu = 2 * D / (mxu[qk] * 1e12) + 2 * D / (mxu[pv if pv != "int8" else "int8"] * 1e12)
        t_vpu = 1.0 / (vpu[chain] * 1e9)
        if pv == "int8":
            t_vpu += 1.0 / (vpu["dequant"] * 1e9)  # P requant pass
        if qk == "int8":
            t_vpu += 1.0 / (vpu["dequant"] * 1e9)  # int32->f32 + scale pass
        t_elem = max(t_mxu, t_vpu)
        rows.append({
            "mode": label,
            "mxu_bound_tflops": round(4 * D / t_mxu / 1e12, 1),
            "vpu_bound_tflops": round(4 * D / t_vpu / 1e12, 1),
            "ceiling_tflops": round(4 * D / t_elem / 1e12, 1),
            "binding": "VPU" if t_vpu > t_mxu else "MXU",
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    interp = default_interpret()
    R_mm = 16 if args.quick else 64
    R_v = 32 if args.quick else 256

    print("== MXU probes (VMEM-resident repeated dots) ==")
    mxu = {}
    for dtype in ("bf16", "int8"):
        qk = probe_matmul(2048, 128, 2048, dtype, R=R_mm, interpret=interp)
        pv = probe_matmul(2048, 2048, 128, dtype, R=R_mm, interpret=interp)
        mxu[dtype] = max(qk, pv)
        print(f"  {dtype:5s} QK-geom (2048x128x2048): {qk:7.1f} TFLOPS   "
              f"PV-geom (2048x2048x128): {pv:7.1f} TFLOPS")

    print("== VPU probes (softmax-body chains, f32 (1024, 2048) tile) ==")
    vpu = {}
    for chain in ("exp2", "softmax_online", "softmax_static", "dequant"):
        vpu[chain] = probe_vpu(1024, 2048, chain, R=R_v, interpret=interp)
        print(f"  {chain:16s}: {vpu[chain]:7.1f} Gelem/s")

    print("== Roofline (perfect-overlap ceilings, hd=128) ==")
    model = roofline_model(mxu, vpu)
    for r in model:
        print(f"  {r['mode']:42s} ceiling {r['ceiling_tflops']:7.1f} TFLOPS "
              f"({r['binding']}-bound; MXU {r['mxu_bound_tflops']}, "
              f"VPU {r['vpu_bound_tflops']})")

    print(json.dumps({"mxu_tflops": {k: round(v, 1) for k, v in mxu.items()},
                      "vpu_gelems": {k: round(v, 1) for k, v in vpu.items()},
                      "roofline": model}))


if __name__ == "__main__":
    main()
