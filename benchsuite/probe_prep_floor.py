#!/usr/bin/env python
"""Is the one-pass K/V prep at the HBM floor?  (r4, VERDICT item 7)

The e2e (quant-included) scope trails the kernel scope by ~6% at 8K, all of
it attributed to the single remaining K/V prep read.  One-pass prep already
does the information-theoretic minimum HBM traffic for exact global
(per-head-slice) stats: read each bf16 tensor once, write the int8 codes
once.  This probe pins whether the prep kernels run AT that floor or leave
slack on the table:

  copy-floor   a Pallas kernel with the SAME grid and block specs as the
               prep kernels ((1,1,S,D) head-slices over a (B,H) grid) whose
               body is only `astype(int8)` — the pure bf16-read + int8-write
               stream at prep's exact DMA granularity
  prep-K       prep_k_onepass_pallas(with_capmax=True)   (the flagship path)
  prep-V       prep_v_onepass_pallas
  xla-cast     jnp .astype(int8) of both tensors (XLA's own copy stream,
               sanity anchor for the Pallas floor)

If (prep-K + prep-V) ~= 2 * copy-floor, the e2e gap is structural: closing
it needs fewer bytes, not a better kernel.  Reference evidence-culture
parity: the reference likewise never re-reads the tensor it smooths
(`csrc/fused/fused.cu:64-198`).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_prep_floor.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sageattention_tpu.ops import quant_pallas as qp
from sageattention_tpu.utils.testing import time_fn

B, H, S, D = 4, 32, 8192, 128


def _cast_kernel(x_ref, o_ref):
    o_ref[0, 0] = x_ref[0, 0].astype(jnp.int8)


def copy_floor(x):
    io = pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0))
    return pl.pallas_call(
        _cast_kernel,
        grid=(B, H),
        in_specs=[io],
        out_specs=io,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x)


def main():
    r = jax.random.split(jax.random.PRNGKey(0), 2)
    k = jax.random.normal(r[0], (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, H, S, D), jnp.bfloat16)

    floor = jax.jit(lambda k, v: (copy_floor(k), copy_floor(v)))
    prep = jax.jit(lambda k, v: (
        qp.prep_k_onepass_pallas(k, S, with_capmax=True),
        qp.prep_v_onepass_pallas(v, S)))
    xla = jax.jit(lambda k, v: (k.astype(jnp.int8), v.astype(jnp.int8)))

    rows = [("copy-floor", floor), ("prep-KV", prep), ("xla-cast", xla)]
    for name, fn in rows:
        fn(k, v)  # compile
    # interleave A/B/C to ride out the +-10-15% tunnel noise
    acc = {name: [] for name, _ in rows}
    for _ in range(6):
        for name, fn in rows:
            acc[name].append(time_fn(fn, k, v, reps=20))
    bytes_stream = 2 * (B * H * S * D) * (2 + 1)  # bf16 in + int8 out, K and V
    res = {}
    for name, _ in rows:
        t = min(acc[name])
        res[name] = t
        print(f"{name:>10}: {t * 1e3:7.3f} ms   {bytes_stream / t / 1e9:6.1f} "
              f"GB/s", flush=True)
    over = res["prep-KV"] / res["copy-floor"]
    print(f"prep-KV / copy-floor = {over:.3f}x "
          f"({'AT the floor' if over < 1.08 else 'slack remains'})",
          flush=True)


if __name__ == "__main__":
    main()
