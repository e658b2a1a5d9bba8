#!/usr/bin/env python
"""A/B the r3 in-kernel Q quantization (fuse_q_quant) on the e2e scope.

The standalone Q-quant launch costs ~0.74 ms marginal at S=8192 B4 H32
(docs/PERF_NOTES.md prep anatomy); fusing it into the attention kernel
trades that for a bf16 (vs int8) Q read inside the kernel (+134 MB HBM at
the headline shape) plus per-row VPU quant work at j == 0 only.  This
probe interleaves the two variants (A/B/A/B) to beat the axon-tunnel
timing noise.

Usage:
  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_fuseqq.py [S ...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sageattention_tpu.bench_lib import attention_tflops
from sageattention_tpu.core import sageattn
from sageattention_tpu.utils.testing import time_fn


def run(S, causal=False, B=4, H=32, D=128, reps=10):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
    fns = {}
    for name, fuse in (("fuse", None), ("nofuse", False)):
        fns[name] = jax.jit(functools.partial(
            sageattn, is_causal=causal, fuse_q_quant=fuse))
        fns[name](q, k, v).block_until_ready()  # compile outside timing
    for _ in range(2):  # interleave
        for name, fn in fns.items():
            t = time_fn(fn, q, k, v, reps=reps)
            tf = attention_tflops(B, H, S, S, D, causal, t)
            print(f"S={S:>6} causal={int(causal)} {name:>7}: "
                  f"{t * 1e3:8.2f} ms {tf:7.1f} TFLOPS", flush=True)


if __name__ == "__main__":
    seqs = [int(a) for a in sys.argv[1:]] or [4096, 8192, 32768]
    for s in seqs:
        run(s)
    run(8192, causal=True)
