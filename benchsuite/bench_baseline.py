#!/usr/bin/env python
"""Baseline comparisons — reference `bench/bench_baseline.py` equivalent.

Times the attention implementations a TPU user would otherwise reach for:
stock Pallas flash attention (default + tuned blocks) and
jax.nn.dot_product_attention (XLA; materializes the score matrix).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sageattention_tpu.bench_lib import bench_stock_flash
from sageattention_tpu.utils.testing import attention_tflops, time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--seqs", type=int, nargs="+", default=[1024, 2048, 4096, 8192])
    args = ap.parse_args()
    B, H, D = args.batch, args.heads, args.head_dim

    for S in args.seqs:
        t, tf = bench_stock_flash(B=B, H=H, S=S, D=D)
        print(f"S={S:>6} stock pallas flash (tuned): {t*1e3:8.2f} ms {tf:7.1f} TFLOPS",
              flush=True)
        try:
            ks = jax.random.split(jax.random.PRNGKey(0), 3)
            q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.bfloat16) for kk in ks)
            f = jax.jit(jax.nn.dot_product_attention)
            t = time_fn(f, q, k, v, reps=5)
            print(f"S={S:>6} jax.nn.dot_product_attention: {t*1e3:8.2f} ms "
                  f"{attention_tflops(B, H, S, S, D, False, t):7.1f} TFLOPS", flush=True)
        except Exception as e:
            print(f"S={S:>6} jax.nn.dot_product_attention: FAILED "
                  f"({type(e).__name__}: {str(e)[:60]})", flush=True)


if __name__ == "__main__":
    main()
