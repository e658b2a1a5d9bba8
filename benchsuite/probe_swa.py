#!/usr/bin/env python
"""Sliding-window attention: measured cost vs dense causal.

The band is clamped at DMA + sub-tile + mask level, so wall-clock should
scale ~O(S*W) (plus the fixed quant prep): at S=16384 / W=1024 the band
covers ~1/8 of the causal triangle.  Also A/Bs the flash baseline with the
same window — the speedup RATIO vs own flash is the honest headline.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_swa.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sageattention_tpu.core import sageattn, flash_attention
from sageattention_tpu.utils.testing import time_fn


def run(S, W, B=4, H=32, D=128, reps=20):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in ks)
    fns = {
        "sage dense causal": jax.jit(functools.partial(
            sageattn, is_causal=True)),
        f"sage swa W={W}": jax.jit(functools.partial(
            sageattn, is_causal=True, sliding_window=W)),
        "flash dense causal": jax.jit(functools.partial(
            flash_attention, is_causal=True)),
        f"flash swa W={W}": jax.jit(functools.partial(
            flash_attention, is_causal=True, sliding_window=W)),
    }
    times = {}
    for name, fn in fns.items():
        fn(q, k, v)  # compile
    for _ in range(2):
        for name, fn in fns.items():
            times[name] = time_fn(fn, q, k, v, reps=reps)
    for name, t in times.items():
        print(f"S={S:>6} {name:>20}: {t * 1e3:8.2f} ms", flush=True)
    sd, sw = times["sage dense causal"], times[f"sage swa W={W}"]
    fd, fw = times["flash dense causal"], times[f"flash swa W={W}"]
    print(f"S={S:>6} W={W}: band/dense sage {sw / sd:.3f} "
          f"(ideal ~{min(1.0, 2 * W / S):.3f} + prep), "
          f"sage-swa/flash-swa {sw / fw:.3f}", flush=True)


if __name__ == "__main__":
    for S, W in ((8192, 1024), (16384, 1024), (16384, 4096)):
        run(S, W)
