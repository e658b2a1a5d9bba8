#!/usr/bin/env python
"""Sliding-window BACKWARD: measured cost vs dense causal backward.

r3 threads the band through the backward kernels (masks + index-map
clamps, `ops/backward_pallas.py`), so dQ/dK/dV should scale ~O(S*W) like
the forward.  This probe times jax.grad through the public API — forward
+ backward together, the training step's real cost.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_swa_bwd.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sageattention_tpu.core import sageattn
from sageattention_tpu.utils.testing import time_fn


def run(S, W, B=4, H=32, D=128, reps=10):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in ks)

    def loss(fn):
        return jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))

    fns = {
        "grad dense causal": loss(functools.partial(sageattn, is_causal=True)),
        f"grad swa W={W}": loss(functools.partial(
            sageattn, is_causal=True, sliding_window=W)),
    }
    times = {}
    for name, fn in fns.items():
        jax.block_until_ready(fn(q, k, v))  # compile
    for _ in range(2):
        for name, fn in fns.items():
            times[name] = time_fn(fn, q, k, v, reps=reps)
    for name, t in times.items():
        print(f"S={S:>6} {name:>20}: {t * 1e3:8.2f} ms", flush=True)
    d, w = times["grad dense causal"], times[f"grad swa W={W}"]
    print(f"S={S:>6} W={W}: band/dense grad {w / d:.3f} "
          f"(ideal ~{min(1.0, 2 * W / S):.3f} + block granularity)",
          flush=True)


if __name__ == "__main__":
    for S, W in ((8192, 1024), (16384, 1024)):
        run(S, W)
