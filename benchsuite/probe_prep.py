#!/usr/bin/env python
"""Quantization-preamble anatomy: where do the e2e-scope milliseconds go?

Measurement method: this host's dispatch latency is ~2.2 ms per timed call
(measured: a bf16 copy takes 2.55 ms at S=4096 and 3.38 ms at 4x the data —
fixed overhead, with marginal HBM bandwidth ~820 GB/s, i.e. at spec).  Any
sub-2 ms kernel timed standalone reads as ~2.4 ms of pure overhead.  So
each prep kernel is timed MARGINALLY: run it over N distinct inputs inside
one jit and fit device-time = (t_N - t_1) / (N - 1).

Usage (TPU):
  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_prep.py
"""

import argparse
import functools
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sageattention_tpu.ops import quant_pallas as qp
from sageattention_tpu.utils.testing import time_fn


def marginal(fn, inputs, reps=10):
    """Device seconds per call of fn, dispatch overhead removed."""
    n = len(inputs)

    def many(xs):
        return [fn(x) for x in xs]

    t1 = time_fn(jax.jit(lambda xs: many(xs[:1])), inputs, reps=reps)
    tn = time_fn(jax.jit(many), inputs, reps=reps)
    return (tn - t1) / (n - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    B, H, S, D = 4, 32, args.seq, 128
    nbytes = B * H * S * D * 2
    keys = jax.random.split(jax.random.PRNGKey(0), args.n)
    xs = [jax.random.normal(k, (B, H, S, D), jnp.bfloat16) for k in keys]
    km = jnp.mean(xs[0].astype(jnp.float32), axis=2, keepdims=True)
    scale = jnp.full((B, H, 1, 1), 0.02, jnp.float32)
    vscale = jnp.full((B, H, 1, D), 0.02, jnp.float32)

    def row(name, fn, reads=1.0, writes=0.5):
        t = marginal(fn, xs)
        gb = nbytes * (reads + writes) / 1e9
        print(f"{name:<46} {t*1e3:>8.3f} ms  {gb/t:>7.1f} GB/s eff",
              flush=True)

    print(f"shape (B{B} H{H} S{S} D{D}), tensor {nbytes/1e6:.0f} MB bf16, "
          f"marginal over N={args.n}")
    row("copy-cast via xla (floor)", lambda x: x.astype(jnp.int8))
    row("channel_stats (mean+amax, 1 read)",
        functools.partial(qp.channel_stats_pallas, s_true=S),
        reads=1.0, writes=0.0)
    row("groupwise quant g=32 (Q pass)",
        lambda x: qp.quant_int8_groupwise_pallas(x, 32, fold=0.1))
    row("groupwise quant g=32 + norms",
        lambda x: qp.quant_int8_groupwise_pallas(x, 32, fold=0.1,
                                                 with_norm=True))
    row("fixed-scale quant scalar + sub (K pass)",
        lambda x: qp.quant_int8_fixed_pallas(x, scale, sub=km))
    row("fixed quant scalar + sub + norms (K pass)",
        lambda x: qp.quant_int8_fixed_pallas(x, scale, sub=km,
                                             with_norm=True))
    row("groupwise quant g=32 + capmax (static Q)",
        lambda x: qp.quant_int8_groupwise_pallas(x, 32, fold=0.1,
                                                 with_capmax=True, s_true=S))
    row("fixed quant scalar + sub + capmax (static K)",
        lambda x: qp.quant_int8_fixed_pallas(x, scale, sub=km,
                                             with_capmax=True, s_true=S))
    row("fixed-scale quant channel + sub (V pass)",
        lambda x: qp.quant_int8_fixed_pallas(x, vscale, sub=km))
    row("smooth_v repair (out.f32 + vm -> bf16)",
        lambda x: (x.astype(jnp.float32) + km).astype(jnp.bfloat16),
        reads=1.0, writes=1.0)


if __name__ == "__main__":
    main()
