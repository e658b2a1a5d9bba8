#!/usr/bin/env python
"""Ragged-batch prefill (continuous-batching serving shape) with
``sageattn_varlen`` — the workload the reference's varlen API serves
(`/root/reference/sageattention/core.py:334-448`: packed qkv +
cu_seqlens, one kernel launch for the whole ragged batch).

Packs a batch of prompts of very different lengths into one buffer,
runs causal prefill attention over the pack, and checks each sequence
against the dense per-sequence oracle.  With matching q/k packings the
static (flagship) softmax engages automatically (varlen.py) — measured
1.19x over the online softmax at 16K packs on v5e.

Run:  PYTHONPATH=/root/.axon_site:. python examples/varlen_serving.py
CPU:  PYTHONPATH= JAX_PLATFORMS=cpu python examples/varlen_serving.py --tiny
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sageattention_tpu as sa
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff, time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    args = ap.parse_args()

    # a realistic continuous-batching mix: a long document, mid-size chats,
    # short queries
    lengths = [300, 1100, 2900] if args.tiny else [11000, 3000, 1500, 900, 600]
    H, D = args.heads, args.head_dim
    T = sum(lengths)
    cu = jnp.array(np.cumsum([0] + lengths), jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (T, H, D), jnp.bfloat16) for kk in ks)

    # one cu argument used for BOTH q and k inside the trace: the causal
    # guard verifies packing equality by array identity, which two
    # separate jit parameters (distinct tracers) cannot satisfy
    mq = max(lengths)
    fn = jax.jit(lambda q_, k_, v_, cu_: sa.sageattn_varlen(
        q_, k_, v_, cu_, cu_, mq, mq, is_causal=True))
    out = fn(q, k, v, cu)

    worst = 0.0
    for i, L in enumerate(lengths):
        a, b = int(cu[i]), int(cu[i + 1])
        ref = sdpa(q[None, a:b].swapaxes(1, 2), k[None, a:b].swapaxes(1, 2),
                   v[None, a:b].swapaxes(1, 2), is_causal=True)
        d = float(calc_diff(out[a:b], ref[0].swapaxes(0, 1)))
        worst = max(worst, d)
        print(f"seq {i} len {L:>6}: 1-cossim vs dense oracle {d:.2e}")
    print(f"worst {worst:.2e} ({'OK' if worst < 1e-3 else 'FAIL'})")

    t = time_fn(fn, q, k, v, cu, reps=10)
    toks = T / t
    print(f"prefill pack of {len(lengths)} seqs, {T} tokens: "
          f"{t*1e3:.2f} ms ({toks/1e6:.2f} M tokens/s attention-only)")
    return 0 if worst < 1e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
