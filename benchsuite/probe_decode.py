#!/usr/bin/env python
"""Decode-attention latency: int8 KV cache vs bf16 baselines.

Single-token decode streams the whole cache past one query row per step —
pure HBM bandwidth.  int8 K+V storage halves the stream; the GQA fold
(all G query heads per KV head share one Q tile) removes the G-fold
re-fetch a per-query-head grid would pay.  Compared against an XLA sdpa
decode on the bf16 cache (what a stock JAX serving stack does) and the
bf16-V cache mode.

Usage:
  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_decode.py [L ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.decode import kv_cache_init, sageattn_decode, decode_bucket
from sageattention_tpu.utils.testing import time_fn, calc_diff


def xla_decode(q, k, v):
    """Stock bf16 decode: one-row sdpa over the full cache (XLA fuses this
    into a bandwidth-bound matvec chain — the fair non-quantized baseline)."""
    G = q.shape[1] // k.shape[1]
    k = jnp.repeat(k, G, axis=1)
    v = jnp.repeat(v, G, axis=1)
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (1.0 / np.sqrt(q.shape[-1]))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v.astype(jnp.float32)
                      ).astype(jnp.bfloat16)


def run(L, B=8, Hq=32, Hk=8, D=128, reps=50):
    from sageattention_tpu.paged import (
        PageAllocator, build_table, paged_prefill, pages_bucket_for,
        sageattn_decode_paged)

    r = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(r[0], (B, Hk, L, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, L, D), jnp.bfloat16)
    q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.bfloat16)
    bucket = decode_bucket(L)
    cache8 = kv_cache_init(k, v, max_len=bucket)
    cacheb = kv_cache_init(k, v, max_len=bucket, v_quant=False)
    # paged pool at the same geometry (page 256, shuffled physical order —
    # the realistic fragmented-pool case)
    PAGE = 256
    s_pad = -(-L // PAGE) * PAGE
    per_seq = s_pad // PAGE
    alloc = PageAllocator(B * per_seq, PAGE)
    rng = np.random.RandomState(0)
    rows = []
    for _ in range(B):
        row = alloc.reserve(per_seq)
        rng.shuffle(row)
        rows.append(row)
    table = build_table(rows, max_pages=per_seq)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - L), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - L), (0, 0)))
    cachep = paged_prefill(kp, vp, jnp.full((B,), L, jnp.int32), table,
                           num_pages=B * per_seq)
    pbucket = pages_bucket_for(cachep)
    ref = np.asarray(xla_decode(q, k, v), np.float32)

    fns = {
        "int8-cache": jax.jit(lambda q, c: sageattn_decode(
            q, c, bucket=bucket)),
        "bf16V-cache": jax.jit(lambda q, c: sageattn_decode(
            q, c, bucket=bucket)),
        "paged-int8": jax.jit(lambda q, c: sageattn_decode_paged(
            q, c, pages_bucket=pbucket)),
        "xla-bf16": jax.jit(xla_decode),
    }
    args = {"int8-cache": (q, cache8), "bf16V-cache": (q, cacheb),
            "paged-int8": (q, cachep), "xla-bf16": (q, k, v)}
    # compile + accuracy outside timing
    for name, fn in fns.items():
        out = fn(*args[name])
        d = calc_diff(np.asarray(out, np.float32), ref)
        print(f"L={L:>6} {name:>12} diff={d:.2e}", flush=True)
    kv_bytes = {  # per-step K+V stream (the bound)
        "int8-cache": 2 * B * Hk * L * D,
        "bf16V-cache": 3 * B * Hk * L * D,
        "paged-int8": 2 * B * Hk * L * D,
        "xla-bf16": 4 * B * Hk * L * D,
    }
    for _ in range(2):  # interleave
        for name, fn in fns.items():
            t = time_fn(fn, *args[name], reps=reps)
            gbs = kv_bytes[name] / t / 1e9
            print(f"L={L:>6} {name:>12}: {t * 1e6:9.1f} us  "
                  f"{gbs:6.1f} GB/s(kv)", flush=True)


if __name__ == "__main__":
    seqs = [int(a) for a in sys.argv[1:]] or [4096, 16384, 32768]
    for s in seqs:
        run(s)
