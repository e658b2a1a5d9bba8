#!/usr/bin/env python
"""Decode-attention latency: int8 KV cache vs bf16 baselines.

Single-token decode streams the whole cache past one query row per step —
pure HBM bandwidth.  int8 K+V storage halves the stream; the GQA fold
(all G query heads per KV head share one Q tile) removes the G-fold
re-fetch a per-query-head grid would pay.  Compared against an XLA sdpa
decode on the bf16 cache (what a stock JAX serving stack does) and the
bf16-V cache mode.

Two timings per config:
  - wall: `time_fn` (50 queued calls, one sync) — what a host-driven
    serving loop pays per step, including dispatch.
  - scan: N steps inside ONE jit via `lax.scan` (distinct q per step so
    nothing is CSE'd) — the pure device step time, what a fused
    generation loop pays.

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

SCAN_N = 32


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


def scan_time(fn, q, *ops, reps=3):
    """Median seconds per decode step, measured as SCAN_N steps inside one
    jit (lax.scan over per-step q so steps can't be deduplicated).  The
    cache/KV operands are jit ARGUMENTS, not closure captures — captured
    arrays embed as HLO constants and blow the remote-compile tunnel's
    request-size limit."""
    qs = q[None] + jnp.arange(SCAN_N, dtype=jnp.bfloat16).reshape(
        SCAN_N, 1, 1, 1, 1) * jnp.bfloat16(1e-3)

    @jax.jit
    def loop(qs, *ops):
        def step(acc, qi):
            o = fn(qi, *ops)
            return acc + o.astype(jnp.float32).sum(), ()
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), qs)
        return acc

    t = time_fn(loop, qs, *ops, warmup=2, reps=reps)
    return t / SCAN_N


def run(L, B=None, Hq=32, Hk=8, D=128, reps=50, block_sweep=False):
    from sageattention_tpu.paged import (
        PageAllocator, build_table, paged_prefill, pages_bucket_for,
        sageattn_decode_paged)

    if B is None:  # keep total cache bytes bounded on one v5e
        B = 8 if L <= 16384 else (2 if L <= 65536 else 1)
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
    del kp, vp
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
    if block_sweep:
        for bk in (1024, 2048, 4096):
            if bucket % bk == 0:
                fns[f"int8-bk{bk}"] = jax.jit(
                    lambda q, c, bk=bk: sageattn_decode(
                        q, c, bucket=bucket, block_k=bk))
    args = {name: (q, cache8) for name in fns}
    args.update({"bf16V-cache": (q, cacheb), "paged-int8": (q, cachep),
                 "xla-bf16": (q, k, v)})
    # compile + accuracy outside timing
    for name, fn in fns.items():
        out = fn(*args[name])
        d = calc_diff(np.asarray(out, np.float32), ref)
        print(f"L={L:>6} B={B} {name:>12} diff={d:.2e}", flush=True)
    kv_bytes = {  # per-step K+V stream (the bound)
        "bf16V-cache": 3 * B * Hk * L * D,
        "xla-bf16": 4 * B * Hk * L * D,
    }
    for _ in range(2):  # interleave
        for name, fn in fns.items():
            t = time_fn(fn, *args[name], reps=reps)
            nb = kv_bytes.get(name, 2 * B * Hk * L * D)
            print(f"L={L:>6} B={B} {name:>12}: wall {t * 1e6:9.1f} us  "
                  f"{nb / t / 1e9:6.1f} GB/s(kv)", flush=True)
    for name, fn in fns.items():
        ts = scan_time(fn, q, *args[name][1:])
        nb = kv_bytes.get(name, 2 * B * Hk * L * D)
        print(f"L={L:>6} B={B} {name:>12}: scan {ts * 1e6:9.1f} us  "
              f"{nb / ts / 1e9:6.1f} GB/s(kv)", flush=True)


if __name__ == "__main__":
    seqs = [int(a) for a in sys.argv[1:]] or [4096, 16384, 65536]
    sweep = os.environ.get("SAGE_BK_SWEEP", "0") == "1"
    for s in seqs:
        run(s, block_sweep=sweep)
