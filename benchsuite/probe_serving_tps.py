#!/usr/bin/env python
"""Serving end-to-end tokens/s headline (VERDICT r4 #5).

Composes the serving stack — radix prefix-cached admission
(`serving.PrefixCachingAllocator`), ragged paged int8 prefill, and
synchronized continuous-batching decode steps (append + paged attention in
one jitted step, scanned) — into one measured number: steady-state decoded
tokens/s for a mixed prompt-length batch sharing a system prefix, against

  - the XLA bf16 dense-cache baseline (what stock JAX serving would do:
    dynamic_update_slice append + masked softmax attention), and
  - the repo's own dense int8 cache (`decode.py`) as the paging-cost
    reference point.

Attention-scope on purpose: this is an attention library (the reference
ships no model executor either); both sides run the identical step
structure so the delta is the cache/attention stack alone.

Shapes: Llama-8B-class attention (Hq=32, Hk=8, hd=128), 8 slots with
prompts 512..16K sharing a 512-token system prefix, PAGE=256 (the vLLM
default-class sharing granularity), 64 decode steps under lax.scan (one
device round-trip per measurement, CLAUDE.md tunnel rule).

Run (TPU):  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_serving_tps.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.paged import (
    build_table, paged_prefill, paged_append, pages_bucket_for,
    sageattn_decode_paged)
from sageattention_tpu.serving import PrefixCachingAllocator
from sageattention_tpu import decode as dec
from sageattention_tpu.utils.testing import time_fn

PAGE = 256
STEPS = 64
Hq, Hk, D = 32, 8, 128
LENGTHS = [16384, 12288, 8192, 6144, 4096, 2048, 1024, 1024]
# Shared system prompt.  TWO serving-design rules priced by this probe:
# (1) the table WIDTH must leave room for the ways rounding (a width of
#     exactly pages_bucket collapses _select_ways to 1 stream — measured
#     4830 tok/s vs the multi-way/run configuration below);
# (2) the shared prefix should be a MULTIPLE of the 4-page run grain
#     (1024 tokens @page=256): a 2-page prefix shifts every row's quads
#     off alignment and the superpage-run predicate falls back.
PREFIX = 1024
if os.environ.get("SAGE_TPS_SMOKE"):  # tiny CPU smoke of the same flow
    STEPS, Hq, Hk = 3, 4, 2
    LENGTHS = [900, 700, 512, 300]


def main():
    B = len(LENGTHS)
    dev = jax.devices()[0].device_kind
    print(f"device: {dev}  B={B} Hq={Hq} Hk={Hk} hd={D} page={PAGE} "
          f"steps={STEPS}", flush=True)

    # -- admission: 8 prompts sharing the system prefix through the radix
    # trie; the first request publishes the prefix blocks, the other 7 hit.
    alloc = PrefixCachingAllocator(num_pages=280, page_size=PAGE)
    prefix_tokens = list(range(PREFIX))
    rows, hits = [], 0
    for i, L in enumerate(LENGTHS):
        tokens = prefix_tokens + [1000 + i * 100000 + t
                                  for t in range(L - PREFIX)]
        adm = alloc.admit(tokens)
        hits += adm.n_cached_pages
        # decode growth room: an aligned QUAD per slot — a single growth
        # page would break the row's run alignment the moment a sequence
        # crosses its page boundary (rule (2) above applies to growth too)
        row = list(adm.pages) + alloc._pool.reserve(4)
        alloc.commit(tokens, adm.pages)
        rows.append(row)
    width = -(-pages_bucket_for(np.asarray(LENGTHS) + STEPS, PAGE)
              // 16) * 16                     # ways-friendly table width
    table = build_table([r[:width] if len(r) >= width else r
                         for r in rows], max_pages=width)
    logical = sum(alloc.pages_for(L) for L in LENGTHS)
    physical = len({p for r in rows for p in r}) - B  # minus growth pages
    print(f"admission: {logical} logical pages -> {physical} physical "
          f"({hits} radix hits; prefix stored once)", flush=True)

    # -- ragged prefill into the pool
    s_pad = -(-max(LENGTHS) // PAGE) * PAGE
    r = jax.random.split(jax.random.PRNGKey(0), 2)
    k = jax.random.normal(r[0], (B, Hk, s_pad, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, s_pad, D), jnp.bfloat16)
    k = k.at[:, :, :PREFIX].set(k[0, :, :PREFIX])  # prefix really shared
    v = v.at[:, :, :PREFIX].set(v[0, :, :PREFIX])
    t0 = time.perf_counter()
    cache = paged_prefill(k, v, jnp.asarray(LENGTHS), table, num_pages=280)
    np.asarray(cache.lengths)
    t_prefill = time.perf_counter() - t0
    print(f"prefill {sum(LENGTHS)} tokens: {t_prefill:.2f}s "
          f"(incl. first-call compile)", flush=True)

    # -- steady-state decode: scan of [append -> paged decode] steps
    rs = jax.random.split(jax.random.PRNGKey(1), 3)
    qs = jax.random.normal(rs[0], (STEPS, B, Hq, 1, D), jnp.bfloat16)
    kn = jax.random.normal(rs[1], (STEPS, B, Hk, 1, D), jnp.bfloat16)
    vn = jax.random.normal(rs[2], (STEPS, B, Hk, 1, D), jnp.bfloat16)

    def paged_loop(cache, qs, kn, vn):
        def step(c, x):
            q1, k1, v1 = x
            c = paged_append(c, k1, v1)
            return c, sageattn_decode_paged(q1, c, pages_bucket=width)
        c, outs = jax.lax.scan(step, cache, (qs, kn, vn))
        return outs

    t_paged = time_fn(jax.jit(paged_loop), cache, qs, kn, vn, reps=3)
    tps_paged = B * STEPS / t_paged
    print(f"paged int8 decode:  {t_paged*1e3:8.1f} ms/{STEPS} steps = "
          f"{tps_paged:8.0f} tok/s", flush=True)

    # -- dense int8 cache (no paging) reference.  The dense cache is
    # single-length: without paging every slot pays the LONGEST prompt's
    # footprint and compute (the paging value proposition) — so this arm
    # runs all B slots at s_pad.
    L_max = s_pad + STEPS
    bucket = dec.decode_bucket(L_max)
    dcache = dec.kv_cache_init(k, v, max_len=bucket)

    def dense_loop(c, qs, kn, vn):
        def step(c, x):
            q1, k1, v1 = x
            c = dec.kv_cache_append(c, k1, v1)
            return c, dec.sageattn_decode(q1, c, bucket=bucket)
        c, outs = jax.lax.scan(step, c, (qs, kn, vn))
        return outs

    t_dense = time_fn(jax.jit(dense_loop), dcache, qs, kn, vn, reps=3)
    tps_dense = B * STEPS / t_dense
    print(f"dense int8 decode:  {t_dense*1e3:8.1f} ms/{STEPS} steps = "
          f"{tps_dense:8.0f} tok/s", flush=True)

    # -- XLA bf16 dense-cache baseline
    kb = jnp.zeros((B, Hk, L_max, D), jnp.bfloat16).at[:, :, :s_pad].set(k)
    vb = jnp.zeros((B, Hk, L_max, D), jnp.bfloat16).at[:, :, :s_pad].set(v)
    lens0 = jnp.asarray(LENGTHS, jnp.int32)

    def xla_loop(carry, qs, kn, vn):
        def step(carry, x):
            kc, vc, lens = carry
            q1, k1, v1 = x
            upd = (jnp.arange(L_max)[None, :] == lens[:, None]
                   )[:, None, :, None]                       # [B,1,L,1]
            kc = jnp.where(upd, k1, kc)
            vc = jnp.where(upd, v1, vc)
            lens = lens + 1
            G = Hq // Hk
            kk = jnp.repeat(kc, G, axis=1)
            vv = jnp.repeat(vc, G, axis=1)
            s = jnp.einsum("bhtd,bhsd->bhts", q1.astype(jnp.float32),
                           kk.astype(jnp.float32)) * (D ** -0.5)
            live = (jnp.arange(L_max)[None, :] < lens[:, None]
                    )[:, None, None, :]
            s = jnp.where(live, s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhts,bhsd->bhtd", p, vv.astype(jnp.float32))
            return (kc, vc, lens), o.astype(jnp.bfloat16)
        carry, outs = jax.lax.scan(step, carry, (qs, kn, vn))
        return outs

    t_xla = time_fn(jax.jit(xla_loop), (kb, vb, lens0), qs, kn, vn, reps=3)
    tps_xla = B * STEPS / t_xla
    print(f"XLA bf16 baseline:  {t_xla*1e3:8.1f} ms/{STEPS} steps = "
          f"{tps_xla:8.0f} tok/s", flush=True)

    print(json.dumps({
        "metric": (f"serving decode tokens/s (B{B} mixed 512-16K prompts, "
                   f"shared {PREFIX}-tok prefix, Hq{Hq}/Hk{Hk} hd{D}, "
                   f"paged int8 page={PAGE})"),
        "value": round(tps_paged, 0),
        "unit": "tok/s",
        "vs_baseline": round(t_xla / t_paged, 2),
        "baseline": "XLA bf16 dense-cache decode loop",
        "baseline_tok_s": round(tps_xla, 0),
        "dense_int8_tok_s": round(tps_dense, 0),
        "paged_vs_dense_int8": round(t_paged / t_dense, 3),
        "radix_hits_pages": hits,
        "physical_pages": physical,
        "logical_pages": logical,
    }), flush=True)


if __name__ == "__main__":
    main()
