#!/usr/bin/env python
"""Serving-feature latency: SWA/sinks paged decode, T=gamma verify windows,
continuous-batching steps, and an end-to-end LlamaLM tokens/step number.

Completes the r4 measurement story started by probe_decode.py (raw cache
kernels): these are the FEATURE paths docs/SERVING.md describes.

  swa-decode      paged decode with sliding_window W (+sinks): the page
                  stream is O(W), so the step must be ~flat in cache length
  verify-T        dense-cache decode with a T=gamma window (speculative
                  verify): amortization of the KV stream over gamma rows
  cb-step         one continuous-batching step (ragged paged_append with an
                  inactive slot + paged decode) jitted as one program
  llm-decode      tokens/step through LlamaLM (model matmuls + cache attn)

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_serving.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.decode import kv_cache_init, sageattn_decode, decode_bucket
from sageattention_tpu.paged import (PageAllocator, build_table, paged_append,
                                     paged_prefill, pages_bucket_for,
                                     sageattn_decode_paged)
from sageattention_tpu.utils.testing import time_fn

B, Hq, Hk, D, PAGE = 8, 32, 8, 128, 256


def mk_paged(L, num_extra_pages=16, nb=None):
    nb = nb or B
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(r[0], (nb, Hk, L, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (nb, Hk, L, D), jnp.bfloat16)
    q = jax.random.normal(r[2], (nb, Hq, 1, D), jnp.bfloat16)
    per_seq = L // PAGE
    alloc = PageAllocator(nb * per_seq + num_extra_pages, PAGE)
    rows = [alloc.reserve(per_seq + num_extra_pages // nb) for _ in range(nb)]
    table = build_table(rows, max_pages=per_seq + num_extra_pages // nb)
    cache = paged_prefill(k, v, jnp.full((nb,), L, jnp.int32), table,
                          num_pages=nb * per_seq + num_extra_pages)
    return q, cache


def swa_rows():
    for L in (16384, 65536):
        q, cache = mk_paged(L, nb=8 if L <= 16384 else 2)
        pb = pages_bucket_for(cache)
        full = jax.jit(lambda q, c: sageattn_decode_paged(
            q, c, pages_bucket=pb))
        swa = jax.jit(lambda q, c: sageattn_decode_paged(
            q, c, sliding_window=1024))
        sink = jax.jit(lambda q, c: sageattn_decode_paged(
            q, c, sliding_window=1024, attention_sinks=16))
        for name, fn in (("paged-full", full), ("paged-swa W=1024", swa),
                         ("paged-swa+sinks", sink)):
            fn(q, cache)
            t = time_fn(fn, q, cache, reps=50)
            print(f"L={L:>6} {name:>18}: {t * 1e6:8.1f} us", flush=True)
        del cache


def verify_rows():
    L = 16384
    r = jax.random.split(jax.random.PRNGKey(1), 3)
    k = jax.random.normal(r[0], (B, Hk, L, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, L, D), jnp.bfloat16)
    bucket = decode_bucket(L)
    cache = kv_cache_init(k, v, max_len=bucket)
    for T in (1, 4, 8):
        q = jax.random.normal(r[2], (B, Hq, T, D), jnp.bfloat16)
        fn = jax.jit(lambda q, c: sageattn_decode(q, c, bucket=bucket))
        fn(q, cache)
        t = time_fn(fn, q, cache, reps=50)
        print(f"L={L:>6} verify T={T}: {t * 1e6:8.1f} us "
              f"({t / T * 1e6:7.1f} us/token)", flush=True)
    del cache


def cb_step_row():
    L = 16384
    q, cache = mk_paged(L)
    r = jax.random.split(jax.random.PRNGKey(2), 2)
    k1 = jax.random.normal(r[0], (B, Hk, 1, D), jnp.bfloat16)
    v1 = jax.random.normal(r[1], (B, Hk, 1, D), jnp.bfloat16)
    active = jnp.asarray([True] * (B - 2) + [False, False])
    pb = pages_bucket_for(cache)

    @jax.jit
    def step(q, c, k1, v1):
        c = paged_append(c, k1, v1, active=active)
        return sageattn_decode_paged(q, c, pages_bucket=pb), c

    out, c2 = step(q, cache, k1, v1)
    t = time_fn(lambda q, c, k1, v1: step(q, c, k1, v1)[0],
                q, cache, k1, v1, reps=50)
    print(f"L={L:>6} cb-step (append+decode, 2 idle slots): "
          f"{t * 1e6:8.1f} us", flush=True)
    del cache


def llm_decode_row():
    from sageattention_tpu.models.llm import LlamaConfig, LlamaLM

    cfg = LlamaConfig(hidden=2048, heads=16, kv_heads=4, depth=8,
                      vocab=32000)
    model = LlamaLM(cfg)
    S0, STEPS = 1024, 32
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, S0), 0, cfg.vocab)
    params = model.init(jax.random.PRNGKey(4), tokens[:, :128])
    logits, caches = model.apply(params, tokens, max_len=S0 + STEPS + 32)
    nxt = jnp.argmax(logits[:, -1:], axis=-1)

    @jax.jit
    def step(params, tok, caches, pos):
        logits, caches = model.apply(params, tok, caches=caches, pos=pos)
        return jnp.argmax(logits[:, -1:], axis=-1), caches

    nxt, caches = step(params, nxt, caches, jnp.asarray(S0, jnp.int32))
    np.asarray(nxt[0, 0])  # sync
    t0 = time.perf_counter()
    for i in range(STEPS):
        nxt, caches = step(params, nxt, caches,
                           jnp.asarray(S0 + 1 + i, jnp.int32))
    np.asarray(nxt[0, 0])
    dt = (time.perf_counter() - t0) / STEPS
    toks = 4 / dt
    print(f"llm-decode 0.5B-class (h2048 d8 GQA4, B=4, ctx {S0}): "
          f"{dt * 1e3:.2f} ms/step = {toks:.0f} tok/s", flush=True)


if __name__ == "__main__":
    swa_rows()
    verify_rows()
    cb_step_row()
    llm_decode_row()
