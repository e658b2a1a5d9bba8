#!/usr/bin/env python
"""Continuous-batching serving loop on the paged int8 KV cache.

Demonstrates the full engine flow the reference (prefill-only) has no
counterpart for:

  1. ragged prefill — prompts of different lengths quantized into a shared
     page pool, two of them sharing a common prefix page (stored once);
  2. synchronized decode steps over all slots (`active` masks let finished
     slots idle inside the one jitted step);
  3. a sequence finishing: its pages are refcount-released on the host and
     a NEW request is admitted into the freed slot (`paged_insert`),
     reusing the physical pages — no pool rebuild, no other slot disturbed.

Everything device-side is a fixed-shape jitted step (TPU serving pattern);
page scheduling is host-side numpy (`PageAllocator`).

Run (TPU):  PYTHONPATH=/root/.axon_site:. python examples/paged_serving.py
Run (CPU):  python examples/paged_serving.py --steps 3   (interpret, slow)
"""

import argparse
import time

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.paged import (
    PageAllocator, build_table, paged_prefill, paged_append, paged_insert,
    pages_bucket_for, sageattn_decode_paged)

PAGE = 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--kv-heads", type=int, default=2)
    ap.add_argument("--head-dim", type=int, default=128)
    args = ap.parse_args()
    Hq, Hk, D = args.heads, args.kv_heads, args.head_dim

    # -- 1. four requests, ragged lengths; 0 and 1 share a prompt prefix --
    lengths = [700, 700, 390, 1100]
    s_pad = -(-max(lengths) // PAGE) * PAGE
    per_seq = s_pad // PAGE
    alloc = PageAllocator(num_pages=64, page_size=PAGE)
    rows = []
    shared = alloc.reserve(2)               # seqs 0/1's common first 2 pages
    rows.append(shared + alloc.reserve(per_seq - 2))
    rows.append(alloc.share(shared) + alloc.reserve(per_seq - 2))
    rows.append(alloc.reserve(per_seq))
    rows.append(alloc.reserve(per_seq))
    table = build_table(rows, max_pages=per_seq + 1)  # +1: decode growth room

    r = jax.random.split(jax.random.PRNGKey(0), 4)
    B = len(lengths)
    k = jax.random.normal(r[0], (B, Hk, s_pad, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, s_pad, D), jnp.bfloat16)
    # make the shared prefix actually identical
    k = k.at[1, :, :2 * PAGE].set(k[0, :, :2 * PAGE])
    v = v.at[1, :, :2 * PAGE].set(v[0, :, :2 * PAGE])

    t0 = time.perf_counter()
    cache = paged_prefill(k, v, jnp.asarray(lengths), table, num_pages=64)
    np.asarray(cache.lengths)  # sync
    n_phys = len({p for row in rows for p in row})
    print(f"prefill {sum(lengths)} tokens into {n_phys} physical pages "
          f"(prefix shared; {alloc.free_pages} free): "
          f"{time.perf_counter() - t0:.2f}s  "
          f"(pool {cache.num_pages}x{PAGE} pages)")

    # growth room: every slot needs a page for decode appends (reserved
    # as one page here for pool economy; latency-critical engines reserve
    # aligned QUADS so superpage runs survive growth — docs/SERVING.md)
    for b in range(B):
        if lengths[b] % PAGE == 0:
            rows[b] += alloc.reserve(1)
    table = build_table(rows, max_pages=per_seq + 1)
    cache = cache._replace(page_table=jnp.asarray(table))

    # -- 2. synchronized decode steps (one jitted step, active masks) --
    bucket = pages_bucket_for(np.asarray(lengths) + args.steps, PAGE)

    @jax.jit
    def decode_step(cache, q, k_new, v_new, active):
        cache = paged_append(cache, k_new, v_new, active=active)
        out = sageattn_decode_paged(q, cache, pages_bucket=bucket)
        return cache, out

    targets = np.array([l + args.steps for l in lengths])
    targets[2] = lengths[2] + max(1, args.steps // 4)  # seq 2 finishes early
    active = np.ones(B, bool)
    rk = jax.random.PRNGKey(1)
    admitted = False
    t0 = time.perf_counter()
    tokens_done = 0
    for step in range(args.steps):
        rk, k1, k2, k3 = jax.random.split(rk, 4)
        q = jax.random.normal(k1, (B, Hq, 1, D), jnp.bfloat16)
        kn = jax.random.normal(k2, (B, Hk, 1, D), jnp.bfloat16)
        vn = jax.random.normal(k3, (B, Hk, 1, D), jnp.bfloat16)
        cache, out = decode_step(cache, q, kn, vn, jnp.asarray(active))
        tokens_done += int(active.sum())
        cur = np.asarray(cache.lengths)
        newly_done = (cur >= targets) & active
        for b in np.nonzero(newly_done)[0]:
            active[b] = False
            # -- 3. release + admit a new request into the freed slot --
            if not admitted:
                alloc.release(rows[b])
                new_len = 500
                n_new = alloc.pages_for(new_len) + 1
                rows[b] = alloc.reserve(n_new)
                rk, ka, kb = jax.random.split(rk, 3)
                s_new = -(-new_len // PAGE) * PAGE
                k_new = jax.random.normal(ka, (Hk, s_new, D), jnp.bfloat16)
                v_new = jax.random.normal(kb, (Hk, s_new, D), jnp.bfloat16)
                cache = paged_insert(cache, int(b), k_new, v_new, new_len,
                                     rows[b])
                active[b] = True
                admitted = True
                print(f"step {step}: slot {b} finished -> released, "
                      f"admitted new 500-token request into it "
                      f"({alloc.free_pages} pages free)")
    np.asarray(cache.lengths)
    dt = time.perf_counter() - t0
    print(f"decoded {tokens_done} tokens over {args.steps} steps in "
          f"{dt:.2f}s = {tokens_done / dt:.0f} tok/s "
          f"(B={B} Hq={Hq} Hk={Hk} D={D}, int8 pool)")
    print("final lengths:", np.asarray(cache.lengths).tolist())


if __name__ == "__main__":
    main()
