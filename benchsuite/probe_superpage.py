#!/usr/bin/env python
"""Superpage runs: is the page-256 paged-decode tax DMA-PROGRAM COUNT?

r4's page-size sweep (probe_page_size.py) showed page=256 pays 1.29-1.37x
over the dense int8 cache while page=1024 reaches dense parity with the
packed width held constant — attributing the residual to DMA program
granularity (64 separate 256-col programs per 16K sequence vs 16 1024-col
ones).  This probe tests the fix that keeps 256-token SHARING granularity:
fetch R physically-consecutive, R-aligned pages per DMA block
((R,1,page,D) — a regular strided slice of the pool, no relayout), so the
program count drops R-fold while the table, the allocator, and prefix
sharing all stay at page=256.

Pool layout here is CONTIGUOUS (fresh pools and the run-aware allocators
give aligned ascending runs — the prefix-cached-serving common case);
production falls back to the per-page kernel via sageattn_decode_paged's
batch-level lax.cond when the traced table fragments.

Usage:
  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_superpage.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.decode import kv_cache_init, sageattn_decode, decode_bucket
from sageattention_tpu.ops.paged_decode import paged_decode_call
from sageattention_tpu.paged import build_table, paged_prefill
from sageattention_tpu.utils.testing import time_fn, calc_diff

PAGE = 256
LOG2E = 1.4426950408889634


def run(L, B=None, Hq=32, Hk=8, D=128, reps=50):
    if B is None:
        B = 8 if L <= 16384 else 1
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(r[0], (B, Hk, L, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, L, D), jnp.bfloat16)
    q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.bfloat16)

    bucket = decode_bucket(L)
    cache8 = kv_cache_init(k, v, max_len=bucket)
    t_dense = time_fn(jax.jit(lambda q, c: sageattn_decode(
        q, c, bucket=bucket)), q, cache8, reps=reps)
    print(f"L={L:>6} B={B} dense-int8        : {t_dense*1e6:8.1f} us",
          flush=True)

    per_seq = L // PAGE
    # contiguous ascending rows (fresh-pool order)
    rows = [list(range(b * per_seq, (b + 1) * per_seq)) for b in range(B)]
    table = build_table(rows, max_pages=per_seq)
    cachep = paged_prefill(k, v, jnp.full((B,), L, jnp.int32), table,
                           num_pages=B * per_seq, page_size=PAGE)
    lengths = jnp.full((B,), L, jnp.int32)
    table_eff = cachep.page_table

    # GQA fold like sageattn_decode_paged: rows = G q-heads per kv head
    G = Hq // Hk
    qt = jnp.zeros((B, Hk, 32, D), jnp.bfloat16).at[:, :, :G].set(
        q.reshape(B, Hk, G, D))
    qt = qt * (D ** -0.5) * LOG2E

    # shuffled table for the fragmented mixed-mode case
    rng = np.random.RandomState(0)
    rows_sh = [list(np.array(r)[rng.permutation(per_seq)]) for r in rows]
    table_sh = jnp.asarray(build_table(rows_sh, max_pages=per_seq),
                           jnp.int32)

    for ways, R, mixed in ((16, 1, False), (16, 2, False), (16, 4, False),
                           (16, 8, False), (16, 16, False),
                           (32, 8, False), (32, 16, False),
                           (16, 4, True), (16, 8, True)):
        if per_seq % ways:
            continue

        # pools must be jit ARGUMENTS: closed-over they become inline HLO
        # constants and the remote_compile request blows its size limit
        # (HTTP 413)
        def call(qq, kp_, ksp_, vp_, vs_, vm_, tt, ll, _w=ways, _r=R,
                 _m=mixed):
            return paged_decode_call(
                qq, kp_, ksp_, vp_, vs_, vm_, tt, ll,
                n_pages=per_seq, window=1, ways=_w, run_len=_r,
                mixed_runs=_m)

        fn = jax.jit(call)
        args = (qt, cachep.k8_pool, cachep.ks_pool, cachep.v_pool,
                cachep.v_scale, cachep.v_mean)
        out = fn(*args, table_eff, lengths)
        t = time_fn(fn, *args, table_eff, lengths, reps=reps)
        tag = "mixed" if mixed else "pure "
        print(f"  page=256 ways={ways:>2} R={R:>2} {tag} contig: "
              f"{t*1e6:8.1f} us  ({t/t_dense:5.2f}x dense)", flush=True)
        if mixed:
            t2 = time_fn(fn, *args, table_sh, lengths, reps=reps)
            print(f"  page=256 ways={ways:>2} R={R:>2} {tag} shuffl: "
                  f"{t2*1e6:8.1f} us  ({t2/t_dense:5.2f}x dense)",
                  flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for L in (16384, 131072):
        run(L)
    print("SUPERPAGE PROBE DONE", flush=True)
