#!/usr/bin/env python
"""Paged-decode page-size sweep: is the 1.3x paged-vs-dense residual the
page-granular DMA, and does a bigger page buy it back?

r4 found paged decode pays ~1.3x over the dense int8 cache at the vLLM-class
page=256 even with 16 packed ways; PERF_NOTES attributes the residual to
page-table indirection (64 separate 256-col DMA programs per 16K sequence vs
dense's 8 2048-col ones).  This sweep holds the PACKED logit width constant
(ways * page = 4096, the measured knee) and varies the page size, so the only
moving part is DMA program granularity.  A serving stack that can afford
page=512/1024 fragmentation trades allocator granularity for stream rate;
this probe prices that trade.

Usage:
  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_page_size.py [L ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.decode import kv_cache_init, sageattn_decode, decode_bucket
from sageattention_tpu.utils.testing import time_fn, calc_diff

PACK_W = 4096  # ways * page held constant (the r4 packed-ways knee)


def xla_ref(q, k, v):
    G = q.shape[1] // k.shape[1]
    k = jnp.repeat(k, G, axis=1)
    v = jnp.repeat(v, G, axis=1)
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (1.0 / np.sqrt(q.shape[-1]))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", p, v.astype(jnp.float32))


def run(L, B=None, Hq=32, Hk=8, D=128, reps=50):
    from sageattention_tpu.paged import (
        PageAllocator, build_table, paged_prefill, pages_bucket_for,
        sageattn_decode_paged)

    if B is None:
        B = 8 if L <= 16384 else (2 if L <= 65536 else 1)
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(r[0], (B, Hk, L, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, L, D), jnp.bfloat16)
    q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.bfloat16)
    ref = np.asarray(xla_ref(q, k, v), np.float32)

    bucket = decode_bucket(L)
    cache8 = kv_cache_init(k, v, max_len=bucket)
    t_dense = time_fn(jax.jit(lambda q, c: sageattn_decode(
        q, c, bucket=bucket)), q, cache8, reps=reps)
    print(f"L={L:>6} B={B} dense-int8       : {t_dense * 1e6:8.1f} us",
          flush=True)

    for page in (256, 512, 1024, 2048):
        if L % page:
            continue
        ways = max(1, PACK_W // page)
        os.environ["SAGE_PAGED_SPLIT"] = str(ways)
        s_pad = -(-L // page) * page
        per_seq = s_pad // page
        alloc = PageAllocator(B * per_seq, page)
        rng = np.random.RandomState(0)
        rows = []
        for _ in range(B):
            row = alloc.reserve(per_seq)
            rng.shuffle(row)  # fragmented-pool order: the realistic case
            rows.append(row)
        table = build_table(rows, max_pages=per_seq)
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - L), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - L), (0, 0)))
        cachep = paged_prefill(kp, vp, jnp.full((B,), L, jnp.int32), table,
                               num_pages=B * per_seq, page_size=page)
        del kp, vp
        pbucket = pages_bucket_for(cachep)
        fn = jax.jit(lambda q, c: sageattn_decode_paged(
            q, c, pages_bucket=pbucket))
        out = fn(q, cachep)
        d = calc_diff(np.asarray(out, np.float32), ref)
        t = time_fn(fn, q, cachep, reps=reps)
        print(f"L={L:>6} B={B} page={page:>4} w={ways:>2}: {t * 1e6:8.1f} us"
              f"  {t / t_dense:5.2f}x dense  diff={d:.2e}", flush=True)


if __name__ == "__main__":
    for s in [int(a) for a in sys.argv[1:]] or [16384, 131072]:
        run(s)
