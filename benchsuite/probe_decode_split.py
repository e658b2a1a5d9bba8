#!/usr/bin/env python
"""Production decode-kernel split-stream sweep (r4).

probe_dma_rate's decode prototype (whole-tile dots, no dynamic tail
masks) showed K/V even/odd operand splitting helps; the first production
adoption measured only ~nothing at 16K (1583 -> 1579 us scan).  This
probe isolates the production-vs-prototype deltas on the REAL
sageattn_decode path:

  - SAGE_DECODE_SPLIT in {0, 2, 4}  (concurrent K/V operand pairs)
  - SAGE_DECODE_BKI in {256, BK}    (inner sub-tile loop vs whole-tile dot)
  - block_k in {1024, 2048, 4096}

plus the raw prototype (run_decode_split) for the floor.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_decode_split.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sageattention_tpu.decode import kv_cache_init, sageattn_decode
from sageattention_tpu.utils.testing import time_fn

B, Hq, Hk, L, D = 8, 32, 8, 16384, 128


def main():
    r = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(r[0], (B, Hk, L, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, L, D), jnp.bfloat16)
    q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.bfloat16)
    cache = kv_cache_init(k, v, max_len=L)

    combos = [
        (0, 2048, 256),
        (2, 2048, 256),
        (2, 2048, 2048),
        (4, 2048, 2048),
        (4, 2048, 256),
        (2, 1024, 1024),
        (4, 1024, 1024),
        (8, 1024, 1024),
        (2, 4096, 4096),
        (0, 2048, 2048),
    ]
    for split, bk, bki in combos:
        os.environ["SAGE_DECODE_SPLIT"] = str(split)
        os.environ["SAGE_DECODE_BKI"] = str(bki)
        fn = jax.jit(lambda q, c, bk=bk: sageattn_decode(
            q, c, bucket=L, block_k=bk))
        t = time_fn(fn, q, cache, reps=50)
        nb = 2 * B * Hk * L * D
        print(f"split={split} BK={bk:>5} BKI={bki:>5}: "
              f"{t * 1e6:8.1f} us  {nb / t / 1e9:6.1f} GB/s(kv)",
              flush=True)


if __name__ == "__main__":
    main()
