#!/usr/bin/env python
"""Independent ceiling anchor (VERDICT r4 weak #3): the anatomy ceiling in
BASELINE.md is self-measured (probe_roofline.py); cross-check it against
XLA's OWN matmul rates at attention-like tiles — a compiler-scheduled MXU
rate this repo's Pallas code cannot have biased.

  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_xla_anchor.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from sageattention_tpu.utils.testing import time_fn

print("device:", jax.devices()[0].device_kind, flush=True)
ks = jax.random.split(jax.random.PRNGKey(0), 2)

# Square peaks first (the real MXU-rate anchor: compute-bound), then the
# attention-tile-like thin contractions for context — those write O(S^2)
# f32 to HBM and are bandwidth-bound in XLA (the attention kernel keeps s
# in VMEM, which is exactly the advantage a fused kernel has).
for name, dt, pref in (("bf16", jnp.bfloat16, jnp.float32),
                       ("int8", jnp.int8, jnp.int32)):
    for BH, M, K, N in ((1, 8192, 8192, 8192),   # square peak
                        (4, 4096, 4096, 4096),   # square peak, batched
                        (16, 8192, 128, 8192),   # QK^T-like (bw-bound)
                        (16, 8192, 8192, 128)):  # PV-like (bw-bound)
        a = jax.random.normal(ks[0], (BH, M, K)).astype(jnp.bfloat16)
        b = jax.random.normal(ks[1], (BH, K, N)).astype(jnp.bfloat16)
        if dt == jnp.int8:
            a = jnp.clip(a * 30, -127, 127).astype(jnp.int8)
            b = jnp.clip(b * 30, -127, 127).astype(jnp.int8)
        fn = jax.jit(lambda x, y: jax.lax.dot_general(
            x, y, (((2,), (1,)), ((0,), (0,))), preferred_element_type=pref))
        t = time_fn(fn, a, b, reps=20)
        tops = 2 * BH * M * K * N / t / 1e12
        print(f"XLA {name} batched ({BH}x{M}x{K}x{N}): {tops:7.1f} "
              f"T{'OP' if dt==jnp.int8 else 'FLOP'}S", flush=True)
print("ANCHOR DONE", flush=True)
