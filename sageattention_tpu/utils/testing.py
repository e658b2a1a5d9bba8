"""Accuracy metrics and timing harness.

The reference measures kernel accuracy with ``calc_diff`` = 1 - cosine
similarity (`/root/reference/bench/utils.py:140-144`) and times kernels with
CUDA events after an L2 flush (`bench/utils.py:7-33`).  The TPU equivalents:

- ``calc_diff``: identical formula, computed in float64 on host.
- ``time_fn``: wall-clock timing that forces a device->host sync.  On this
  environment ``block_until_ready`` alone does not guarantee the work is
  done (remote-tunnel platforms), so we always fetch a scalar reduction of
  the output to the host as the sync point.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def calc_diff(x, y) -> float:
    """1 - cosine similarity, in float64 — matches bench/utils.py:140-144."""
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    denom = (x * x + y * y).sum()
    if denom == 0:
        return 0.0
    sim = 2.0 * float((x * y).sum()) / float(denom)
    return 1.0 - sim


def cosine_sim(x, y) -> float:
    return 1.0 - calc_diff(x, y)


def _sync(out):
    """Force completion by pulling a scalar to the host."""
    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:
        return
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


def time_fn(fn, *args, warmup: int = 3, reps: int = 20) -> float:
    """Median wall-clock seconds per call of ``fn(*args)``.

    Queues ``reps`` calls back-to-back and host-syncs once, amortizing
    dispatch latency (the device executes sequentially), repeated over
    several trials — the TPU analogue of the reference's CUDA-event loop
    (`/root/reference/bench/utils.py:7-33`).
    """
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        trials.append((time.perf_counter() - t0) / reps)
    return float(np.median(trials))


def attention_tflops(batch, heads, seq_q, seq_k, head_dim, causal: bool, seconds: float) -> float:
    """Reference TFLOPS formula: 4*H*B*D*Sq*Sk/(2 if causal) / time
    (`/root/reference/bench/bench_qk_int8_pv_fp16_cuda.py:39`)."""
    flops = 4.0 * heads * batch * head_dim * seq_q * seq_k
    if causal:
        flops /= 2
    return flops / seconds / 1e12
