#!/usr/bin/env python
"""Headline benchmark: quantized SageAttention vs the FP16/bf16 Pallas flash
baseline (the reference's own comparison, `/root/reference/bench/`).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology mirrors the reference (BASELINE.md): TFLOPS = 4*H*B*D*S^2 / t,
B=4 H=32, kernel scope excludes quantization preprocessing, timing queues
reps back-to-back with a host-transfer sync (CUDA-event-loop analogue).
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from sageattention_tpu.bench_lib import run_headline  # noqa: E402


if __name__ == "__main__":
    result = run_headline()
    print(json.dumps(result))
