#!/usr/bin/env python
"""LLM (Llama-style) forward with SageAttention — the LLM workload the
reference validates on (its papers evaluate Llama-class models with sageattn
monkeypatched in).

Compares logits between exact attention and each SageAttention mode and
reports per-token speed.

Run:  PYTHONPATH=/root/.axon_site:. python examples/llm_infer.py
CPU:  PYTHONPATH= JAX_PLATFORMS=cpu python examples/llm_infer.py --tiny
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.models import sage_dot_product_attention
from sageattention_tpu.models.llm import LlamaConfig, LlamaLM
from sageattention_tpu.utils.testing import calc_diff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if args.tiny:
        cfg = LlamaConfig(hidden=128, heads=4, kv_heads=2, depth=2, vocab=256)
        seq = 512
    else:
        cfg = LlamaConfig(hidden=1024, heads=16, kv_heads=4, depth=4, vocab=8192)
        seq = args.seq

    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, seq), 0, cfg.vocab)
    ref_model = LlamaLM(cfg)
    params = ref_model.init(jax.random.PRNGKey(1), tokens)

    runs = {}
    for name, attn in [("jax.nn (baseline)", None),
                       ("sageattn (auto)", sage_dot_product_attention)]:
        model = LlamaLM(cfg, attn_fn=attn)
        f = jax.jit(lambda p, t, m=model: m.apply(p, t))
        out = f(params, tokens)
        np.asarray(out.ravel()[:1])  # host sync
        t0 = time.perf_counter()
        out = f(params, tokens)
        np.asarray(out.ravel()[:1])
        dt = time.perf_counter() - t0
        runs[name] = out
        print(f"{name}: {dt*1e3:.1f} ms / {seq} tokens "
              f"({seq/dt:.0f} tok/s prefill)")

    d = calc_diff(runs["sageattn (auto)"], runs["jax.nn (baseline)"])
    print(f"logits cosine-diff vs exact attention: {d:.3e}")
    assert d < 5e-3, "accuracy regression"


if __name__ == "__main__":
    main()
