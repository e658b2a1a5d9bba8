#!/usr/bin/env python
"""Autoregressive generation with the int8 KV cache.

Prefill a prompt once (building per-layer int8 caches from the post-RoPE
K/V), then greedy-decode token by token through `sageattn_decode` — each
step streams the int8 cache (half the bytes of a bf16 cache) once per KV
head (GQA fold).  The decode step jits once; appends are in-place
dynamic-update-slices on the cache pytree.

Run (TPU):  PYTHONPATH=/root/.axon_site:. python examples/llm_decode.py
Run (CPU):  python examples/llm_decode.py --steps 4   (interpret mode, slow)
"""

import argparse
import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sageattention_tpu.models.llm import LlamaConfig, LlamaLM


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--depth", type=int, default=4)
    args = ap.parse_args()

    cfg = LlamaConfig(hidden=args.hidden, heads=args.hidden // 64,
                      kv_heads=max(2, args.hidden // 256), depth=args.depth)
    model = LlamaLM(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (1, args.prompt_len),
                                0, cfg.vocab)
    params = model.init(jax.random.PRNGKey(1), tokens)

    t0 = time.perf_counter()
    logits, caches = model.apply(params, tokens, max_len=args.max_len)
    nxt = jnp.argmax(logits[:, -1:], axis=-1)
    jax.block_until_ready(nxt)
    print(f"prefill {args.prompt_len} tokens: "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms (incl. compile)")

    @jax.jit
    def step(params, tok, caches, pos):
        logits, caches = model.apply(params, tok, caches=caches, pos=pos)
        return jnp.argmax(logits[:, -1:], axis=-1), caches

    # compile outside the timed loop
    pos = jnp.asarray(args.prompt_len, jnp.int32)
    nxt, caches = step(params, nxt, caches, pos)
    jax.block_until_ready(nxt)

    out = [int(nxt[0, 0])]
    t0 = time.perf_counter()
    for i in range(1, args.steps):
        nxt, caches = step(params, nxt, caches, pos + i)
        out.append(int(nxt[0, 0]))
    dt = time.perf_counter() - t0
    print(f"decode {args.steps - 1} steps: {dt * 1e3:.1f} ms "
          f"({(args.steps - 1) / dt:.1f} tok/s), cache length "
          f"{int(caches[0].length)}")
    print("generated token ids:", out[:16], "...")


if __name__ == "__main__":
    main()
