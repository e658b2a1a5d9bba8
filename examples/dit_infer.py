#!/usr/bin/env python
"""Video-DiT denoising with SageAttention — the TPU equivalent of
`/root/reference/example/cogvideox_infer.py`.

The reference swaps ``F.scaled_dot_product_attention = sageattn`` into a
diffusers pipeline; here the in-repo DiT takes the attention callable
directly.  Compares final latents between bf16 attention and each
SageAttention mode (the reference's "lossless video" eyeball test, made
quantitative with the cosine-sim metric from bench/utils.py).

Run:  PYTHONPATH=/root/.axon_site:. python examples/dit_infer.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sageattention_tpu.models import (
    DiTConfig, make_dit, example_inputs, sage_dot_product_attention)
from sageattention_tpu.utils.testing import calc_diff


def denoise(model, params, latents, text, steps=10):
    """Toy DDIM-style loop: x <- x - dt * eps_pred."""
    def step(i, x):
        t = jnp.full((x.shape[0],), 1000 - i * (1000 // steps), jnp.int32)
        eps = model.apply(params, x, text, t)
        return x - (1.0 / steps) * eps.astype(x.dtype)
    return jax.lax.fori_loop(0, steps, step, latents)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--seq", type=int, default=0, help="override video tokens via height")
    args = ap.parse_args()

    cfg = DiTConfig(hidden=512, heads=8, depth=args.depth,
                    frames=4, height=32, width=32, zero_init_gates=False)
    latents, text, t = example_inputs(cfg)
    ref_model = make_dit(cfg, attn_fn=None)  # jax.nn.dot_product_attention
    params = ref_model.init(jax.random.PRNGKey(0), latents, text, t)

    runs = {}
    for name, attn in [
        ("jax.nn (baseline)", None),
        ("sageattn (auto)", sage_dot_product_attention),
    ]:
        model = make_dit(cfg, attn_fn=attn)
        import numpy as np
        f = jax.jit(lambda p, x, txt: denoise(model, p, x, txt, steps=args.steps))
        out = f(params, latents, text)
        np.asarray(out.ravel()[:1])  # host sync (block_until_ready is not
        # reliable through tunneled TPU platforms)
        t0 = time.perf_counter()
        out = f(params, latents, text)
        np.asarray(out.ravel()[:1])
        dt = time.perf_counter() - t0
        runs[name] = (out, dt)
        print(f"{name}: {dt*1e3:.1f} ms / {args.steps} steps")

    base = runs["jax.nn (baseline)"][0]
    for name, (out, _) in runs.items():
        if name != "jax.nn (baseline)":
            print(f"cosine-diff {name} vs baseline: {calc_diff(out, base):.3e}")


if __name__ == "__main__":
    main()
