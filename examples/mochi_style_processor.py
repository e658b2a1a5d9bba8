#!/usr/bin/env python
"""Mochi-style per-model attention processor (reference integration craft).

The reference's Mochi patch (`/root/reference/example/modify_model/
modify_mochi.py`) does two model-specific things no generic monkeypatch
covers:

  1. strips each batch row's PADDED text tokens before attention
     (`modify_mochi.py:76-93` — a host-side Python loop slicing per row);
  2. keeps the fragile LAST transformer layer on exact attention
     (`modify_mochi.py:112-119`).

The TPU-native equivalents composed here:

  1. `sage_joint_attention_ragged` — ONE static-shape segmented varlen
     call: the text prefix is permuted invalid-first per row (stable
     argsort), each row becomes (garbage, real) segments via traced
     cu_seqlens, segment-aware quantization keeps pad garbage out of the
     scale groups, outputs return to the original layout;
  2. `layered_attention(skip_layers=(-1,))` — per-layer processor
     selection on the in-repo DiT.

Run (CPU):  python examples/mochi_style_processor.py
Run (TPU):  PYTHONPATH=/root/.axon_site:. python examples/mochi_style_processor.py
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.models import (
    DiTConfig, make_dit, example_inputs, layered_attention,
    sage_joint_attention_ragged)
from sageattention_tpu.utils.testing import calc_diff


def main():
    cfg = DiTConfig(hidden=256, heads=4, depth=4, frames=2, height=16,
                    width=16, text_len=128, text_dim=256,
                    zero_init_gates=False)
    B = 2
    latents, text, t = example_inputs(cfg, batch=B)
    # ragged prompts: row 0 uses 77 text tokens, row 1 uses 30 — the rest
    # is padding the processor strips (the Mochi situation)
    n_valid = [77, 30]
    tmask = jnp.asarray(np.array(
        [[i < n for i in range(cfg.text_len)] for n in n_valid]))

    def ragged_fn(q, k, v, *a, **kw):
        return sage_joint_attention_ragged(q, k, v, tmask)

    def exact_masked(q, k, v, *a, **kw):
        valid = jnp.concatenate(
            [tmask, jnp.ones((q.shape[0], cfg.video_tokens), bool)], axis=1)
        M = valid[:, None, :, None] & valid[:, None, None, :]
        out = jax.nn.dot_product_attention(q, k, v, mask=M)
        return jnp.where(valid[:, :, None, None], out, 0)

    last = cfg.depth - 1
    sage_model = make_dit(cfg, attn_fn=layered_attention(
        default_fn=ragged_fn, overrides={last: exact_masked}))
    exact_model = make_dit(cfg, attn_fn=layered_attention(
        default_fn=exact_masked))

    params = exact_model.init(jax.random.PRNGKey(0), latents, text, t)
    f_sage = jax.jit(lambda p, l, x, tt: sage_model.apply(p, l, x, tt))
    f_exact = jax.jit(lambda p, l, x, tt: exact_model.apply(p, l, x, tt))

    t0 = time.perf_counter()
    out = f_sage(params, latents, text, t)
    np.asarray(out.ravel()[:1])
    print(f"sage ragged-processor forward: {time.perf_counter()-t0:.2f}s "
          f"(incl. compile), joint seq {cfg.text_len + cfg.video_tokens} "
          f"({n_valid} valid text tokens/row)")
    ref = f_exact(params, latents, text, t)
    d = float(calc_diff(out, ref))
    print(f"final-latent diff vs exact dense-masked model: {d:.2e} "
          f"({'OK' if d < 2e-3 else 'FAIL'}; last layer exact in both, "
          f"reference craft)")


if __name__ == "__main__":
    main()
