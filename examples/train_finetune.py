#!/usr/bin/env python
"""Fine-tuning with quantized attention END TO END — forward (int8 QK^T +
static softmax) and backward (SageBwd-class int8 S-recompute,
`ops/backward_pallas.py`) both quantized.

The reference library is inference-only (no training path at all); its
design source for this workload is the SageBwd paper (arXiv 2505.11594,
int8 fine-tuning with lossless task accuracy).  This example demonstrates
the TPU equivalent: a Llama-style LM fine-tuned on synthetic next-token
data three ways —

  exact      jax.nn.dot_product_attention fwd + autodiff bwd
  sage       sageattn fwd + int8 backward (the default training path)
  sage-bf16  sageattn fwd + quant_backward=False (exact-math backward)

and reports per-step wall clock plus the loss trajectories, which must
track the exact run closely (gradient cossim of the int8 backward is
~7e-5-class; docs/PERF_NOTES.md).

Run:  PYTHONPATH=/root/.axon_site:. python examples/train_finetune.py
CPU:  PYTHONPATH= JAX_PLATFORMS=cpu python examples/train_finetune.py --tiny
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sageattention_tpu.models import sage_dot_product_attention
from sageattention_tpu.models.llm import LlamaConfig, LlamaLM


def batches(vocab, batch, seq, steps, seed=0):
    """Synthetic 'skill': next token = (3*tok + 7) % vocab, plus noise."""
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        t0 = rng.integers(0, vocab, (batch, 1))
        toks = [t0]
        for _ in range(seq - 1):
            nxt = (3 * toks[-1] + 7) % vocab
            flip = rng.random((batch, 1)) < 0.1
            nxt = np.where(flip, rng.integers(0, vocab, (batch, 1)), nxt)
            toks.append(nxt)
        yield jnp.asarray(np.concatenate(toks, axis=1))


def train(model, params, data, lr=3e-4):
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, toks):
        def loss_fn(p):
            logits = model.apply(p, toks[:, :-1])
            tgt = jax.nn.one_hot(toks[:, 1:], logits.shape[-1])
            return -jnp.mean(jnp.sum(
                jax.nn.log_softmax(logits) * tgt, axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state = opt.update(grads, state)
        return optax.apply_updates(params, upd), state, loss

    losses, t_steps = [], []
    for i, toks in enumerate(data):
        t0 = time.perf_counter()
        params, state, loss = step(params, state, toks)
        loss = float(loss)  # host sync (block_until_ready is unreliable
        # through the axon tunnel; a scalar pull is)
        if i > 0:  # skip compile step
            t_steps.append(time.perf_counter() - t0)
        losses.append(loss)
    return losses, (np.median(t_steps) if t_steps else 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    if args.tiny:
        cfg = LlamaConfig(hidden=128, heads=4, kv_heads=2, depth=2, vocab=64)
        batch, seq = 2, 256
    else:
        cfg = LlamaConfig(hidden=512, heads=8, kv_heads=4, depth=4, vocab=512)
        batch, seq = 4, 2048

    init_model = LlamaLM(cfg)
    toks0 = next(batches(cfg.vocab, batch, seq, 1))
    params0 = init_model.init(jax.random.PRNGKey(0), toks0[:, :-1])

    runs = {}
    for name, attn in [
        ("exact", None),
        ("sage", sage_dot_product_attention),
        ("sage-bf16", functools.partial(sage_dot_product_attention,
                                        quant_backward=False)),
    ]:
        model = LlamaLM(cfg, attn_fn=attn)
        data = batches(cfg.vocab, batch, seq, args.steps, seed=1)
        losses, t_med = train(model, params0, data)
        runs[name] = losses
        print(f"{name:9s}: loss {losses[0]:.4f} -> {losses[-1]:.4f}  "
              f"({t_med*1e3:.1f} ms/step)", flush=True)

    exact = np.array(runs["exact"])
    for name in ("sage", "sage-bf16"):
        drift = np.abs(np.array(runs[name]) - exact).max()
        print(f"max |loss drift| {name} vs exact: {drift:.4f}")
    assert runs["sage"][-1] < runs["sage"][0] * 0.7, "no learning?"
    print("TRAIN OK")


if __name__ == "__main__":
    main()
