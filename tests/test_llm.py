"""LLM (Llama-style) model family with SageAttention — causal GQA + RoPE."""

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.models.llm import LlamaConfig, LlamaLM
from sageattention_tpu.models import sage_dot_product_attention
from sageattention_tpu.utils.testing import calc_diff

CFG = LlamaConfig(hidden=128, heads=4, kv_heads=2, depth=2, vocab=256)


def test_llm_forward_parity():
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 384), 0, CFG.vocab)
    ref_model = LlamaLM(CFG)
    params = ref_model.init(jax.random.PRNGKey(1), tokens)
    ref = ref_model.apply(params, tokens)
    sage = LlamaLM(CFG, attn_fn=sage_dot_product_attention).apply(params, tokens)
    assert sage.shape == (2, 384, CFG.vocab)
    assert calc_diff(sage, ref) < 2e-3


def test_llm_loss_and_grads():
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 256), 0, CFG.vocab)
    model = LlamaLM(CFG, attn_fn=sage_dot_product_attention)
    params = model.init(jax.random.PRNGKey(3), tokens)

    def loss(p):
        logits = model.apply(p, tokens)
        return -jnp.mean(jax.nn.log_softmax(logits)[..., 0])

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree_util.tree_leaves(grads))
