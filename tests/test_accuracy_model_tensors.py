"""Accuracy on *model-realistic* attention inputs.

The reference's accuracy claims are measured on real model tensors (video
DiTs, LLMs), not synthetic gaussians.  Here we capture the actual q/k/v
produced inside our DiT and Llama blocks (post-LayerNorm projections, RoPE,
GQA) and check every quantized mode against the fp32 oracle on them.
"""

import jax
import jax.numpy as jnp
import pytest

import sageattention_tpu as sa
from sageattention_tpu.core import _sage_attention
from sageattention_tpu.models import DiTConfig, make_dit, example_inputs
from sageattention_tpu.models.llm import LlamaConfig, LlamaLM
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff


def capture_qkv(build_model, init_args):
    """Run the model once with a capturing attention fn; return HND q/k/v."""
    captured = {}

    def capturing_attn(q, k, v, *a, **kw):
        captured.setdefault("qkv", (q, k, v))
        captured.setdefault("kw", kw)
        return jax.nn.dot_product_attention(q, k, v, *a, **kw)

    model = build_model(capturing_attn)
    params = model.init(jax.random.PRNGKey(0), *init_args)
    model.apply(params, *init_args)
    q, k, v = captured["qkv"]
    # NHD -> HND
    return tuple(jnp.swapaxes(x.astype(jnp.float32), 1, 2) for x in (q, k, v)), captured["kw"]


@pytest.fixture(scope="module")
def dit_qkv():
    cfg = DiTConfig(hidden=128, heads=4, depth=1, frames=2, height=8, width=8,
                    text_len=32, text_dim=64, zero_init_gates=False)
    return capture_qkv(lambda attn: make_dit(cfg, attn), example_inputs(cfg))


@pytest.fixture(scope="module")
def llm_qkv():
    cfg = LlamaConfig(hidden=128, heads=4, kv_heads=2, depth=1, vocab=128)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 256), 0, 128)
    return capture_qkv(lambda attn: LlamaLM(cfg, attn), (tokens,))


MODES = [
    ("flagship dq-compute", dict(compute_dtype="bf16", pv_dtype="int8")),
    ("native int8 dots + bf16 pv", dict(pv_dtype="bf16")),
    ("native int8 dots + int8 pv", dict(pv_dtype="int8")),
    ("per-block gran", dict(pv_dtype="bf16", qk_quant_gran="per_block")),
]


@pytest.mark.parametrize("name,opts", MODES, ids=[m[0] for m in MODES])
def test_dit_tensors(dit_qkv, name, opts):
    (q, k, v), _ = dit_qkv
    ref = sdpa(q, k, v)
    out = _sage_attention(q, k, v, **opts)
    assert calc_diff(out, ref) < 1e-3, f"{name} failed on DiT tensors"


@pytest.mark.parametrize("name,opts", MODES, ids=[m[0] for m in MODES])
def test_llm_tensors(llm_qkv, name, opts):
    (q, k, v), kw = llm_qkv
    assert kw.get("is_causal", False)
    ref = sdpa(q, k, v, is_causal=True)
    out = _sage_attention(q, k, v, is_causal=True, **opts)
    assert calc_diff(out, ref) < 1e-3, f"{name} failed on LLM tensors"
