"""Model workloads + integration adapters (reference `example/` equivalent).

Families: video DiT (CogVideoX-style), Llama-style LLM, ViT — the three
workload classes the reference validates on."""

from .dit import DiT, DiTConfig, make_dit, example_inputs, diffusion_loss
from .llm import LlamaConfig, LlamaLM, LlamaBlock
from .vit import ViTConfig, ViT
from .integration import (sage_dot_product_attention, patch_jax_nn_attention,
                          layered_attention, sage_joint_attention_ragged)

__all__ = ["DiT", "DiTConfig", "make_dit", "example_inputs", "diffusion_loss",
           "LlamaConfig", "LlamaLM", "LlamaBlock", "ViTConfig", "ViT",
           "sage_dot_product_attention", "patch_jax_nn_attention",
           "layered_attention", "sage_joint_attention_ragged"]
