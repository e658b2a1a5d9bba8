"""Model workloads + integration adapters (reference `example/` equivalent)."""

from .dit import DiT, DiTConfig, make_dit, example_inputs, diffusion_loss
from .integration import sage_dot_product_attention, patch_jax_nn_attention

__all__ = ["DiT", "DiTConfig", "make_dit", "example_inputs", "diffusion_loss",
           "sage_dot_product_attention", "patch_jax_nn_attention"]
