"""Vision Transformer — the third model family the reference validates on
(papers report ViT accuracy alongside DiTs and LLMs).

Standard pre-LN encoder with a CLS token; attention is the pluggable NHD
callable (non-causal, no mask) so all SageAttention modes apply directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 64
    patch: int = 8
    channels: int = 3
    hidden: int = 256
    heads: int = 4
    depth: int = 4
    classes: int = 100
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @property
    def tokens(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1  # + CLS


class EncoderBlock(nn.Module):
    cfg: ViTConfig
    attn_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        B, S, _ = x.shape
        hd = cfg.hidden // cfg.heads
        h = nn.LayerNorm(dtype=cfg.dtype)(x)
        qkv = nn.Dense(3 * cfg.hidden, dtype=cfg.dtype)(h)
        q, k, v = (t.reshape(B, S, cfg.heads, hd) for t in jnp.split(qkv, 3, -1))
        attn = self.attn_fn or jax.nn.dot_product_attention
        o = attn(q, k, v).reshape(B, S, cfg.hidden).astype(cfg.dtype)
        x = x + nn.Dense(cfg.hidden, dtype=cfg.dtype)(o)
        h = nn.LayerNorm(dtype=cfg.dtype)(x)
        h = nn.Dense(int(cfg.hidden * cfg.mlp_ratio), dtype=cfg.dtype)(h)
        h = nn.gelu(h)
        return x + nn.Dense(cfg.hidden, dtype=cfg.dtype)(h)


class ViT(nn.Module):
    cfg: ViTConfig
    attn_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, images):
        """images [B, H, W, C] -> logits [B, classes]."""
        cfg = self.cfg
        B = images.shape[0]
        p = cfg.patch
        x = images.reshape(B, cfg.image_size // p, p, cfg.image_size // p, p,
                           cfg.channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, p * p * cfg.channels)
        x = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="patch_embed")(x)
        cls = self.param("cls", nn.initializers.normal(0.02),
                         (1, 1, cfg.hidden), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(cfg.dtype),
                                              (B, 1, cfg.hidden)), x], axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, cfg.tokens, cfg.hidden), jnp.float32)
        x = x + pos.astype(cfg.dtype)
        for i in range(cfg.depth):
            x = EncoderBlock(cfg, self.attn_fn, name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=cfg.dtype)(x)
        return nn.Dense(cfg.classes, dtype=cfg.dtype, name="head")(x[:, 0])
