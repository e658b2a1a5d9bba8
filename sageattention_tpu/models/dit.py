"""CogVideoX-style video diffusion transformer (DiT) — the flagship model.

The reference ships no model code; it integrates into diffusers' CogVideoX /
Mochi / Wan / LTX pipelines (`/root/reference/example/*_infer.py`) purely by
swapping the attention call.  For the TPU framework the equivalent workload
is an in-repo DiT: joint text+video token attention with adaLN-zero
modulation (the CogVideoX block structure), pluggable attention so every
SageAttention mode (and the sequence-parallel paths) can drive it.

flax.linen, bf16 compute / fp32 params, static shapes; attention inputs are
NHD ([B, S, H, D]) matching ``jax.nn.dot_product_attention`` so the model
runs unmodified with jax.nn, sageattn, or a ring/ulysses wrapper.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

AttentionFn = Callable  # (q, k, v, *, is_causal, scale) -> out, NHD layout


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    hidden: int = 512
    heads: int = 8
    depth: int = 4
    patch: int = 2            # spatial patch size
    in_channels: int = 16     # latent channels
    text_dim: int = 512
    text_len: int = 64
    frames: int = 4           # latent frames
    height: int = 32          # latent H
    width: int = 32           # latent W
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16
    # adaLN-Zero initializes the modulation to zero so blocks start as the
    # identity (correct for training).  Tests/examples that compare
    # attention implementations must disable it — with zero gates an
    # untrained DiT ignores attention entirely and any comparison is vacuous.
    zero_init_gates: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def video_tokens(self) -> int:
        return self.frames * (self.height // self.patch) * (self.width // self.patch)


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class AdaLNZero(nn.Module):
    """adaLN-Zero modulation: 6 params per block from the conditioning."""
    hidden: int
    dtype: Any
    zero_init: bool = True

    @nn.compact
    def __call__(self, c):
        c = nn.silu(c)
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.normal(0.02))
        mods = nn.Dense(6 * self.hidden, dtype=self.dtype,
                        kernel_init=init)(c)
        return jnp.split(mods[:, None, :], 6, axis=-1)


class JointBlock(nn.Module):
    """CogVideoX-style joint text+video transformer block."""
    cfg: DiTConfig
    attn_fn: Optional[AttentionFn] = None

    @nn.compact
    def __call__(self, x, c):
        cfg = self.cfg
        shift1, scale1, gate1, shift2, scale2, gate2 = AdaLNZero(
            cfg.hidden, cfg.dtype, cfg.zero_init_gates)(c)
        if not cfg.zero_init_gates:
            gate1 = 1.0 + gate1
            gate2 = 1.0 + gate2

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=cfg.dtype)(x)
        h = h * (1 + scale1) + shift1
        qkv = nn.Dense(3 * cfg.hidden, dtype=cfg.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, S, _ = q.shape
        q = q.reshape(B, S, cfg.heads, cfg.head_dim)
        k = k.reshape(B, S, cfg.heads, cfg.head_dim)
        v = v.reshape(B, S, cfg.heads, cfg.head_dim)
        attn = self.attn_fn or jax.nn.dot_product_attention
        o = attn(q, k, v)
        o = o.reshape(B, S, cfg.hidden).astype(cfg.dtype)
        x = x + gate1 * nn.Dense(cfg.hidden, dtype=cfg.dtype, name="proj")(o)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=cfg.dtype)(x)
        h = h * (1 + scale2) + shift2
        h = nn.Dense(int(cfg.hidden * cfg.mlp_ratio), dtype=cfg.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(cfg.hidden, dtype=cfg.dtype)(h)
        return x + gate2 * h


class DiT(nn.Module):
    """Video DiT: patchify(latents) ++ text -> N joint blocks -> unpatchify."""
    cfg: DiTConfig
    attn_fn: Optional[AttentionFn] = None

    @nn.compact
    def __call__(self, latents, text_emb, t):
        """latents [B, F, H, W, C]; text_emb [B, L, text_dim]; t [B]."""
        cfg = self.cfg
        B, F, H, W, C = latents.shape
        p = cfg.patch
        # patchify: [B, F*(H/p)*(W/p), p*p*C]
        x = latents.reshape(B, F, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, cfg.video_tokens, p * p * C)
        x = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="patch_embed")(x)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, cfg.video_tokens, cfg.hidden), jnp.float32)
        x = x + pos.astype(cfg.dtype)

        txt = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="text_embed")(text_emb)
        x = jnp.concatenate([txt, x], axis=1)  # [B, text_len + video_tokens, hid]

        c = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="t_embed")(
            timestep_embedding(t, 256).astype(cfg.dtype))
        c = nn.Dense(cfg.hidden, dtype=cfg.dtype, name="t_embed2")(nn.silu(c))

        for i in range(cfg.depth):
            # per-layer attention selection: the reference's model patches
            # swap attention processors per block and skip fragile layers
            # (`example/modify_model/modify_mochi.py:112-119` skips the last
            # layer); attn_fn may be a callable OR a layer-index -> callable
            fn = self.attn_fn
            if fn is not None and not callable(fn):
                raise TypeError("attn_fn must be callable")
            if fn is not None and getattr(fn, "_per_layer", False):
                fn = fn(i)
            x = JointBlock(cfg, fn, name=f"block_{i}")(x, c)

        x = x[:, cfg.text_len:]  # drop text tokens
        x = nn.LayerNorm(dtype=cfg.dtype)(x)
        x = nn.Dense(p * p * C, dtype=cfg.dtype, name="final")(x)
        # unpatchify
        x = x.reshape(B, F, H // p, W // p, p, p, C)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, F, H, W, C)
        return x


def make_dit(cfg: DiTConfig, attn_fn: Optional[AttentionFn] = None):
    return DiT(cfg, attn_fn)


def example_inputs(cfg: DiTConfig, batch: int = 1, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    latents = jax.random.normal(
        k1, (batch, cfg.frames, cfg.height, cfg.width, cfg.in_channels), jnp.float32)
    text = jax.random.normal(k2, (batch, cfg.text_len, cfg.text_dim), jnp.float32)
    t = jnp.full((batch,), 500, jnp.int32)
    return latents, text, t


def diffusion_loss(model, params, batch, key):
    """Simple v-prediction MSE diffusion loss (training-step workload)."""
    latents, text, t = batch
    noise = jax.random.normal(key, latents.shape, latents.dtype)
    alpha = (1.0 - t.astype(jnp.float32) / 1000.0)[:, None, None, None, None]
    noisy = alpha * latents + (1 - alpha ** 2) ** 0.5 * noise
    pred = model.apply(params, noisy, text, t)
    target = noise  # epsilon prediction
    return jnp.mean((pred.astype(jnp.float32) - target) ** 2)
