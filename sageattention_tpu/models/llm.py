"""Llama-style decoder block — the LLM model family the reference validates
on ("plug-and-play" into Llama-class models; accuracy tables in the papers
cover LLM workloads alongside DiTs).

Causal GQA attention with RoPE, SwiGLU MLP, RMSNorm; attention is the
pluggable NHD callable so sageattn / ring / ulysses drive it unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    hidden: int = 512
    heads: int = 8
    kv_heads: int = 2        # GQA
    depth: int = 4
    vocab: int = 1024
    mlp_ratio: float = 2.7
    rope_theta: float = 10000.0
    sliding_window: int = 0   # Mistral/Gemma2-class local attention (0 = full)
    attention_sinks: int = 0  # StreamingLLM sinks: first n tokens stay
    # visible beyond the window (prefill needs an attn_fn that takes the
    # kwarg, e.g. sage_dot_product_attention; paged decode is native)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


def rope(x, theta: float = 10000.0, pos=0):
    """Rotary embedding over NHD [B, S, H, D]; ``pos`` offsets the
    positions — a scalar (synchronized decode) or a [B] vector (ragged
    continuous batching: each sequence's own global index); traced OK."""
    B, S, H, D = x.shape
    half = D // 2
    freqs = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    pos = jnp.reshape(jnp.asarray(pos, jnp.float32), (-1, 1))   # [1|B, 1]
    ang = ((jnp.arange(S, dtype=jnp.float32)[None] + pos)[..., None]
           * freqs[None, None])                                 # [1|B,S,half]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1).astype(x.dtype)


class RMSNorm(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + 1e-6)).astype(self.dtype) * scale.astype(self.dtype)


class LlamaBlock(nn.Module):
    """Decoder block.  Three attention modes (same params, so a model can
    prefill once and decode forever):

    - ``cache=None, max_len=0, paged_spec=None``: plain causal prefill.
    - ``cache=None, max_len>0``: prefill AND build an int8 KV cache
      (`decode.kv_cache_init` on the post-RoPE K/V) — returns (x, cache).
    - ``cache=None, paged_spec={num_pages, page_table, lengths}``: prefill
      into a PAGED pool (`paged.paged_prefill`; ragged right-padded batch,
      page-aligned S) — returns (x, cache).
    - ``cache=KVCache | PagedKVCache``: decode ``S`` new tokens — append
      their K/V, attend over the grown cache — returns (x, cache).  For a
      paged cache, ``pos=None`` uses each sequence's own length (ragged)
      and ``active`` freezes finished slots.
    """

    cfg: LlamaConfig
    attn_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, cache=None, pos=0, max_len: int = 0,
                 bucket: int = 0, paged_spec=None, active=None):
        from .. import decode as dec
        from .. import paged as pg

        cfg = self.cfg
        B, S, _ = x.shape
        if pos is None:
            assert isinstance(cache, pg.PagedKVCache), \
                "pos=None (ragged positions) needs a paged cache"
            pos = cache.lengths
        h = RMSNorm(cfg.dtype)(x)
        q = nn.Dense(cfg.hidden, use_bias=False, dtype=cfg.dtype, name="wq")(h)
        k = nn.Dense(cfg.kv_heads * cfg.head_dim, use_bias=False,
                     dtype=cfg.dtype, name="wk")(h)
        v = nn.Dense(cfg.kv_heads * cfg.head_dim, use_bias=False,
                     dtype=cfg.dtype, name="wv")(h)
        q = rope(q.reshape(B, S, cfg.heads, cfg.head_dim), cfg.rope_theta,
                 pos=pos)
        k = rope(k.reshape(B, S, cfg.kv_heads, cfg.head_dim), cfg.rope_theta,
                 pos=pos)
        v = v.reshape(B, S, cfg.kv_heads, cfg.head_dim)
        W = cfg.sliding_window
        if isinstance(cache, pg.PagedKVCache):
            if W and S > 1:
                raise ValueError("sliding-window decode is T=1; chunk the "
                                 "window")
            cache = pg.paged_append(cache, k, v, tensor_layout="NHD",
                                    active=active)
            o = pg.sageattn_decode_paged(q, cache, tensor_layout="NHD",
                                         pages_bucket=bucket,
                                         sliding_window=W,
                                         attention_sinks=cfg.attention_sinks)
        elif cache is not None:
            if W:
                raise ValueError("sliding-window serving needs the paged "
                                 "cache (paged_spec=...); the dense cache "
                                 "streams the full prefix")
            cache = dec.kv_cache_append(cache, k, v, tensor_layout="NHD")
            o = dec.sageattn_decode(q, cache, tensor_layout="NHD",
                                    bucket=bucket)
        else:
            attn = self.attn_fn or jax.nn.dot_product_attention
            if cfg.attention_sinks and self.attn_fn is None:
                raise ValueError(
                    "attention_sinks prefill needs an attn_fn that takes "
                    "the kwarg (e.g. sage_dot_product_attention); "
                    "jax.nn.dot_product_attention has no sink support")
            o = attn(q, k, v, is_causal=True,
                     **({"local_window_size": (W - 1, 0)} if W else {}),
                     **({"attention_sinks": cfg.attention_sinks}
                        if cfg.attention_sinks else {}))
            if paged_spec is not None:
                cache = pg.paged_prefill(
                    k, v, paged_spec["lengths"], paged_spec["page_table"],
                    num_pages=paged_spec["num_pages"], tensor_layout="NHD")
            elif max_len:
                cache = dec.kv_cache_init(k, v, max_len,
                                          tensor_layout="NHD")
        o = nn.Dense(cfg.hidden, use_bias=False, dtype=cfg.dtype,
                     name="wo")(o.reshape(B, S, cfg.hidden).astype(cfg.dtype))
        x = x + o
        h = RMSNorm(cfg.dtype)(x)
        inner = int(cfg.hidden * cfg.mlp_ratio)
        gate = nn.Dense(inner, use_bias=False, dtype=cfg.dtype)(h)
        up = nn.Dense(inner, use_bias=False, dtype=cfg.dtype)(h)
        down = nn.Dense(cfg.hidden, use_bias=False, dtype=cfg.dtype)(
            nn.silu(gate) * up)
        x = x + down
        if max_len or paged_spec is not None or (cache is not None):
            return x, cache
        return x


class LlamaLM(nn.Module):
    """``__call__(tokens)`` -> logits (prefill, original behavior).
    ``max_len>0`` (dense) or ``paged_spec={num_pages, page_table,
    lengths}`` (paged pool; one table serves every layer — each layer owns
    its own pool indexed by the same page ids) -> (logits, caches tuple);
    ``caches=...`` -> decode the new tokens against/into the caches and
    return (logits, caches).  Paged ragged decode: ``pos=None`` + per-slot
    ``active`` masks."""

    cfg: LlamaConfig
    attn_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, tokens, caches=None, pos=0, max_len: int = 0,
                 bucket: int = 0, paged_spec=None, active=None):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab, cfg.hidden, dtype=cfg.dtype)(tokens)
        new_caches = []
        for i in range(cfg.depth):
            blk = LlamaBlock(cfg, self.attn_fn, name=f"layer_{i}")
            if max_len or paged_spec is not None or caches is not None:
                x, c = blk(x, cache=None if caches is None else caches[i],
                           pos=pos, max_len=max_len, bucket=bucket,
                           paged_spec=paged_spec, active=active)
                new_caches.append(c)
            else:
                x = blk(x)
        x = RMSNorm(cfg.dtype)(x)
        logits = nn.Dense(cfg.vocab, use_bias=False, dtype=cfg.dtype,
                          name="lm_head")(x)
        if new_caches:
            return logits, tuple(new_caches)
        return logits
