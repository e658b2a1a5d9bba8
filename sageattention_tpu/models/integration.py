"""Model integration: drop-in replacement for jax.nn.dot_product_attention.

The reference integrates into models by monkeypatching
``F.scaled_dot_product_attention = sageattn``
(`/root/reference/example/cogvideox_infer.py:35`) or by swapping per-block
attention processors (`example/modify_model/*.py`).  The JAX equivalents:

  - :func:`sage_dot_product_attention` — signature-compatible with
    ``jax.nn.dot_product_attention`` (NHD: [B, S, H, D]); pass it anywhere a
    model takes an attention callable.
  - :func:`patch_jax_nn_attention` — context manager that globally swaps
    ``jax.nn.dot_product_attention`` (the literal monkeypatch analogue, for
    third-party model code you cannot edit).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp

from ..core import sageattn

# Captured at import so the unsupported-combination fallback always calls the
# REAL implementation, even while patch_jax_nn_attention has replaced the
# module attribute (calling jax.nn.dot_product_attention there would recurse).
_ORIG_DOT_PRODUCT_ATTENTION = jax.nn.dot_product_attention


def sage_dot_product_attention(
    query,
    key,
    value,
    bias=None,
    mask=None,
    *,
    scale: Optional[float] = None,
    is_causal: bool = False,
    query_seq_lengths=None,
    key_value_seq_lengths=None,
    local_window_size=None,
    implementation=None,
    **kwargs,
):
    """``jax.nn.dot_product_attention``-compatible SageAttention.

    Inputs are NHD ([batch, seq, heads, head_dim]) like jax.nn's contract.
    ``mask`` (bool keep-mask) and ``bias`` (additive) map onto the kernel's
    attn_mask path; causal ``local_window_size=(left, 0)`` maps onto the
    kernel's sliding-window band (r3); unsupported combinations (both masks
    at once, seq-lengths, non-causal windows) fall back to the exact jax.nn
    implementation — the reference similarly limits masked models
    (`example/hunyuan_infer.py:6-12`).
    """
    sliding = 0
    if local_window_size is not None:
        lw = (local_window_size if isinstance(local_window_size, (tuple, list))
              else (local_window_size, local_window_size))
        if (is_causal and lw[1] == 0 and mask is None and bias is None):
            sliding = int(lw[0]) + 1     # row attends [r-left, r]
            local_window_size = None
    unsupported = ((bias is not None and mask is not None)
                   or query_seq_lengths is not None
                   or key_value_seq_lengths is not None
                   or local_window_size is not None)
    if unsupported:
        # Loud-failure rule (models/llm.py pattern): the exact jax.nn
        # fallback cannot honor sage-only semantics.  Silently computing
        # full attention where sinks/window were requested would be a
        # correctness bug, not a fallback.
        if kwargs.get("attention_sinks"):
            raise NotImplementedError(
                "attention_sinks cannot combine with "
                "query/key_value_seq_lengths or a non-causal/two-sided "
                "local_window_size; jax.nn.dot_product_attention has no "
                "sink semantics to fall back to.")
        if sliding:
            # re-attach the extracted causal window so the fallback stays
            # exact instead of quietly widening to full attention
            local_window_size = (sliding - 1, 0)
        return _ORIG_DOT_PRODUCT_ATTENTION(
            query, key, value, bias=bias, mask=mask, scale=scale,
            is_causal=is_causal, query_seq_lengths=query_seq_lengths,
            key_value_seq_lengths=key_value_seq_lengths,
            local_window_size=local_window_size)
    attn_mask = None
    if mask is not None or bias is not None:
        m = mask if mask is not None else bias
        B, Sq = query.shape[0], query.shape[1]
        Sk = key.shape[1]
        attn_mask = jnp.broadcast_to(
            m, (B, m.shape[1] if m.ndim == 4 and m.shape[1] != 1 else 1, Sq, Sk))
    return sageattn(query, key, value, tensor_layout="NHD",
                    is_causal=is_causal, sm_scale=scale, attn_mask=attn_mask,
                    sliding_window=sliding, **kwargs)


def sage_joint_attention_ragged(query, key, value, text_mask,
                                text_len: Optional[int] = None,
                                **sage_kwargs):
    """Mochi-style ragged joint attention: strip per-row PADDED text tokens
    before attending (`/root/reference/example/modify_model/modify_mochi.py
    :76-93` runs a host-side Python loop over batch rows, slicing each
    row's valid prompt tokens and calling attention on the shorter packed
    sequence).  The TPU-native form is ONE static-shape varlen call:

      - the text prefix of every row is permuted invalid-first (a stable
        argsort of the bool mask — a gather, no dynamic shapes);
      - each row becomes two segments of the packed varlen batch: its
        garbage prefix and its real (valid text + video) sequence, via
        traced ``cu_seqlens`` — segment-aware quantization keeps pad
        garbage out of every scale group, and the segment mask replaces
        the reference's per-row loop;
      - outputs return to the original layout (inverse permutation), with
        invalid text positions zeroed (the reference zero-pads too).

    ``query``/``key``/``value``: NHD [B, S, H, D] with the text tokens
    FIRST (this repo's DiT layout), padded to ``text_len`` (defaults to
    ``text_mask.shape[1]``); video tokens after, all valid.
    ``text_mask``: bool [B, text_len], True = real token.
    """
    from ..varlen import sageattn_varlen

    B, S, H, D = query.shape
    T = int(text_mask.shape[1]) if text_len is None else int(text_len)
    if text_mask.shape != (B, T):
        raise ValueError(f"text_mask must be [B={B}, text_len={T}], got "
                         f"{text_mask.shape}")
    order = jnp.argsort(text_mask.astype(jnp.int32), axis=1,
                        stable=True)                       # invalid first
    inv = jnp.argsort(order, axis=1, stable=True)
    n_garbage = (T - jnp.sum(text_mask, axis=1)).astype(jnp.int32)  # [B]

    def compact(x):
        xt = jnp.take_along_axis(x[:, :T], order[:, :, None, None], axis=1)
        return jnp.concatenate([xt, x[:, T:]], axis=1)

    qp, kp, vp = compact(query), compact(key), compact(value)
    starts = jnp.arange(B, dtype=jnp.int32) * S
    # alternating (garbage, real) segment boundaries, then the total
    cu = jnp.concatenate([
        jnp.stack([starts, starts + n_garbage], axis=1).reshape(-1),
        jnp.full((1,), B * S, jnp.int32)])

    def flat(x):
        return x.reshape(B * S, H, D)

    out = sageattn_varlen(flat(qp), flat(kp), flat(vp), cu, cu, S, S,
                          is_causal=False, **sage_kwargs)
    out = out.reshape(B, S, H, D)
    out_t = jnp.take_along_axis(out[:, :T], inv[:, :, None, None], axis=1)
    out_t = jnp.where(text_mask[:, :, None, None], out_t, 0)
    return jnp.concatenate([out_t, out[:, T:]], axis=1).astype(query.dtype)


def layered_attention(default_fn=None, overrides=None, skip_layers=()):
    """Per-layer attention-processor selection — the reference's second
    integration style (`example/modify_model/modify_mochi.py:112-119` swaps
    processors per block and SKIPS fragile layers, e.g. Mochi's last).

    Returns a selector to pass as ``make_dit(attn_fn=...)``: layer ``i``
    runs ``overrides[i]`` if present, the exact jax.nn attention if ``i`` is
    in ``skip_layers``, else ``default_fn`` (sage by default)."""
    default_fn = default_fn or sage_dot_product_attention
    overrides = dict(overrides or {})
    skip = frozenset(skip_layers)

    def select(i: int):
        if i in skip:
            return _ORIG_DOT_PRODUCT_ATTENTION
        return overrides.get(i, default_fn)

    select._per_layer = True
    return select


@contextlib.contextmanager
def patch_jax_nn_attention(**sage_kwargs):
    """Globally replace ``jax.nn.dot_product_attention`` with SageAttention
    for the duration of the context (restores the original on exit)."""
    original = jax.nn.dot_product_attention

    def patched(query, key, value, *args, **kw):
        kw = {**kw, **sage_kwargs}
        return sage_dot_product_attention(query, key, value, *args, **kw)

    jax.nn.dot_product_attention = patched
    try:
        yield
    finally:
        jax.nn.dot_product_attention = original
