"""Pure-jnp attention oracle.

This is the ground truth every kernel is tested against — the role played in
the reference by ``torch.nn.functional.scaled_dot_product_attention`` (its
examples compare generated videos against SDPA output; the accuracy metric
is 1 - cosine-sim from `/root/reference/bench/utils.py:140-144`).

All math here is float32 (or configurable), no tiling, O(S^2) memory —
correctness only, never used on the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(
    q,
    k,
    v,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    dtype=jnp.float32,
    return_lse: bool = False,
    q_start: int = 0,
    kv_start: int = 0,
    segment_ids_q=None,
    segment_ids_k=None,
    mask=None,
):
    """Reference scaled-dot-product attention.

    Inputs are HND: ``q [B, Hq, Sq, D]``, ``k/v [B, Hk, Sk, D]``.
    GQA: Hq must be a multiple of Hk; KV heads are broadcast.
    ``q_start``/``kv_start`` offset the causal diagonal (used to check ring
    attention shards).  ``segment_ids_*`` restrict attention within segments
    (the varlen oracle).

    Returns ``out`` (and natural-log ``lse [B, Hq, Sq]`` if requested —
    matching the reference's lse semantics, `core.py:120-133`).
    """
    B, Hq, Sq, D = q.shape
    _, Hk, Sk, _ = k.shape
    assert Hq % Hk == 0, "num_qo_heads must be divisible by num_kv_heads"
    group = Hq // Hk
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)

    qf = q.astype(dtype)
    kf = k.astype(dtype)
    vf = v.astype(dtype)
    if group > 1:
        kf = jnp.repeat(kf, group, axis=1)
        vf = jnp.repeat(vf, group, axis=1)

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale

    neg = jnp.asarray(jnp.finfo(dtype).min * 0.5, dtype)
    if is_causal:
        rows = jnp.arange(Sq)[:, None] + q_start
        cols = jnp.arange(Sk)[None, :] + kv_start
        s = jnp.where(cols <= rows, s, neg)
    if segment_ids_q is not None:
        seg_mask = segment_ids_q[..., :, None] == segment_ids_k[..., None, :]
        while seg_mask.ndim < s.ndim:
            seg_mask = seg_mask[:, None]
        s = jnp.where(seg_mask, s, neg)
    if mask is not None:
        # bool: keep-where-true; float: additive bias (natural-log units)
        if mask.dtype == jnp.bool_:
            s = jnp.where(mask, s, neg)
        else:
            s = s + mask.astype(dtype)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p / jnp.maximum(l, 1e-30), vf)
    out = out.astype(q.dtype)
    if return_lse:
        lse = (m + jnp.log(jnp.maximum(l, 1e-30)))[..., 0]
        return out, lse
    return out


def sdpa_nhd(q, k, v, **kwargs):
    """Oracle for NHD layout ``[B, S, H, D]`` inputs."""
    r = sdpa(
        jnp.swapaxes(q, 1, 2),
        jnp.swapaxes(k, 1, 2),
        jnp.swapaxes(v, 1, 2),
        **kwargs,
    )
    if isinstance(r, tuple):
        return jnp.swapaxes(r[0], 1, 2), r[1]
    return jnp.swapaxes(r, 1, 2)
