"""Variable-length (ragged-batch) attention.

Rebuilds ``sageattn_varlen`` (`/root/reference/sageattention/core.py:334-448`
and the varlen Triton kernels `triton/attn_qk_int8_block_varlen.py`,
`triton/quant_per_block_varlen.py`).

The reference indexes ragged rows through ``cu_seqlens`` pointers — dynamic
indexing that is hostile to XLA's static shapes.  The idiomatic TPU
equivalent (splash-attention style) is **segment IDs**: the packed token
buffer is one long sequence, each token labeled with its sequence index, and
the kernel masks cross-segment attention.  The public ``cu_seqlens``
signature is preserved and converted internally.

Notes kept from the reference:
  - K smoothing uses the mean over the *whole packed batch*, the same
    documented approximation as `core.py:429-434`.
  - per-sequence causal masking == global causal mask AND segment mask,
    because sequences are contiguous in the packed buffer.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from . import dispatch
from .ops import quant as quant_ops
from .ops.attention import AttnConfig, attention_call
from .utils.layout import pad_axis, round_up

LOG2E = quant_ops.LOG2E


def cu_seqlens_to_segment_ids(cu_seqlens, total_padded: int):
    """[n_seq+1] cumulative lengths -> [total_padded] int32 segment ids.

    Tokens past the last sequence get id ``n_seq`` (a real id never matched
    against because the other side's padding gets ``-1``... see callers).
    """
    pos = jnp.arange(total_padded, dtype=jnp.int32)
    # segment of token t = number of boundaries <= t, minus 1
    seg = jnp.searchsorted(cu_seqlens.astype(jnp.int32), pos, side="right") - 1
    return seg.astype(jnp.int32)


def sageattn_varlen(
    q,
    k,
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int = 0,
    max_seqlen_k: int = 0,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    smooth_k: bool = True,
    qk_quant_gran: str = "per_block",
    pv_dtype: Optional[str] = None,
    return_lse: bool = False,
    **kwargs: Any,
):
    """Ragged-batch SageAttention.

    ``q``: [total_q, Hq, D]; ``k``/``v``: [total_k, Hk, D] (packed NHD minus
    batch, as in the reference).  ``cu_seqlens_q/k``: [n_seq+1] int32
    cumulative sequence starts, first element 0, last element total length.
    ``max_seqlen_*`` are accepted for signature parity (unused — TPU shapes
    are static).  Returns [total_q, Hq, D] (+ lse [Hq, total_q] if asked).
    """
    del max_seqlen_q, max_seqlen_k
    Tq, Hq, D_og = q.shape
    Tk, Hk, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D_og ** 0.5)
    interpret = kwargs.pop("interpret", None)
    if interpret is None:
        interpret = dispatch.default_interpret()
    caps = dispatch.detect()
    if pv_dtype is None:
        pv_dtype = caps.default_pv_dtype
    compute_dtype = kwargs.pop("compute_dtype", caps.default_compute_dtype)
    if compute_dtype == "bf16" and pv_dtype == "fp8":
        pv_dtype = "int8"

    from .core import _choose_blocks
    Tq_pad = round_up(Tq, 128)
    Tk_pad = round_up(Tk, 128)
    block_q, block_k, block_k_inner = _choose_blocks(
        Tq_pad, Tk_pad, quantized=True, compute_dtype=compute_dtype)

    # Pack as B=1 HND: [total, H, D] -> [1, H, total_pad, D].
    qb = jnp.swapaxes(pad_axis(q[None], 1, Tq_pad), 1, 2)
    kb = jnp.swapaxes(pad_axis(k[None], 1, Tk_pad), 1, 2)
    vb = jnp.swapaxes(pad_axis(v[None], 1, Tk_pad), 1, 2)
    d_target = 64 if D_og <= 64 else (128 if D_og <= 128 else 256)
    qb = pad_axis(qb, 3, d_target)
    kb = pad_axis(kb, 3, d_target)
    vb = pad_axis(vb, 3, d_target)

    q_seg = cu_seqlens_to_segment_ids(cu_seqlens_q, Tq_pad)
    kv_seg = cu_seqlens_to_segment_ids(cu_seqlens_k, Tk_pad)
    # padding tokens must never match: q padding -> -1, kv padding -> -2
    q_seg = jnp.where(jnp.arange(Tq_pad) < Tq, q_seg, -1)
    kv_seg = jnp.where(jnp.arange(Tk_pad) < Tk, kv_seg, -2)

    # Whole-batch K mean (reference approximation, `core.py:429-434`) —
    # computed over real tokens only.
    km = None
    if smooth_k:
        kh = kb.astype(jnp.float32)  # [1, Hk, Tk_pad, D]
        valid = (jnp.arange(Tk_pad) < Tk)[None, None, :, None]
        km = jnp.sum(kh * valid, axis=2, keepdims=True) / jnp.maximum(Tk, 1)

    q_group, k_group = quant_ops.QUANT_GRANULARITIES[qk_quant_gran]
    fold_k = compute_dtype == "bf16"
    if fold_k:
        k_group = Tk_pad  # per-head K scale, folded into q_scale
    q_i8, q_s, k_i8, k_s = quant_ops._quant_qk(
        qb, kb, km, sm_scale, q_group, k_group, "HND")
    q_scale = quant_ops.expand_scales_rows(q_s, q_group, Tq_pad)
    if fold_k:
        ks_head = k_s[:, :, 0]
        if Hq != Hk:
            ks_head = jnp.repeat(ks_head, Hq // Hk, axis=1)
        q_scale = q_scale * ks_head[:, :, None, None]
        k_scale = None
    else:
        k_scale = quant_ops.expand_scales_cols(k_s, k_group, Tk_pad)

    v_scale = None
    vm = None
    if pv_dtype == "bf16":
        v_in = vb.astype(jnp.bfloat16)
    elif pv_dtype == "int8":
        v_in, vs, vm = quant_ops.per_channel_int8(vb, "HND", smooth_v=True)
        v_scale = vs[:, :, None, :]
    elif pv_dtype == "fp8":
        v_in, vs, vm = quant_ops.per_channel_fp8(vb, "HND", smooth_v=True)
        v_scale = vs[:, :, None, :]
    else:
        raise ValueError(f"unknown pv_dtype {pv_dtype!r}")

    cfg = AttnConfig(
        block_q=block_q, block_k=block_k, block_k_inner=block_k_inner,
        causal=is_causal, quantized=True,
        pv_dtype=pv_dtype, layout="HND", kv_len=Tk_pad,  # tail masked by segments
        out_dtype=q.dtype, segmented=True,
        compute_dtype=compute_dtype, fold_k_scale=fold_k,
    )
    out, lse_b2 = attention_call(
        q_i8, k_i8, v_in, q_scale, k_scale, v_scale,
        q_segments=q_seg[None, :, None],
        kv_segments=kv_seg[None, None, :],
        cfg=cfg, interpret=interpret,
    )

    if vm is not None:
        vm_l = vm  # [1, Hk, 1, D]
        if Hq != Hk:
            vm_l = jnp.repeat(vm_l, Hq // Hk, axis=1)
        out = (out.astype(jnp.float32) + vm_l).astype(out.dtype)

    out = jnp.swapaxes(out[0], 0, 1)[:Tq, :, :D_og]  # [Tq, Hq, D]
    if not return_lse:
        return out
    lse = lse_b2[0][..., :Tq] / LOG2E  # [Hq, Tq]
    if smooth_k:
        qh = qb[0, :, :Tq].astype(jnp.float32)  # [Hq, Tq, D]
        kmh = km[0] if km.shape[1] == Hq else jnp.repeat(km[0], Hq // Hk, axis=0)
        lse = lse + jnp.einsum("hsd,hod->hs", qh, kmh.astype(jnp.float32)) * sm_scale
    return out, lse
