"""Quantization front end — pure-JAX (XLA-fused) implementations.

Rebuilds the reference quant layer (`/root/reference/sageattention/quant.py`,
`sageattention/triton/quant_per_block.py`, `quant_per_thread.py`,
`csrc/fused/fused.cu`) as functional jnp code.  These ops are elementwise /
small-reduction and memory-bound; XLA fuses them into adjacent ops, so no
hand-written kernel is needed for them to run at HBM bandwidth.  (A fused
Pallas quant+attention path lives in ``ops/attention.py``.)

Granularity mapping (CUDA warp geometry -> TPU row groups):

  reference ``per_block``  : Q per 128 rows, K per 64 rows
             (`quant.py:22-103`)
  reference ``per_warp``   : Q per 32 rows (BLKQ=128/WARPQ=32), K per 64
             (`quant.py:105-180`)
  reference ``per_thread`` : Q 8 scales per 32-row warp, K 4 scales per
             64-row block (`triton/quant_per_thread.py:21-98`) — i.e.
             Q per 4 rows, K per 16 rows.  The reference interleaves rows to
             match mma fragment ownership; on TPU scale groups are contiguous
             rows (the interleave is a CUDA register-layout artifact with no
             TPU equivalent — accuracy is governed by group *size*).

Scale-shape contract matches the reference: scales are ``[B, H, n_groups]``
float32, symmetric int8 with scale = absmax / 127 and round-to-nearest
(`csrc/fused/fused.cu:160`, `numeric_conversion.cuh:144`).

``sm_scale * log2(e)`` is folded into Q before quantization so the kernel's
softmax runs in base-2 (`triton/quant_per_block.py:87`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.layout import get_layout

LOG2E = 1.4426950408889634

# Granularity name -> (q_group_rows, k_group_rows)
QUANT_GRANULARITIES = {
    "per_block": (128, 64),
    "per_warp": (32, 64),
    "per_thread": (4, 16),
}


def _seq_to_axis2(x, layout):
    """View ``x`` as [B, H, S, D] regardless of layout (transpose is free at
    trace level for these bandwidth-bound ops — XLA folds it into the fused
    quant loop)."""
    if layout.is_hnd:
        return x
    return jnp.swapaxes(x, 1, 2)


def _axis2_to_seq(x, layout):
    if layout.is_hnd:
        return x
    return jnp.swapaxes(x, 1, 2)


def quant_int8_groupwise(
    x,
    group: int,
    fold: float = 1.0,
    sub=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization over groups of ``group`` seq rows.

    ``x``: [B, H, S, D] (HND view).  ``fold`` is multiplied in before
    quantization (sm_scale*log2e folding for Q).  ``sub`` (e.g. the K mean
    [B, H, 1, D]) is subtracted first — the fused ``sub_mean`` path of
    `csrc/fused/fused.cu:594`.

    Returns (x_int8 [B,H,S,D], scales [B,H,S//group] float32).
    """
    B, H, S, D = x.shape
    if S % group != 0:
        raise ValueError(f"seq {S} not a multiple of quant group {group}")
    xf = x.astype(jnp.float32)
    if sub is not None:
        xf = xf - sub.astype(jnp.float32)
    if fold != 1.0:
        xf = xf * fold
    xg = xf.reshape(B, H, S // group, group, D)
    amax = jnp.max(jnp.abs(xg), axis=(3, 4))  # [B, H, nG]
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.rint(xg / safe[..., None, None]), -127, 127).astype(jnp.int8)
    return q.reshape(B, H, S, D), safe


def expand_scales_rows(scales, group: int, seq: int):
    """[B,H,nG] group scales -> [B,H,S,1] per-row scales (kernel contract)."""
    B, H, nG = scales.shape
    assert nG * group == seq, (nG, group, seq)
    return jnp.repeat(scales, group, axis=2)[..., None]


def expand_scales_cols(scales, group: int, seq: int):
    """[B,H,nG] group scales -> [B,H,1,S] per-column scales."""
    B, H, nG = scales.shape
    assert nG * group == seq, (nG, group, seq)
    return jnp.repeat(scales, group, axis=2)[:, :, None, :]


def _quant_qk(q, k, km, sm_scale, q_group, k_group, tensor_layout):
    layout = get_layout(tensor_layout)
    qh = _seq_to_axis2(q, layout)
    kh = _seq_to_axis2(k, layout)
    if sm_scale is None:
        sm_scale = 1.0 / (qh.shape[-1] ** 0.5)
    q_i8, q_s = quant_int8_groupwise(qh, q_group, fold=sm_scale * LOG2E)
    k_i8, k_s = quant_int8_groupwise(kh, k_group, sub=km)
    return (
        _axis2_to_seq(q_i8, layout),
        q_s,
        _axis2_to_seq(k_i8, layout),
        k_s,
    )


def per_block_int8(q, k, km=None, sm_scale=None, BLKQ: int = 128, BLKK: int = 64,
                   tensor_layout: str = "HND"):
    """Per-(128/64)-row-block symmetric int8 quant of Q and K.

    Mirrors `/root/reference/sageattention/quant.py:22-103` /
    `triton/quant_per_block.py:49-101`; ``km`` is the K mean [B,H,1,D] (HND
    view) for smoothing, subtracted before quantizing K.
    Returns (q_int8, q_scale [B,H,S/BLKQ], k_int8, k_scale [B,H,S/BLKK]).
    """
    return _quant_qk(q, k, km, sm_scale, BLKQ, BLKK, tensor_layout)


def per_warp_int8(q, k, km=None, sm_scale=None, BLKQ: int = 128, WARPQ: int = 32,
                  BLKK: int = 64, tensor_layout: str = "HND"):
    """Q quantized per 32-row group, K per 64-row block
    (`/root/reference/sageattention/quant.py:105-180`)."""
    del BLKQ
    return _quant_qk(q, k, km, sm_scale, WARPQ, BLKK, tensor_layout)


def per_thread_int8(q, k, km=None, sm_scale=None, BLKQ: int = 128, WARPQ: int = 32,
                    BLKK: int = 64, WARPK: int = 64, tensor_layout: str = "HND"):
    """Finest granularity: Q per 4 rows, K per 16 rows — the TPU equivalent
    of the reference's per-thread scales (8 per 32-row Q warp, 4 per 64-row
    K block, `/root/reference/sageattention/triton/quant_per_thread.py`)."""
    del BLKQ, WARPQ, BLKK, WARPK
    qg, kg = QUANT_GRANULARITIES["per_thread"]
    return _quant_qk(q, k, km, sm_scale, qg, kg, tensor_layout)


def k_mean(k, tensor_layout: str = "HND"):
    """Mean of K over the sequence axis, [B, H, 1, D] in HND view — the
    ``km`` used by smooth_k (`/root/reference/sageattention/core.py:772-788`)."""
    layout = get_layout(tensor_layout)
    kh = _seq_to_axis2(k, layout)
    return jnp.mean(kh.astype(jnp.float32), axis=2, keepdims=True)


def sub_mean(v, tensor_layout: str = "HND"):
    """V smoothing: returns (v - mean_seq(v) as bf16, vm [B,H,1,D]).

    Equivalent of `/root/reference/sageattention/quant.py:182-222`
    (`SubMeanKernel`, `csrc/fused/fused.cu:200-260`).
    """
    layout = get_layout(tensor_layout)
    vh = _seq_to_axis2(v, layout)
    vm = jnp.mean(vh.astype(jnp.float32), axis=2, keepdims=True)
    v_sm = (vh.astype(jnp.float32) - vm).astype(jnp.bfloat16)
    return _axis2_to_seq(v_sm, layout), vm


def per_channel_fp8(v, tensor_layout: str = "HND", scale_max: float = 448.0,
                    smooth_v: bool = True):
    """Per-head-dim-channel FP8 (e4m3) quantization of V.

    Equivalent of `/root/reference/sageattention/quant.py:224-293`
    (`MeanScaleKernel`, `csrc/fused/fused.cu:316-427`), minus the physical
    (B,H,D,L) transpose — on TPU ``dot_general`` contracts the seq dimension
    directly, so V stays in its natural layout.

    Returns (v_fp8 same layout, v_scale [B,H,D] f32, vm [B,H,1,D] or None).
    """
    layout = get_layout(tensor_layout)
    vh = _seq_to_axis2(v, layout).astype(jnp.float32)
    vm = None
    if smooth_v:
        vm = jnp.mean(vh, axis=2, keepdims=True)
        vh = vh - vm
    amax = jnp.max(jnp.abs(vh), axis=2)  # [B, H, D]
    scale = amax / scale_max
    safe = jnp.where(scale > 0, scale, 1.0)
    v_q = (vh / safe[:, :, None, :]).astype(jnp.float8_e4m3fn)
    return _axis2_to_seq(v_q, layout), safe, vm


def per_channel_int8(v, tensor_layout: str = "HND", smooth_v: bool = True):
    """Per-head-dim-channel symmetric int8 quantization of V (TPU-native
    addition: v5e has no fast fp8 MXU path, but int8 runs at 2x bf16, so the
    lowest-bit PV mode on this hardware is int8 x int8).

    Returns (v_int8 same layout, v_scale [B,H,D] f32, vm [B,H,1,D] or None).
    """
    layout = get_layout(tensor_layout)
    vh = _seq_to_axis2(v, layout).astype(jnp.float32)
    vm = None
    if smooth_v:
        vm = jnp.mean(vh, axis=2, keepdims=True)
        vh = vh - vm
    amax = jnp.max(jnp.abs(vh), axis=2)
    scale = amax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    v_q = jnp.clip(jnp.rint(vh / safe[:, :, None, :]), -127, 127).astype(jnp.int8)
    return _axis2_to_seq(v_q, layout), safe, vm


def _segmented_group_amax(a, seg, group: int):
    """Per-row segment-confined group amax.

    ``a``: [B, H, S] per-row absmax; ``seg``: [S] int32 segment ids forming
    contiguous runs (packed varlen buffer).  Returns [B, H, S] where row t
    carries ``max(a[u])`` over rows u in the same ``group``-row block AND
    the same segment — so a quant group straddling a sequence boundary no
    longer couples one request's scales to a neighbor's outliers (the
    reference avoids this by starting fresh scale blocks per sequence,
    `triton/quant_per_block_varlen.py:72-76`; with TPU static shapes we
    confine the group amax instead).

    Segments are contiguous, so within each group the same-segment rows
    around row t form one run: two segmented cummax scans (forward +
    backward, resetting at segment boundaries) cover it in O(log group).
    """
    B, H, S = a.shape
    assert S % group == 0, (S, group)
    nG = S // group
    ag = a.reshape(B, H, nG, group)
    sg = jnp.asarray(seg).reshape(nG, group)
    # b[i] = run boundary between rows i-1 and i inside the group (b[0]=True)
    b = jnp.concatenate(
        [jnp.ones((nG, 1), bool), sg[:, 1:] != sg[:, :-1]], axis=1)

    def comb(x, y):
        mx, rx = x
        my, ry = y
        return jnp.where(ry, my, jnp.maximum(mx, my)), rx | ry

    bb = jnp.broadcast_to(b, ag.shape)
    fwd, _ = jax.lax.associative_scan(comb, (ag, bb), axis=3)
    # reversed-order scan: run starts where the ORIGINAL boundary sits one
    # step to the right — reverse(b[1:]) prefixed with True
    b_rev = jnp.concatenate(
        [jnp.ones((nG, 1), bool), b[:, 1:][:, ::-1]], axis=1)
    bb_rev = jnp.broadcast_to(b_rev, ag.shape)
    bwd_rev, _ = jax.lax.associative_scan(
        comb, (ag[..., ::-1], bb_rev), axis=3)
    bwd = bwd_rev[..., ::-1]
    return jnp.maximum(fwd, bwd).reshape(B, H, S)


def quant_int8_groupwise_segmented(x, seg, group: int, fold: float = 1.0,
                                   sub=None):
    """Segment-aware variant of :func:`quant_int8_groupwise` for packed
    varlen buffers: same group geometry, but each row's scale is the amax
    over (group ∩ segment), so scales never cross sequence boundaries and
    padding rows (ids -1/-2) get their own scales.

    Returns (x_int8 [B,H,S,D], per-ROW scales [B,H,S] float32).
    """
    B, H, S, D = x.shape
    xf = x.astype(jnp.float32)
    if sub is not None:
        xf = xf - sub.astype(jnp.float32)
    if fold != 1.0:
        xf = xf * fold
    a = jnp.max(jnp.abs(xf), axis=3)                  # [B, H, S]
    amax = _segmented_group_amax(a, seg, group)
    scale = amax * (1.0 / 127.0)
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.rint(xf / safe[..., None]), -127, 127).astype(jnp.int8)
    return q, safe


def dequant_int8_groupwise(x_i8, scales, group: int):
    """Inverse of :func:`quant_int8_groupwise` (testing only)."""
    B, H, S, D = x_i8.shape
    xs = x_i8.astype(jnp.float32).reshape(B, H, S // group, group, D)
    return (xs * scales[..., None, None]).reshape(B, H, S, D)
