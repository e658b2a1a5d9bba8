"""SageAttention3-style microscaled low-bit quantization (FP4/INT4 class).

Rebuilds the algorithms of `/root/reference/sageattention3_blackwell/`:

  - micro-scaled FP4: one scale per 16-element vector, values on the e2m1
    grid {0, ±0.5, ±1, ±1.5, ±2, ±3, ±4, ±6}, scale = amax/6
    (`sageattn3/quantization/fp4_quantization_4d.cu:196-204`)
  - Q per-128-token-block mean subtraction with the correction matrix
    ``delta_s = q_mean @ K^T`` added back to the scores inside attention
    (`sageattn3/api.py:75-92`), plus the usual K mean-centering
  - two-level scaling: the P tile re-quantized to FP4 with a per-tile absmax
    fused into the softmax (`softmax_fused.h:28`) — here represented by the
    same exp2-offset machinery the fp8 path uses.

Hardware status (v5e, measured): the MXU has no FP4/INT4 matmul rate
advantage — ``jnp.int4`` dots lower but run at int8-or-worse speed, and
e2m1 does not exist as a dtype.  The value of this module on current TPUs is
therefore *algorithmic parity and accuracy research*: `sageattn3` computes
attention under exact FP4 quantization semantics (simulated on the e2m1
grid) so accuracy can be validated now and the kernel swapped in when a TPU
generation exposes a native 4-bit MXU path (see dispatch.TpuCapabilities).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# e2m1 representable magnitudes
E2M1_GRID = jnp.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], jnp.float32)
E2M1_MAX = 6.0
MICROSCALE_BLOCK = 16  # elements per scale factor (fp4_quantization_4d.cu)


def _round_to_e2m1(x):
    """Round to nearest e2m1 value (magnitude grid, sign preserved)."""
    mag = jnp.abs(x)
    # nearest-neighbour on the 8-point grid via midpoint thresholds
    mids = (E2M1_GRID[:-1] + E2M1_GRID[1:]) / 2.0  # 7 thresholds
    idx = jnp.sum(mag[..., None] > mids, axis=-1)
    return jnp.sign(x) * E2M1_GRID[idx]


def quant_fp4_microscaled(x, block: int = MICROSCALE_BLOCK):
    """Micro-scaled FP4 quantization along the last axis.

    Returns (codes, scales): ``codes`` are e2m1 values stored in bf16 (the
    simulation carrier; a native path would pack 2 codes/byte), ``scales``
    one f32 per ``block`` elements, scale = amax/6.
    """
    *lead, D = x.shape
    assert D % block == 0, (D, block)
    xb = x.astype(jnp.float32).reshape(*lead, D // block, block)
    amax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / E2M1_MAX, 1.0)
    codes = _round_to_e2m1(xb / scale)
    return (codes.reshape(*lead, D).astype(jnp.bfloat16),
            scale[..., 0].astype(jnp.float32))


def dequant_fp4_microscaled(codes, scales, block: int = MICROSCALE_BLOCK):
    *lead, D = codes.shape
    cb = codes.astype(jnp.float32).reshape(*lead, D // block, block)
    return (cb * scales[..., None]).reshape(*lead, D)


def q_block_mean_center(q, block: int = 128):
    """Subtract the per-128-token-block mean from Q (api.py:75-92).

    Returns (q_centered, q_means [.., n_blocks, D]).  The removed component
    is restored inside attention via ``delta_s = q_mean @ K^T`` (each q row
    in block b gets the same correction row).
    """
    B, H, S, D = q.shape
    assert S % block == 0
    qb = q.astype(jnp.float32).reshape(B, H, S // block, block, D)
    qm = jnp.mean(qb, axis=3, keepdims=True)
    return (qb - qm).reshape(B, H, S, D), qm[:, :, :, 0]


def sageattn3(
    q,
    k,
    v,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    q_block: int = 128,
):
    """FP4-microscaled attention with exact SageAttention3 quantization
    semantics (simulated grid; see module docstring for hardware status).

    HND inputs [B, H, S, D].  Pipeline (mirrors `sageattn3/api.py:131-152`):
      k <- k - mean(k); (q, qm) <- block-mean-center(q);
      FP4-quantize q, k, v (per-16 microscales);
      s = dq(q4) @ dq(k4)^T * scale + delta_s;  softmax;  out = p @ dq(v4).
    """
    B, H, Sq, D_og = q.shape
    Sk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (D_og ** 0.5)
    pad_d = (-D_og) % MICROSCALE_BLOCK
    if pad_d:
        pads = ((0, 0), (0, 0), (0, 0), (0, pad_d))
        q, k, v = (jnp.pad(x.astype(jnp.float32), pads) for x in (q, k, v))
    D = D_og + pad_d

    kf = k.astype(jnp.float32)
    km = jnp.mean(kf, axis=2, keepdims=True)
    kc = kf - km

    pad_q = (-Sq) % q_block
    qp = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    qc, qm = q_block_mean_center(qp, q_block)

    q4, qs = quant_fp4_microscaled(qc)
    k4, ks = quant_fp4_microscaled(kc)
    v4, vs = quant_fp4_microscaled(v)

    qd = dequant_fp4_microscaled(q4, qs)[:, :, :Sq]
    kd = dequant_fp4_microscaled(k4, ks)
    vd = dequant_fp4_microscaled(v4, vs)

    s = jnp.einsum("bhqd,bhkd->bhqk", qd, kd)
    # delta_s: restore the removed q block-mean (fp32, not quantized —
    # `mainloop_tma_ws.h:691-718`); row r in q-block b gets qm[b] @ k^T.
    delta = jnp.einsum("bhnd,bhkd->bhnk", qm[..., :, :], kc)
    delta_rows = jnp.repeat(delta, q_block, axis=2)[:, :, :Sq]
    s = (s + delta_rows) * sm_scale

    if is_causal:
        rows = jnp.arange(Sq)[:, None]
        cols = jnp.arange(Sk)[None, :]
        s = jnp.where(cols <= rows, s, -1e30)

    p = jax.nn.softmax(s, axis=-1)
    # P itself is FP4-quantized in the reference (two-level scaling); apply
    # the same semantics: per-16-col microscale on P (padded to /16; zero
    # pads quantize to zero and contribute nothing).
    pad_p = (-Sk) % MICROSCALE_BLOCK
    pp = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, pad_p)))
    p4, ps = quant_fp4_microscaled(pp)
    pd = dequant_fp4_microscaled(p4, ps)[..., :Sk]
    pd = pd / jnp.maximum(jnp.sum(pd, axis=-1, keepdims=True), 1e-30)
    out = jnp.einsum("bhqk,bhkd->bhqd", pd, vd)[..., :D_og]
    return out.astype(q.dtype)


def sageattn3_tiled(
    q,
    k,
    v,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    q_block: int = 128,
    block_q: int = 0,
    block_k: int = 0,
    interpret: Optional[bool] = None,
):
    """Kernel-backed SageAttention3 simulation: O(S) memory via the Pallas
    flash kernel, so FP4-semantics accuracy can be evaluated at real model
    lengths (the pure-jnp :func:`sageattn3` materializes the S^2 score
    matrix).

    Same quantization semantics as :func:`sageattn3` with two deliberate
    deviations, both documented against the reference:
      - the removed q block-mean is folded back into the dequantized Q
        carrier before the kernel (algebraically ``qc @ k^T + qm @ k^T`` =
        ``(qc + qm) @ k^T`` — the reference adds ``delta_s`` to the score
        tile instead, `mainloop_tma_ws.h:691-718`; folding is exact up to
        bf16 carrier rounding),
      - P is re-quantized per (row, KV-tile) absmax rather than per-16
        vector (the reference fuses a per-tile AbsMax,
        `softmax_fused.h:28`); granularity is comparable and the rowsum
        normalization uses the quantized P either way.
    """
    from .attention import AttnConfig, attention_call
    from .. import dispatch as _dispatch

    B, H, Sq, D_og = q.shape
    Sk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / (D_og ** 0.5)
    if interpret is None:
        interpret = _dispatch.default_interpret()

    d_target = 64 if D_og <= 64 else (128 if D_og <= 128 else 256)
    pads = ((0, 0), (0, 0), (0, 0), (0, d_target - D_og))
    qf = jnp.pad(q.astype(jnp.float32), pads)
    kf = jnp.pad(k.astype(jnp.float32), pads)
    vf = jnp.pad(v.astype(jnp.float32), pads)

    km = jnp.mean(kf, axis=2, keepdims=True)
    kc = kf - km

    pad_q = (-Sq) % q_block
    qp = jnp.pad(qf, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    qc, qm = q_block_mean_center(qp, q_block)

    q4, qs = quant_fp4_microscaled(qc)
    k4, ks = quant_fp4_microscaled(kc)
    v4, vs = quant_fp4_microscaled(vf)
    qd = dequant_fp4_microscaled(q4, qs)
    kd = dequant_fp4_microscaled(k4, ks)
    vd = dequant_fp4_microscaled(v4, vs)
    # fold the (unquantized, fp32) q block-mean back into the Q carrier
    qd = (qd + jnp.repeat(qm, q_block, axis=2))[:, :, :Sq + pad_q]

    from ..core import _choose_blocks
    from ..utils.layout import pad_axis, round_up
    if block_q and block_k:
        bq, bk, bki = block_q, block_k, block_k
    else:
        bq, bk, bki = _choose_blocks(Sq, Sk, quantized=False)
    Sq_pad = round_up(Sq, bq)
    Sk_pad = round_up(Sk, bk)
    qd = pad_axis(qd[:, :, :Sq], 2, Sq_pad).astype(jnp.bfloat16)
    kd = pad_axis(kd, 2, Sk_pad).astype(jnp.bfloat16)
    vd = pad_axis(vd, 2, Sk_pad).astype(jnp.bfloat16)

    cfg = AttnConfig(
        block_q=bq, block_k=bk, block_k_inner=bki, causal=is_causal,
        quantized=False, layout="HND", sm_scale=sm_scale, kv_len=Sk,
        out_dtype=jnp.bfloat16, p_sim_fp4=True,
    )
    out, _ = attention_call(qd, kd, vd, cfg=cfg, interpret=interpret)
    return out[:, :, :Sq, :D_og].astype(q.dtype)


def sageattn3_blackwell(q, k, v, *args, **kwargs):
    """Reference-name alias (`sageattn3/__init__.py:16`).  Uses the tiled
    kernel path (O(S) memory) — the jnp simulation stays available as
    :func:`sageattn3` for cross-checking."""
    kwargs.pop("qk_quant_gran", None)
    return sageattn3_tiled(q, k, v, *args, **kwargs)
