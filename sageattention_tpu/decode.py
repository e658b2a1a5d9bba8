"""Int8 KV-cache decode attention (serving path).

Beyond the reference's scope (thu-ml/SageAttention is prefill-only —
`/root/reference/sageattention/core.py` has no cache/decode entry), but the
natural completion of a quantized-attention framework for production
serving: token-by-token decode is HBM-bandwidth-bound (each step streams
the whole K/V cache past one query row), so int8 cache storage is worth up
to 2x decode latency on byte count alone — the same storage-rate argument
that drives the prefill flagship (docs/PERF_NOTES.md anatomy table).

TPU-first design decisions:

- **Per-token K scales** (the kernel's native "fine" per-col granularity,
  `ops/attention.py:630`): an append-only cache must never rescale old
  codes, and a per-token scale is exact for any future growth.  The fixed
  K mean (smooth_k) is subtracted at quantization time; softmax shift
  invariance makes any FIXED centering exact, so the prefill mean keeps
  working as the cache grows.
- **Per-channel V scale with a growth margin**: the kernel applies V scales
  per channel in the epilogue (`ops/attention.py:530-536`); channel-wise V
  ranges are stable over decode steps, so the prefill amax with a margin
  (default 1.25x) covers later tokens; out-of-range values clip (graceful:
  P-weighted, so the output error is bounded by the clipped excess).  Pass
  ``v_quant=False`` at init for a bf16 V cache (no clipping risk; K-side
  byte win only).
- **Static bucket slicing**: ``kv_true`` is an SMEM scalar — the kernel
  skips *compute* past the true length dynamically, but DMA volume follows
  the gridded extent.  Decode therefore takes a static ``bucket`` (rounded
  cache view); under jit each bucket is its own compiled shape, the
  standard TPU serving pattern (shape bucketing), and DMA grows with the
  bucket instead of the full preallocated cache.
- **GQA head folding (T=1)**: all G query heads sharing a KV head attend
  the same cache rows with no mask between them, so they fold into the Q
  *tile* ((B,Hq,1,D) -> (B,Hk,G,D)) — the KV stream is fetched once per KV
  head instead of once per query head: a G-fold DMA saving exactly where
  decode is bound.
- Q rides the in-kernel per-row quantization (``fuse_q_quant``) — no
  standalone quant launch on the latency-critical path.

Decode runs the online softmax: with 8-32 query rows the VPU softmax work
per KV tile is negligible next to the K/V stream, so the static-cap
machinery (a prefill win) buys nothing here.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import dispatch
from .ops.attention import AttnConfig, attention_call
from .utils.layout import get_layout, pad_axis, round_up

_LANES = 128
_BQ = 32          # int8 Q scratch min sublane tile (32, 128)
# 2048-col KV tiles: the r4 sweeps (SAGE_BK_SWEEP; probe_decode_split.py
# with whole-tile dots + kv_split) put 2048 at or within noise of the best
# (877 us wall @16K vs 919 at 4096, 1031 at 1024).  The tile is a CAP,
# applied only when the bucket is large enough; bucket granularity stays
# 512 so short caches keep r3's footprint and numerics (a 2048-min bucket
# quadrupled tiny caches and flipped near-tie argmaxes under the bigger
# masked tile).
_BK_DEFAULT = 2048
_BUCKET_DEFAULT = 512


FP8_SCALE_MAX = 448.0   # e4m3 max-normal; reference per-channel fp8 V fills
#                         the full range (`/root/reference/csrc/fused/fused.cu`
#                         MeanScaleKernel scale_max=448)


class KVCache(NamedTuple):
    """Quantized KV cache (a pytree — jit/scan/donate friendly).

    All buffers are HND with a static ``max_len`` sequence extent; ``length``
    is the filled prefix (shared across the batch — synchronized decode).
    V is int8 / float8_e4m3fn / bf16 per the init's ``v_format`` (dtype
    carries the mode; no flag leaf to confuse tracing).
    """

    k8: jax.Array        # [B, Hk, Smax, D] int8 (centered by km)
    k_scale: jax.Array   # [B, Hk, 1, Smax] f32 per-token
    v: jax.Array         # [B, Hk, Smax, D] int8/fp8 (centered by vm) or bf16
    v_scale: jax.Array   # [B, Hk, 1, D] f32 per-channel (quantized V; ones if bf16)
    v_mean: jax.Array    # [B, Hk, 1, D] f32 (zeros when smooth_v=False)
    k_mean: jax.Array    # [B, Hk, 1, D] f32 (zeros when smooth_k=False)
    length: jax.Array    # () int32 filled length

    @property
    def max_len(self) -> int:
        return self.k8.shape[2]

    @property
    def v_int8(self) -> bool:
        return self.v.dtype == jnp.int8

    @property
    def v_fp8(self) -> bool:
        return self.v.dtype == jnp.float8_e4m3fn


def _quant_k(k, km, eps=1e-8):
    """Center by the fixed mean, per-token int8: returns (k8, ks[B,H,1,S])."""
    kc = k.astype(jnp.float32) - km
    a = jnp.max(jnp.abs(kc), axis=-1, keepdims=True)        # [B,H,S,1]
    ks = jnp.where(a > eps, a * (1.0 / 127.0), 1.0)
    k8 = jnp.clip(jnp.rint(kc / ks), -127, 127).astype(jnp.int8)
    return k8, jnp.swapaxes(ks, 2, 3)                        # [B,H,1,S]


def _quant_v(v, vm, vs, dtype=jnp.int8):
    vc = v.astype(jnp.float32) - vm
    if dtype == jnp.float8_e4m3fn:
        # clip before the cast: XLA's f32->e4m3fn convert is not guaranteed
        # to saturate (e4m3fn has no inf — overflow can read back as nan)
        return jnp.clip(vc / vs, -FP8_SCALE_MAX, FP8_SCALE_MAX
                        ).astype(jnp.float8_e4m3fn)
    return jnp.clip(jnp.rint(vc / vs), -127, 127).astype(jnp.int8)


def _v_format(v_quant, v_format):
    """Resolve the V storage mode: 'int8' (default), 'fp8'
    (float8_e4m3fn codes — turn-key for fast-fp8 generations; on chips
    that emulate fp8 this is a numerics-parity mode, no perf claim), or
    'bf16'.  ``v_quant=False`` is the legacy spelling of 'bf16'."""
    if v_format is None:
        v_format = "int8" if v_quant else "bf16"
    if v_format not in ("int8", "fp8", "bf16"):
        raise ValueError(f"v_format must be int8|fp8|bf16, got {v_format!r}")
    return v_format


def kv_cache_init(
    k,
    v,
    max_len: int,
    *,
    tensor_layout: str = "HND",
    smooth_k: bool = True,
    smooth_v: bool = True,
    v_quant: bool = True,
    v_margin: float = 1.25,
    v_format: Optional[str] = None,
) -> KVCache:
    """Quantize prefill K/V into a cache preallocated to ``max_len``.

    ``v_margin`` stretches the per-channel V scale beyond the prefill amax
    so later tokens rarely clip; raise it (or set ``v_quant=False``) for
    workloads whose V magnitudes drift upward during generation.
    ``v_format``: 'int8' (default) | 'fp8' (float8_e4m3fn codes, the
    reference sm89 per-channel fp8-V semantics — decode then runs the
    exp-offset fp8 PV path, native-rate on has_fast_fp8 generations,
    numerics-parity elsewhere) | 'bf16' (= v_quant=False).
    """
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    B, Hk, S, D = k.shape
    if v.shape != k.shape:
        raise ValueError(f"k and v shapes must match, got {k.shape} vs {v.shape}")
    if max_len < S:
        raise ValueError(f"max_len ({max_len}) < prefill length ({S})")
    max_len = round_up(max_len, _LANES)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    km = (jnp.mean(kf, axis=2, keepdims=True) if smooth_k
          else jnp.zeros((B, Hk, 1, D), jnp.float32))
    vm = (jnp.mean(vf, axis=2, keepdims=True) if smooth_v
          else jnp.zeros((B, Hk, 1, D), jnp.float32))
    k8, ks = _quant_k(kf, km)
    fmt = _v_format(v_quant, v_format)
    if fmt != "bf16":
        qmax = 127.0 if fmt == "int8" else FP8_SCALE_MAX
        vdt = jnp.int8 if fmt == "int8" else jnp.float8_e4m3fn
        a = jnp.max(jnp.abs(vf - vm), axis=2, keepdims=True)  # [B,Hk,1,D]
        vs = jnp.where(a > 1e-8, a * (v_margin / qmax), 1.0)
        vq = _quant_v(vf, vm, vs, vdt)
        # Fold the per-channel ROUNDING BIAS into v_mean: decode outputs
        # are p-weighted means whose magnitude is far below |v|, so the
        # channel-mean quantization error (e4m3: 2-3e-3 rms — measured to
        # dominate the fp8 cache's output error 2-4x) does not average
        # out.  The epilogue adds v_mean once per row (sum_j p = 1), so
        # storing vm - mean(codes)*vs makes the reconstruction's channel
        # mean EXACTLY the true channel mean; appended tokens subtract
        # the adjusted vm and stay consistent (fixed centering is free).
        # optimization_barrier: stops XLA:TPU cancelling the fp8 round-
        # trip inside mean(codes) under jit, which would void the fold
        # (core.py has the full story; int8's explicit rint is immune but
        # the barrier is free)
        vq = jax.lax.optimization_barrier(vq)
        vm = vm - jnp.mean(vq.astype(jnp.float32), axis=2,
                           keepdims=True) * vs
    else:
        vs = jnp.ones((B, Hk, 1, D), jnp.float32)
        vq = (vf - vm).astype(jnp.bfloat16)
    return KVCache(
        k8=pad_axis(k8, 2, max_len),
        k_scale=pad_axis(ks, 3, max_len),
        v=pad_axis(vq, 2, max_len),
        v_scale=vs,
        v_mean=vm,
        k_mean=km,
        length=jnp.asarray(S, jnp.int32),
    )


def kv_cache_append(cache: KVCache, k_new, v_new,
                    *, tensor_layout: str = "HND") -> KVCache:
    """Quantize ``T`` new tokens with the cache's fixed centering/V scales
    and write them at ``cache.length`` (jit-friendly: T is static, the
    position is dynamic).  Old codes are never touched."""
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        k_new = jnp.swapaxes(k_new, 1, 2)
        v_new = jnp.swapaxes(v_new, 1, 2)
    k8, ks = _quant_k(k_new.astype(jnp.float32), cache.k_mean)
    if cache.v.dtype == jnp.bfloat16:
        vq = (v_new.astype(jnp.float32) - cache.v_mean).astype(jnp.bfloat16)
    else:
        vq = _quant_v(v_new.astype(jnp.float32), cache.v_mean,
                      cache.v_scale, cache.v.dtype)
    pos = cache.length
    return cache._replace(
        k8=jax.lax.dynamic_update_slice(cache.k8, k8, (0, 0, pos, 0)),
        k_scale=jax.lax.dynamic_update_slice(
            cache.k_scale, ks, (0, 0, 0, pos)),
        v=jax.lax.dynamic_update_slice(cache.v, vq, (0, 0, pos, 0)),
        length=cache.length + k_new.shape[2],
    )


def kv_cache_trim(cache: KVCache, n) -> KVCache:
    """Roll back the last ``n`` tokens (speculative decoding: rejected
    draft tokens).  O(1) — only the visible length moves; the stale codes
    beyond it are masked by every decode and overwritten by the next
    append.  ``n`` may be traced (accept-count from a verify step)."""
    return cache._replace(
        length=jnp.maximum(cache.length - jnp.asarray(n, jnp.int32), 0))


def decode_bucket(length: int, block: int = _BUCKET_DEFAULT) -> int:
    """Smallest bucket (multiple of ``block``) covering ``length`` — pick
    buckets on the host so jit compiles one kernel per bucket, not per
    length."""
    return max(block, round_up(length, block))


def sageattn_decode(
    q,
    cache: KVCache,
    *,
    tensor_layout: str = "HND",
    sm_scale: Optional[float] = None,
    bucket: int = 0,
    block_k: int = 0,
    is_causal: bool = True,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention of ``T`` fresh query tokens against the quantized cache.

    ``q``: [B, Hq, T, D] (HND) — the new tokens' queries, whose global
    positions are ``cache.length - T .. cache.length - 1`` (i.e. append the
    tokens FIRST, then decode).  ``is_causal`` masks within the window for
    T > 1 (irrelevant at T=1).  ``bucket`` statically bounds the KV stream
    (0 = full ``cache.max_len``); pick with :func:`decode_bucket`.

    Returns [B, Hq, T, D] bf16 in the input layout.
    """
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        q = jnp.swapaxes(q, 1, 2)
    B, Hq, T, D = q.shape
    _, Hk, Smax, Dk = cache.k8.shape
    if D != Dk:
        raise ValueError(f"head_dim mismatch: q {D} vs cache {Dk}")
    if Hq % Hk != 0:
        raise ValueError(f"num_qo_heads ({Hq}) must be divisible by "
                         f"num_kv_heads ({Hk})")
    if interpret is None:
        interpret = dispatch.default_interpret()
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if bucket == 0:
        bucket = Smax
    bucket = round_up(bucket, _LANES)
    if bucket > Smax:
        raise ValueError(f"bucket ({bucket}) exceeds cache max_len ({Smax})")
    G = Hq // Hk

    # Fold the G query heads of each KV group into the Q tile — the KV
    # stream is fetched once per KV head instead of once per query head.
    # T=1 (classic decode) folds to G rows; T>1 (speculative verify
    # windows) folds to G*T rows r = g*T + t, with the kernel's causal row
    # iota taken mod T (cfg.causal_row_mod) so row positions stay correct.
    # Fold iff it strictly reduces KV streams per KV head:
    # ceil(G*T/_BQ) q-tiles folded vs G tiles (one per query head) unfolded.
    fold = G > 1 and (T == 1 or -(-(G * T) // _BQ) < G)
    if fold:
        qt = q.reshape(B, Hk, G * T, D)
        Ht, Sq_true = Hk, G * T
    else:
        qt, Ht, Sq_true = q, Hq, T

    BK = block_k or min(_BK_DEFAULT, bucket)
    while bucket % BK:
        BK //= 2
    # Whole-tile inner dots: the prefill kernel's BKI=256 sub-tile loop
    # (an MXU/VPU interleaving win under 128-row Q tiles) is a ~1.8x LOSS
    # here — with a 32-row Q tile each sub-tile's dot is tiny and the
    # dynamic-tail pl.when pair per sub-tile serializes the step
    # (benchsuite/probe_decode_split.py: 1851 -> 1041 us wall @16K).
    # SAGE_DECODE_BKI=256 restores the old behavior for A/B.
    BKI = min(BK, int(os.environ.get("SAGE_DECODE_BKI", "0")) or BK)
    while BK % BKI:
        BKI //= 2
    # Stream the cache as concurrent K/V operand pairs: each Pallas
    # operand stream is element-rate bound (~85-110 Gel/s) but streams
    # overlap (probe_dma_rate: 2 -> 220, 4 -> 333 Gel/s).  On the full
    # decode body (whole-tile dots): split 0 -> 1041 us, 2 -> 902,
    # 4 -> 877 wall @16K (probe_decode_split.py).  Largest power of two
    # <= the env default that divides the bucket's block count wins.
    split = int(os.environ.get("SAGE_DECODE_SPLIT", "4"))
    n_kv = bucket // BK
    while split > 1 and not (n_kv >= split and n_kv % split == 0):
        split //= 2
    split = max(split, 1)
    Sq_pad = round_up(max(Sq_true, _BQ), _BQ)
    qt = pad_axis(qt.astype(jnp.bfloat16), 2, Sq_pad)

    cfg = AttnConfig(
        block_q=_BQ,
        block_k=BK,
        block_k_inner=BKI,
        causal=is_causal and T > 1,
        causal_dynamic=is_causal and T > 1,
        causal_row_mod=T if (fold and is_causal and T > 1) else 0,
        quantized=True,
        pv_dtype=("fp8" if cache.v_fp8 else
                  "int8" if cache.v_int8 else "bf16"),
        fp8_native_dot=dispatch.detect().has_fast_fp8,
        layout="HND",
        sm_scale=sm_scale,
        kv_len=bucket,
        kv_len_dynamic=True,
        fold_k_scale=False,          # per-token K scales (cache-exact)
        fuse_v_mean=True,
        emit_lse=False,
        fuse_q_quant=True,
        softmax_mode="online",
        kv_split=split,
    )
    offsets = None
    if cfg.causal:
        # q row r sits at global position (length - T) + r
        offsets = jnp.stack([cache.length - T,
                             jnp.asarray(0, jnp.int32)])
    out, _ = attention_call(
        qt,
        cache.k8[:, :, :bucket],
        cache.v[:, :, :bucket],
        k_scale=cache.k_scale[:, :, :, :bucket],
        v_scale=None if cache.v.dtype == jnp.bfloat16 else cache.v_scale,
        v_mean=cache.v_mean,
        kv_true_dyn=cache.length,
        offsets=offsets,
        cfg=cfg,
        interpret=interpret,
    )
    out = out[:, :, :Sq_true]
    if fold:
        out = out.reshape(B, Hq, T, D)
    if not layout.is_hnd:
        out = jnp.swapaxes(out, 1, 2)
    return out
