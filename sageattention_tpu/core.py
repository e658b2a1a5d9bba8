"""Public API — reference-compatible attention entry points.

TPU-native rebuild of `/root/reference/sageattention/core.py`.  The same
public surface is kept (``sageattn``, ``sageattn_varlen`` plus the explicit
per-mode entry points); the CUDA-arch suffixes map to TPU modes:

  reference name                          TPU equivalent here
  --------------------------------------  ----------------------------------
  sageattn_qk_int8_pv_fp16_triton/_cuda   sageattn_qk_int8_pv_bf16
  sageattn_qk_int8_pv_fp8_cuda(_sm90)     sageattn_qk_int8_pv_fp8
  (no reference analogue)                 sageattn_qk_int8_pv_int8

The reference names remain importable as aliases so code written against
`sageattention` ports by changing only the import.  All functions are
jit-friendly: flags are Python-level statics, everything else traces.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from . import dispatch
from .ops import quant as quant_ops
from .ops.attention import AttnConfig, attention_call
from .utils.layout import HND as HND_LAYOUT, get_layout, pad_axis, pad_head_dim, round_up

LOG2E = quant_ops.LOG2E



# Relative kernel efficiency by tile width, measured on v5e
# (docs/PERF_NOTES.md tile sweeps: 128-wide tiles are grid-overhead-bound at
# ~12% of peak; 2048 is the sweet spot).  Used to trade tile quality against
# the masked-compute cost of padding ugly sequence lengths up to the tile.
_BLOCK_EFF = {8192: 1.03, 4096: 1.02, 2048: 1.0, 1024: 0.96, 512: 0.82,
              256: 0.6, 128: 0.15}


def _pick_block(cap: int, seq: int) -> int:
    """Block choice minimizing (padded length / efficiency): real-model
    sequence lengths are rarely tile-friendly (CogVideoX joint seq 17776,
    Hunyuan 32528) — padding a few % of masked rows onto a 2048-wide tile
    beats shrinking to the 128-divisor tile by ~8x (round-1's S=1024 and
    unaligned-seq regressions)."""
    best_b, best_cost = 128, float("inf")
    for b, eff in _BLOCK_EFF.items():
        if b > cap:
            continue
        cost = (-(-seq // b) * b) / (max(seq, 1) * eff)
        if cost < best_cost:
            best_b, best_cost = b, cost
    return best_b


def _choose_blocks(sq: int, sk: int, quantized: bool,
                   compute_dtype: str = "native", causal: bool = False):
    """Tile-size heuristic measured on v5e (docs/PERF_NOTES.md): grid-step
    overhead dominates below ~512-wide tiles; bf16-compute paths gain most
    from a small inner sub-tile (MXU/VPU interleave).  Native-int8 static
    kernels want a NARROW q tile with a WIDE kv tile sub-tiled at 1024
    (r2 follow-up sweep): causal executed-flop waste scales with BQ/S (top
    rows of a q block execute kv columns only its bottom rows need), and
    the 3-phase loop skips above-diagonal KV *sub*-tiles, so (1024, 8192,
    1024) beats flat 2048x2048 by 18% causal / 3% non-causal at S=8192.
    Exception: causal at S>=32K, where flat 2048 tiles measure ~3% faster
    (diagonal waste is already small and the wide-tile rate wins).
    Callers pad the seq dims UP to the returned blocks.
    Returns (block_q, block_k, bk_inner)."""
    if quantized and compute_dtype == "native":
        if causal and sk >= 32768:
            bq = _pick_block(2048, sq)
            bk = _pick_block(2048, sk)
            return bq, bk, bk
        bq = _pick_block(1024, sq)
        bk = _pick_block(8192, sk)
        bki = min(1024, bk)
    elif quantized:  # int8 storage, bf16 compute
        bq = _pick_block(4096, sq)
        bk = _pick_block(2048, sk)
        bki = min(256, bk)
    else:
        bq = _pick_block(1024, sq)
        bk = _pick_block(2048, sk)
        bki = min(256, bk)
    return bq, bk, bki


def _finish_lse(lse_b2, lse_correction, sq):
    """base-2 kernel lse -> natural-log lse (+ smooth_k repair), sliced to
    the true query length — mirrors `core.py:328-331`."""
    lse = lse_b2[..., :sq] / LOG2E
    if lse_correction is not None:
        lse = lse + lse_correction
    return lse


def _sage_attention(
    q,
    k,
    v,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    smooth_k: bool = True,
    smooth_v: bool = True,
    qk_quant_gran: str = "per_thread",
    pv_dtype: str = "bf16",
    compute_dtype: str = "native",  # "native" (int8 MXU dots) or "bf16"
    # (int8 storage, bf16 dots via in-kernel dequant — fastest on v5e,
    # see ops/attention.py AttnConfig.compute_dtype); "bf16" forces
    # k_scale_mode="head"
    k_scale_mode: str = "fine",  # "fine": reference granularities;
    # "head": one K scale per head, folded into q_scale so the kernel pays a
    # single per-row multiply (fastest; needs smooth_k — measured <2e-5
    # accuracy cost once the K mean is removed, docs/PERF_NOTES.md)
    return_lse: bool = False,
    block_q: int = 0,
    block_k: int = 0,
    attn_mask=None,
    softmax_mode: str = "auto",  # "auto" | "online" | "static" — see
    # ops/attention.py AttnConfig.softmax_mode.  "auto" picks static
    # whenever the P path is bf16 (exact-equivalent, fewer VPU ops and no
    # cross-sub-tile dependency) and online otherwise.
    interpret: Optional[bool] = None,
    use_fused: Optional[bool] = None,  # None: fused Pallas prep on compiled
    # runs, jnp prep on interpret runs.  Tests force True to exercise the
    # fused pipeline (incl. NHD-direct) under the CPU interpreter.
    kv_true: int = 0,  # true kv length when the k/v inputs arrive ALREADY
    # padded beyond it (ulysses shards, pre-padded serving buffers): kv
    # columns >= kv_true are masked by the kernel and excluded from every
    # statistic (K mean, head amax, V channel stats, static-softmax caps).
    # q rows past the matching true length produce garbage the caller
    # slices off.
    fuse_q_quant: Optional[bool] = None,  # r3: quantize Q inside the
    # attention kernel (per-row scales; the standalone Q-quant launch
    # disappears).  None = auto (on whenever eligible: fused head-mode
    # dense path).  Tests pass False to compare the pre-quantized pipeline
    # exactly against the jnp reference.
    sliding_window: int = 0,  # r3: local (sliding-window) causal attention —
    # row r attends cols [r - sliding_window + 1, r].  Static causal only;
    # below-window KV blocks are skipped at both the compute AND DMA level
    # (ops/attention.py AttnConfig.window), so cost scales O(S*W).
    attention_sinks: int = 0,  # r3: StreamingLLM sinks for the windowed
    # path — the first `attention_sinks` key positions stay visible to
    # every row in addition to its band (prefill/training side of the
    # paged-decode `attention_sinks`).  Requires sliding_window.
):
    """Shared quantized-attention pipeline (quant -> kernel -> repair).
    ``block_q``/``block_k`` of 0 select tuned sizes for the shape.

    Internally everything runs in HND; NHD inputs are transposed once at
    entry and the output transposed back (TPU block tiling cannot index
    (B,S,H,D) per-head natively — see ops/attention.py).
    """
    layout = get_layout(tensor_layout)
    if interpret is None:
        interpret = dispatch.default_interpret()
    if use_fused is None:
        use_fused = not interpret
    # NHD-direct (r3): the fused quant kernels can read (B,S,H,D) blocks
    # directly and hand back HND int8 (the reference consumes both layouts
    # via strides, `core.py:160-171`).  MEASURED OFF by default on v5e:
    # every Mosaic-legal direct design loses to the XLA transpose entry —
    # per-head NHD blocks don't lower at all, an in-VMEM (bs,H,D) transpose
    # costs minutes of compile and ~25% runtime, and whole-head 3D blocks
    # execute at ~73 GB/s vs the 2D HND quant kernels' 550-830 GB/s
    # (benchsuite/probe_nhd.py + docs/PERF_NOTES.md r3).  The code path is
    # kept behind SAGE_NHD_DIRECT=1 for generations where 3D tiles are
    # fast, and for the CPU-interpret tests that pin its correctness.
    nhd_direct = ((not layout.is_hnd) and use_fused and pv_dtype != "fp8"
                  and (os.environ.get("SAGE_NHD_DIRECT") == "1"
                       or interpret))
    if not layout.is_hnd and not nhd_direct:
        q = jnp.swapaxes(q, 1, 2)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    seq_ax = 1 if nhd_direct else 2
    if nhd_direct:
        B, Sq, Hq, D_og = q.shape
        _, Sk, Hk, _ = k.shape
    else:
        B, Hq, Sq, D_og = q.shape
        _, Hk, Sk, _ = k.shape
    in_layout = "NHD" if nhd_direct else "HND"
    if Hq % Hk != 0:
        raise ValueError(f"num_qo_heads ({Hq}) must be divisible by num_kv_heads ({Hk})")
    if v.shape != k.shape:
        # a silently shorter V would be zero-padded up to kv_len (r3 drive
        # probe): refuse instead
        raise ValueError(f"k and v shapes must match, got {k.shape} vs {v.shape}")
    if is_causal and Sq != Sk:
        raise ValueError("is_causal requires qo_len == kv_len (as in the reference)")
    if sliding_window:
        if not is_causal:
            raise ValueError("sliding_window requires is_causal=True")
        if attn_mask is not None:
            raise ValueError("sliding_window composes with no user attn_mask")
        if kv_true:
            raise ValueError("sliding_window with pre-padded kv_true is "
                             "unsupported; pass unpadded inputs")
    if attention_sinks and not sliding_window:
        raise ValueError("attention_sinks requires sliding_window")
    if sm_scale is None:
        sm_scale = 1.0 / (D_og ** 0.5)
    if qk_quant_gran not in quant_ops.QUANT_GRANULARITIES:
        raise ValueError(f"unknown qk_quant_gran {qk_quant_gran!r}")
    q_group, k_group = quant_ops.QUANT_GRANULARITIES[qk_quant_gran]

    masked = "none"
    if attn_mask is not None:
        masked = "bool" if attn_mask.dtype == jnp.bool_ else "float"
    if softmax_mode == "auto":
        # static forces a bf16 P (more accurate than int8/fp8 P) and is the
        # fastest softmax on v5e (docs/PERF_NOTES.md r2); fp8 PV keeps the
        # online exp-offset path, float-bias masks aren't covered by the cap.
        softmax_mode = ("static" if (pv_dtype != "fp8" and masked != "float")
                        else "online")

    if use_fused:
        from .ops import quant_pallas as qp

    # Pad head_dim to {64,128,256} and seq lens to the kernel blocks.
    # Stats (K mean, head amax, V channel stats) always cover only the TRUE
    # sequence: padded rows would bias the mean and contribute |mean| to the
    # amax (worst case near-constant K).  On the fused path a single-read
    # Pallas stats kernel computes them post-pad with the pad rows masked;
    # the jnp path computes them pre-pad.
    Sk_true = kv_true if kv_true else Sk
    if not (0 < Sk_true <= Sk):
        raise ValueError(f"kv_true {kv_true} out of range for kv_len {Sk}")
    kv_valid_in = None
    if Sk_true != Sk:  # pre-padded inputs: mask pads out of the jnp stats
        kv_valid_in = jnp.expand_dims(
            (jnp.arange(Sk) < Sk_true)[None],
            (2, 3) if seq_ax == 1 else (1, 3))
    km = None
    ks_sc = None
    vf_stats = None
    if not use_fused:
        if smooth_k and kv_valid_in is not None:
            kf0 = k.astype(jnp.float32)
            km = (jnp.sum(kf0 * kv_valid_in, axis=seq_ax, keepdims=True)
                  / Sk_true)
        elif smooth_k:
            km = quant_ops.k_mean(k, "HND")
    q, D = pad_head_dim(q, HND_LAYOUT)  # dim axis is 3 in both layouts
    k, _ = pad_head_dim(k, HND_LAYOUT)
    v, _ = pad_head_dim(v, HND_LAYOUT)
    if km is not None:
        km = pad_axis(km, 3, D)
    if block_q and block_k:
        bq, bk, bki = block_q, block_k, block_k
    else:
        bq, bk, bki = _choose_blocks(Sq, Sk, quantized=True,
                                     compute_dtype=compute_dtype,
                                     causal=is_causal)
        if compute_dtype == "native" and (Sk < 4096 or min(bq, bk) < 512):
            # int8 MXU dots have no rate advantage at short sequences /
            # small tiles (docs/PERF_NOTES.md r2 A/B: bf16-compute wins at
            # S<=2048, native from S=4096 up): small shapes run the
            # int8-storage / bf16-compute kernel, whose sub-tile interleave
            # wins there.  fp8 PV needs the native path (fp8 P) — pad its
            # tiles to 512.
            if pv_dtype == "fp8":
                bq, bk = max(bq, 512), max(bk, 512)
                bki = bk
            else:
                compute_dtype = "bf16"
                bq, bk, bki = _choose_blocks(Sq, Sk, quantized=True,
                                             compute_dtype="bf16",
                                             causal=is_causal)
        if masked != "none" and bk > 2048:
            # a user mask streams (BQ, BK) tiles through VMEM — cap the kv
            # tile so the f32-bias case stays within the scoped-vmem budget
            bk = 2048
            bki = min(bki, bk)
    Sq_pad = round_up(Sq, bq)
    Sk_pad = round_up(Sk, bk)
    if compute_dtype == "bf16":
        k_scale_mode = "head"
    if k_scale_mode not in ("head", "fine"):
        raise ValueError(f"k_scale_mode must be 'fine' or 'head', got {k_scale_mode!r}")
    # In-kernel Q quantization (r3): on the fused head-mode path the
    # attention kernel reads bf16 Q and quantizes it per row at j == 0 (the
    # Q tile is resident exactly once) — the standalone Q-quant launch and
    # the host-side static-safety prediction both disappear (safety becomes
    # an exact post-hoc check on the kernel's min row denominator).  Masked
    # paths ride it too (r3 extension): masks apply to s after the dot, and
    # the post-hoc check stays exact where the predictive cap bound was
    # blind (mask-hidden visible maxima, float biases).
    fuse_qq = (use_fused and not nhd_direct
               and k_scale_mode == "head"
               and jnp.issubdtype(q.dtype, jnp.floating)
               and fuse_q_quant is not False)
    if fuse_q_quant and not fuse_qq:
        raise ValueError("fuse_q_quant=True requires the fused head-mode "
                         "path with float inputs")
    if softmax_mode == "static" and masked == "float" and not fuse_qq:
        # the predictive cap is not an upper bound once an additive bias
        # lands on s; only the fused post-hoc check covers it exactly
        softmax_mode = "online"
    if not use_fused:
        kvw = kv_valid_in if kv_valid_in is not None else 1.0
        if k_scale_mode == "head":
            kf = k.astype(jnp.float32)
            amax = jnp.max(jnp.abs(kf - km if km is not None else kf) * kvw,
                           axis=(2, 3), keepdims=True)
            ks_sc = jnp.where(amax > 0, amax * (1.0 / 127.0), 1.0)  # [B,Hk,1,1]
        if pv_dtype in ("int8", "fp8"):
            vf = v.astype(jnp.float32)
            if smooth_v:
                vm_s = (jnp.mean(vf, axis=2, keepdims=True)
                        if kv_valid_in is None else
                        jnp.sum(vf * kvw, axis=2, keepdims=True) / Sk_true)
            else:
                vm_s = None
            vc = vf - vm_s if smooth_v else vf
            v_amax = jnp.max(jnp.abs(vc) * kvw,
                             axis=2, keepdims=True)  # [B,Hk,1,D]
            vf_stats = (vm_s, v_amax)
    q = pad_axis(q, seq_ax, Sq_pad)
    k = pad_axis(k, seq_ax, Sk_pad)
    v = pad_axis(v, seq_ax, Sk_pad)
    # Merged K+V prep (r3): the flagship combination (smooth_k + smooth_v +
    # int8 V + head K scales) runs its stats and its quant as ONE launch
    # each instead of two — kernel-boundary ramp is most of the measured
    # e2e prep overhead beyond the HBM floor (probe_prep.py).
    merged_kv = (use_fused and not nhd_direct and smooth_k and smooth_v
                 and pv_dtype == "int8" and k_scale_mode == "head")
    # One-pass prep (r3): when the whole (S, D) head-slice fits in VMEM,
    # stats + scale + quant collapse into a single read per tensor — K and
    # V are otherwise each read twice (stats pass + quant pass), ~536 MB of
    # avoidable HBM traffic at S=8192 B4 H32 hd128.
    onepass_kv = merged_kv and Sk_pad * D <= qp.ONEPASS_MAX_ELS
    want_cap = use_fused and softmax_mode == "static"
    q_capmax = k_capmax = None  # [B,H,1,1]: max over rows of scale*||x8||
    vm_m = v_amax_m = v_in_m = k_i8_1p = None
    if use_fused:
        kv_valid = jnp.expand_dims(
            (jnp.arange(Sk_pad) < Sk_true)[None],
            (1, 3) if seq_ax == 2 else (2, 3))
        if onepass_kv:
            res = qp.prep_k_onepass_pallas(k, Sk_true, with_capmax=want_cap,
                                           interpret=interpret)
            k_i8_1p, km, k_head_amax = res[:3]
            if want_cap:
                k_capmax = res[3]
            ks_sc = jnp.where(k_head_amax > 0,
                              k_head_amax * (1.0 / 127.0), 1.0)
            v_in_m, vm_m, v_amax_m = qp.prep_v_onepass_pallas(
                v, Sk_true, interpret=interpret)
            vf_stats = (vm_m, v_amax_m)
        elif merged_kv:
            km, k_amax_ch, vm_m, v_amax_m = qp.channel_stats2_pallas(
                k, v, Sk_true, interpret=interpret)
            vf_stats = (vm_m, v_amax_m)
        elif smooth_k:
            km, k_amax_ch = qp.channel_stats_pallas(
                k, Sk_true, in_layout=in_layout, interpret=interpret)
        elif k_scale_mode == "head":
            # no-smoothing path (non-default): plain masked amax
            a = jnp.max(jnp.abs(k.astype(jnp.float32)) * kv_valid,
                        axis=seq_ax, keepdims=True)
            k_amax_ch = jnp.swapaxes(a, 1, 2) if nhd_direct else a
        if k_scale_mode == "head" and not onepass_kv:
            amax = jnp.max(k_amax_ch, axis=3, keepdims=True)
            ks_sc = jnp.where(amax > 0, amax * (1.0 / 127.0), 1.0)
        if pv_dtype in ("int8", "fp8") and not merged_kv:
            if smooth_v:
                vf_stats = qp.channel_stats_pallas(
                    v, Sk_true, in_layout=in_layout, interpret=interpret)
            else:
                a = jnp.max(jnp.abs(v.astype(jnp.float32)) * kv_valid,
                            axis=seq_ax, keepdims=True)
                vf_stats = (None,
                            jnp.swapaxes(a, 1, 2) if nhd_direct else a)

    # Quantize Q/K (sm_scale*log2e folded into Q).  On TPU the fused Pallas
    # quant kernels read bf16 once / write int8 once (ops/quant_pallas.py);
    # the pure-jnp path serves interpret/CPU runs.
    if k_scale_mode == "head":
        k_group = Sk_pad  # one scale per (batch, head)

    fold = sm_scale * LOG2E
    if use_fused:
        if onepass_kv:
            k_i8 = k_i8_1p   # quantized (with capmax) in the one-pass prep
            k_s = ks_sc[:, :, :, 0]  # [B, Hk, 1]
        elif merged_kv:
            v_scale_m = jnp.where(v_amax_m > 0, v_amax_m * (1.0 / 127.0),
                                  1.0)
            if want_cap:
                k_i8, v_in_m, k_capmax = qp.quant_kv_pallas(
                    k, ks_sc, km, v, v_scale_m, vm_m, with_capmax=True,
                    s_true=Sk_true, interpret=interpret)
            else:
                k_i8, v_in_m = qp.quant_kv_pallas(
                    k, ks_sc, km, v, v_scale_m, vm_m, interpret=interpret)
            k_s = ks_sc[:, :, :, 0]  # [B, Hk, 1]
        elif k_scale_mode == "head":
            if want_cap:
                k_i8, k_capmax = qp.quant_int8_fixed_pallas(
                    k, ks_sc, sub=km, with_capmax=True, s_true=Sk_true,
                    in_layout=in_layout, interpret=interpret)
            else:
                k_i8 = qp.quant_int8_fixed_pallas(
                    k, ks_sc, sub=km, in_layout=in_layout,
                    interpret=interpret)
            k_s = ks_sc[:, :, :, 0]  # [B, Hk, 1]
        elif want_cap:
            k_i8, k_s, k_capmax = qp.quant_int8_groupwise_pallas(
                k, k_group, sub=km, with_capmax=True, s_true=Sk_true,
                in_layout=in_layout, interpret=interpret)
        else:
            k_i8, k_s = qp.quant_int8_groupwise_pallas(
                k, k_group, sub=km, in_layout=in_layout, interpret=interpret)
        # single-pass Q quant + cap reduction (static-softmax input);
        # fuse_qq quantizes Q inside the attention kernel instead
        if fuse_qq:
            q_i8 = q_s = None
        elif want_cap:
            q_i8, q_s, q_capmax = qp.quant_int8_groupwise_pallas(
                q, q_group, fold=fold, with_capmax=True, in_layout=in_layout,
                interpret=interpret)
        else:
            q_i8, q_s = qp.quant_int8_groupwise_pallas(
                q, q_group, fold=fold, in_layout=in_layout,
                interpret=interpret)
    elif k_scale_mode == "head":
        q_i8, q_s = quant_ops.quant_int8_groupwise(q, q_group, fold=fold)
        kf = k.astype(jnp.float32)
        kc = kf - km if km is not None else kf
        k_i8 = jnp.clip(jnp.rint(kc / ks_sc), -127, 127).astype(jnp.int8)
        k_s = ks_sc[:, :, :, 0]
    else:
        q_i8, q_s, k_i8, k_s = quant_ops._quant_qk(
            q, k, km, sm_scale, q_group, k_group, "HND")
    if fuse_qq:
        # Q scales are born inside the attention kernel; the per-head K
        # scale travels as its own input (k_head_scale)
        q_scale = q_scale_prefold = k_scale = None
    elif nhd_direct:
        # NHD quant kernels return per-row scales directly ([B,H,S,1]) —
        # no host expand pass.  prefold == q_scale when no per-head K
        # scale folds in (the static capmax fallback below reads it for
        # every k_scale_mode).
        q_scale = q_scale_prefold = q_s
    else:
        q_scale = q_scale_prefold = quant_ops.expand_scales_rows(
            q_s, q_group, Sq_pad)
    if fuse_qq:
        pass
    elif k_scale_mode == "head":
        q_scale_prefold = q_scale
        ks_head = k_s[:, :, 0]  # [B, Hk]
        if Hq != Hk:
            ks_head = jnp.repeat(ks_head, Hq // Hk, axis=1)
        q_scale = q_scale * ks_head[:, :, None, None]
        k_scale = None
    elif nhd_direct:
        k_scale = jnp.swapaxes(k_s, 2, 3)   # per-row [B,Hk,S,1] -> per-col
    else:
        k_scale = quant_ops.expand_scales_cols(k_s, k_group, Sk_pad)

    # V per pv mode (channel stats from vf_stats — computed pre-pad).
    v_scale = None
    vm = None
    if pv_dtype == "bf16":
        # unquantized V must still reach the kernel HND; NHD-direct pays
        # one V transpose here (the quantized default pays none)
        v_in = (jnp.swapaxes(v, 1, 2) if nhd_direct else v
                ).astype(jnp.bfloat16)
    elif pv_dtype == "int8":
        vm, v_amax = vf_stats
        v_scale = jnp.where(v_amax > 0, v_amax * (1.0 / 127.0), 1.0)
        if merged_kv:
            v_in = v_in_m   # quantized in the merged KV launch
        elif use_fused:
            v_in = qp.quant_int8_fixed_pallas(
                v, v_scale, sub=vm, in_layout=in_layout, interpret=interpret)
        else:
            vc = v.astype(jnp.float32) - vm if vm is not None else v.astype(jnp.float32)
            v_in = jnp.clip(jnp.rint(vc / v_scale), -127, 127).astype(jnp.int8)
    elif pv_dtype == "fp8":
        vm, v_amax = vf_stats
        # scale_max=448 fills the e4m3 range (`quant.py:224-293` rule).
        v_scale = jnp.where(v_amax > 0, v_amax * (1.0 / 448.0), 1.0)
        vc = v.astype(jnp.float32) - vm if vm is not None else v.astype(jnp.float32)
        v_in = (vc / v_scale).astype(jnp.float8_e4m3fn)
        if vm is not None:
            # Fold the per-channel e4m3 ROUNDING BIAS into the v_mean the
            # epilogue adds (sum_j p = 1): attention outputs are p-weighted
            # means far smaller than |v|, so the channel-mean quantization
            # error (~2-3e-3 rms for e4m3) dominates the fp8-PV mode's
            # output error unless cancelled — measured r4: this single fold
            # took the fp8 V cache decode from 8.4e-3 to 4e-4 (and the
            # reference's own fp8 path has no counterpart).  True rows
            # only: pads hold -vm/vs codes that must not poison the mean.
            valid = jnp.expand_dims(jnp.arange(Sk_pad) < Sk_true, (0, 1, 3))
            # optimization_barrier: under jit, XLA:TPU's simplifier cancels
            # the f32->e4m3->f32 round-trip inside mean(codes.astype(f32)),
            # silently turning this fold into mean(exact values) = 0 — the
            # entire r5 compiled-vs-interpret fp8 accuracy gap (1.06e-2 vs
            # 8.4e-4 at S=4096 V-outlier; root-caused in
            # benchsuite/logs/r5_fp8_cross.log: every prep tensor bit-equal
            # except the folded vm).  The barrier pins the CODES as the
            # reduction input.
            codes = jax.lax.optimization_barrier(v_in)
            code_mean = (jnp.sum(codes.astype(jnp.float32) * valid, axis=2,
                                 keepdims=True) / Sk_true)
            vm = vm - code_mean * v_scale
    else:
        raise ValueError(f"unknown pv_dtype {pv_dtype!r}")

    mask_in = None
    if attn_mask is not None:
        # bool: keep-where-true (reference triton semantics,
        # `attn_qk_int8_per_block.py:33-39`).  float: additive bias in
        # NATURAL-log units, matching jax.nn.dot_product_attention's `bias`
        # — a deliberate deviation: the reference adds the user bias to its
        # base-2-scaled logits raw (an effective ln2 rescale of the bias);
        # here the kernel multiplies by LOG2E so `bias` means what it means
        # everywhere else in JAX.  Shape [B, 1|Hq, Sq, Sk].
        if attn_mask.ndim != 4:
            raise ValueError("attn_mask must be [B, 1|H, Sq, Sk]")
        mask_in = pad_axis(pad_axis(
            attn_mask.astype(jnp.int8 if masked == "bool" else jnp.float32),
            2, Sq_pad), 3, Sk_pad)

    # Static-softmax logit cap: C_i >= max_j s_ij in base-2 units, by
    # Cauchy–Schwarz on the int8 payloads: |q8_i . k8_j| <= ||q8_i|| ||k8_j||,
    # times the (folded) scales.  The kernel computes the per-row
    # qs_i*||q8_i|| part itself (the int8 q tile is resident there; a
    # per-row norm store in the quant pass costs a slow lane relayout —
    # probe_prep.py); the host supplies only max_j(ks_j*||k8_j||) as a
    # per-(b,h) scalar, reduced inside the fused quant pass (jnp fallback
    # for interpret mode).
    kn_max_in = None
    static_safe = None
    if softmax_mode == "static" and fuse_qq:
        # fuse_q_quant: the kernel computes the per-row caps itself from the
        # resident Q tile; the host supplies only max_j||k8_j|| and the
        # safety decision moves POST-HOC (exact) — see below.
        kn_max_in = (jnp.repeat(k_capmax, Hq // Hk, axis=1)
                     if Hq != Hk else k_capmax)                # [B,Hq,1,1]
    elif softmax_mode == "static":
        if q_capmax is None:  # jnp fallback (interpret / non-fused path)
            qn = jnp.sqrt(jnp.sum(jnp.square(q_i8.astype(jnp.float32)),
                                  axis=3, keepdims=True))      # [B,Hq,Sq,1]
            q_capmax = jnp.max(q_scale_prefold * qn, axis=2, keepdims=True)
        if k_capmax is None:
            kn = jnp.sqrt(jnp.sum(jnp.square(k_i8.astype(jnp.float32)),
                                  axis=3))                     # [B,Hk,Sk_pad]
            kn = jnp.where(jnp.arange(Sk_pad) < Sk_true, kn, 0.0)
            if k_scale_mode == "head":  # ks folded into q_scale downstream
                k_capmax = jnp.max(kn, axis=2)[:, :, None, None]
            else:
                k_capmax = jnp.max(kn * k_scale[:, :, 0, :],
                                   axis=2)[:, :, None, None]
        kn_max_in = (jnp.repeat(k_capmax, Hq // Hk, axis=1)
                     if Hq != Hk else k_capmax)                # [B,Hq,1,1]
        # per-(b,h) worst-row cap (the per-row caps' max): in head mode the
        # q-side capmax lacks the folded ks — multiply it back in.
        cap_bh = q_capmax * kn_max_in * (1.0 + 1e-5)
        if k_scale_mode == "head":
            cap_bh = cap_bh * ks_head[:, :, None, None]
        # Safety: exp2(s - C) underflows when C - row_max > ~bf16 exponent
        # range.  Cheap LOWER bounds on the row max cap the slack:
        #   - smooth_k: the smoothed logits have row mean exactly 0, so
        #     row_max >= 0 (else row mean = q . km_all);
        #   - Sq == Sk self-attention (masks aside, the diagonal is visible
        #     under both dense and causal): row_max >= the diagonal logit
        #     q_i . k_i — nearly tight for real (peaked) attention, so
        #     large-but-correlated logits stay on the static path.
        # The call is static-safe iff slack <= 80 log2 units for every row;
        # unsafe calls run the online kernel via lax.cond (same bf16-P
        # numerics, just the running-max bookkeeping back).  With only the
        # per-(b,h) cap reduction on host, the base predicate pairs the
        # worst cap row with the worst row_lo row — conservative, never
        # unsafe; the lazy refinement below is exact per row.
        if smooth_k:
            row_lo_min = 0.0
        else:
            km_all = jnp.mean(k.astype(jnp.float32), axis=seq_ax,
                              keepdims=True)
            if nhd_direct:
                km_all = jnp.swapaxes(km_all, 1, 2)      # -> [B,Hk,1,D]
            if Hq != Hk:
                km_all = jnp.repeat(km_all, Hq // Hk, axis=1)
            row_lo = jnp.einsum(
                "bshd,bhod->bhs" if nhd_direct else "bhsd,bhod->bhs",
                q.astype(jnp.float32), km_all
            )[..., None] * (sm_scale * LOG2E)
            row_lo_min = jnp.min(row_lo, axis=2, keepdims=True)
        safe_base = jnp.all(cap_bh - row_lo_min <= 80.0)
        # Tighter (but costlier — a full q8/k8 read) per-row bound: the
        # diagonal logit q_i.k_i is always a visible logit for equal-length
        # attention and is nearly tight for peaked real data.  Computed
        # LAZILY via lax.cond: normal data (cap <= 80) never pays for it.
        # (bool masks could hide the diagonal, so they keep the base bound)
        if Sq == Sk and Sq_pad == Sk_pad and masked == "none":
            def _diag_safe():
                qn_l = jnp.sqrt(jnp.sum(
                    jnp.square(q_i8.astype(jnp.float32)),
                    axis=3, keepdims=True))
                logit_cap = q_scale * qn_l * kn_max_in * (1.0 + 1e-5)
                k8_rep = (jnp.repeat(k_i8, Hq // Hk, axis=1)
                          if Hq != Hk else k_i8)
                diag = jnp.sum(q_i8.astype(jnp.float32)
                               * k8_rep.astype(jnp.float32),
                               axis=3, keepdims=True)
                diag = diag * q_scale  # folded scales (head mode)
                if k_scale_mode != "head":
                    ks_row = jnp.swapaxes(k_scale, 2, 3)  # [B,Hk,Sk,1]
                    if Hq != Hk:
                        ks_row = jnp.repeat(ks_row, Hq // Hk, axis=1)
                    diag = diag * ks_row
                if smooth_k:
                    lo = jnp.maximum(diag, 0.0)
                else:
                    lo = jnp.maximum(row_lo, diag)
                return jnp.all(logit_cap - lo <= 80.0)

            static_safe = jax.lax.cond(
                safe_base, lambda: jnp.bool_(True), _diag_safe)
        else:
            static_safe = safe_base

    def _call(mode):
        cfg = AttnConfig(
            block_q=bq, block_k=bk, block_k_inner=bki, causal=is_causal,
            quantized=True, pv_dtype=pv_dtype, layout="HND", kv_len=Sk_true,
            out_dtype=q.dtype if jnp.issubdtype(q.dtype, jnp.floating) else jnp.bfloat16,
            masked=masked, fold_k_scale=(k_scale_mode == "head"),
            compute_dtype=compute_dtype, softmax_mode=mode,
            fp8_native_dot=dispatch.detect().has_fast_fp8,
            emit_lse=return_lse,  # inference callers skip the lse store
            # smooth_v repair (o += vm) fused into the kernel epilogue —
            # the reference's fuse_v_mean kernels; saves an output-sized
            # read+write on the host
            fuse_v_mean=(vm is not None),
            # keep P bf16 in the fallback so both cond branches share numerics
            pv_via_bf16=(mode == "online" and softmax_mode == "static"),
            fuse_q_quant=fuse_qq, sm_scale=sm_scale,
            q_len=(Sq if (fuse_qq and Sq_pad != Sq) else 0),
            window=sliding_window, sinks=attention_sinks,
        )
        return attention_call(
            q if fuse_qq else q_i8, k_i8, v_in, q_scale, k_scale, v_scale,
            attn_mask=mask_in,
            kn_max=kn_max_in if mode == "static" else None,
            v_mean=vm, k_head_scale=ks_sc if fuse_qq else None,
            cfg=cfg, interpret=interpret)

    if softmax_mode == "static" and fuse_qq:
        # POST-HOC static safety (exact, replaces the predictive q_capmax
        # check): the kernel emits the min row denominator l_i = sum_j
        # exp2(s_ij - C_i) >= exp2(rowmax_i - C_i) over true rows.  A tiny
        # min means some row's entire softmax underflowed the cap's slack
        # (causal rows whose visible logits all sit far below the dense
        # cap included — the ADVICE r2 gap); those calls rerun online via
        # lax.cond, so normal data pays nothing.  2^-100 keeps the row's
        # max P term >= 2^-117 even at S=128K — comfortably inside bf16's
        # normal range (min normal 2^-126), so precision is intact well
        # before the threshold trips.
        out_s, lse_s, lmin = _call("static")
        static_safe = jnp.min(lmin) >= 2.0 ** -100
        out, lse_b2 = jax.lax.cond(
            static_safe, lambda: (out_s, lse_s), lambda: _call("online"))
    elif softmax_mode == "static":
        out, lse_b2 = jax.lax.cond(
            static_safe, lambda: _call("static"), lambda: _call("online"))
    else:
        out, lse_b2 = _call(softmax_mode)

    # Slice padding.
    if nhd_direct:
        # one XLA transpose for the output only (Mosaic cannot write
        # per-head NHD blocks — benchsuite/probe_nhd.py); the three input
        # transposes are gone, absorbed by the NHD quant kernels
        out = jnp.swapaxes(out, 1, 2)[:, :Sq, :, :D_og]
    else:
        out = out[:, :, :Sq, :D_og]
        if not layout.is_hnd:
            out = jnp.swapaxes(out, 1, 2)

    if not return_lse:
        return out
    lse_correction = None
    if smooth_k:
        # (q . km) * sm_scale per row, natural-log units (`core.py:784-788`).
        qh = q[:, :Sq] if nhd_direct else q[:, :, :Sq]
        kmh = km if km.shape[1] == Hq else jnp.repeat(km, Hq // Hk, axis=1)
        lse_correction = jnp.einsum(
            "bshd,bhod->bhs" if nhd_direct else "bhsd,bhod->bhs",
            qh.astype(jnp.float32), kmh.astype(jnp.float32)
        ) * sm_scale
    return out, _finish_lse(lse_b2, lse_correction, Sq)


def _resolve_quant_bwd(quant_bwd, is_causal):
    """Default for the SageBwd-class int8 backward (backward_pallas.py):
    int8 where its quantization is amortized (the S-recompute; q/k codes
    built once in the wrapper), measured per path on v5e (probe_qbwd.py):
    non-causal 119.3 vs 115.3 TF-eff -> quantized; causal 70.8 vs 74.5
    (per-tile dequant overhead outweighs the halved MXU work) -> bf16.
    Explicit True/False overrides.  Gradient cossim of the quantized
    path vs the exact f32 vjp is ~7e-5 (tests/test_backward_pallas.py)."""
    if quant_bwd is None:
        return not is_causal
    return quant_bwd


@functools.lru_cache(maxsize=256)
def _diff_sage_factory(opts_items):
    """Build a custom-vjp attention fn for a fixed static config.

    Forward: the quantized pipeline.  Backward: flash-attention gradients
    from the saved (q, k, v, o, lse) — the straight-through scheme of
    SageBwd (see ops/backward.py), by default with the int8 backward
    kernels (``quant_backward``).  Quantization ops themselves have no
    useful gradient, so the estimator is attached here, above them.
    """
    opts = dict(opts_items)
    layout_is_hnd = opts["tensor_layout"] == "HND"
    quant_bwd = _resolve_quant_bwd(opts.pop("quant_backward", None),
                                   opts["is_causal"])

    @jax.custom_vjp
    def f(q, k, v):
        return _sage_attention(q, k, v, return_lse=False, **opts)

    def fwd(q, k, v):
        o, lse = _sage_attention(q, k, v, return_lse=True, **opts)
        return o, (q, k, v, o, lse)

    def bwd(res, do):
        from .ops.backward_pallas import attention_backward_pallas
        q, k, v, o, lse = res
        if not layout_is_hnd:
            q, k, v, o, do = (jnp.swapaxes(x, 1, 2) for x in (q, k, v, o, do))
        sm_scale = opts["sm_scale"]
        if sm_scale is None:
            sm_scale = 1.0 / (q.shape[-1] ** 0.5)
        interp = opts.get("interpret")
        if interp is None:
            interp = dispatch.default_interpret()
        dq, dk, dv = attention_backward_pallas(
            q, k, v, o, lse, do, sm_scale=sm_scale,
            is_causal=opts["is_causal"], quantized=quant_bwd,
            window=opts.get("sliding_window", 0),
            sinks=opts.get("attention_sinks", 0), interpret=interp)
        if not layout_is_hnd:
            dq, dk, dv = (jnp.swapaxes(x, 1, 2) for x in (dq, dk, dv))
        return dq, dk, dv

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=256)
def _diff_sage_masked_factory(opts_items):
    """custom_vjp variant carrying a BOOL attn_mask: the mask threads into
    the backward kernels (which zero masked pairs in the recomputed P), so
    masked attention trains correctly instead of silently differentiating
    through jnp.rint."""
    import numpy as np
    opts = dict(opts_items)
    layout_is_hnd = opts["tensor_layout"] == "HND"
    quant_bwd = _resolve_quant_bwd(opts.pop("quant_backward", None),
                                   opts["is_causal"])

    @jax.custom_vjp
    def f(q, k, v, mask):
        return _sage_attention(q, k, v, return_lse=False, attn_mask=mask,
                               **opts)

    def fwd(q, k, v, mask):
        o, lse = _sage_attention(q, k, v, return_lse=True, attn_mask=mask,
                                 **opts)
        return o, (q, k, v, o, lse, mask)

    def bwd(res, do):
        from .ops.backward_pallas import attention_backward_pallas
        q, k, v, o, lse, mask = res
        if not layout_is_hnd:
            q, k, v, o, do = (jnp.swapaxes(x, 1, 2) for x in (q, k, v, o, do))
        sm_scale = opts["sm_scale"]
        if sm_scale is None:
            sm_scale = 1.0 / (q.shape[-1] ** 0.5)
        interp = opts.get("interpret")
        if interp is None:
            interp = dispatch.default_interpret()
        dq, dk, dv = attention_backward_pallas(
            q, k, v, o, lse, do, sm_scale=sm_scale,
            is_causal=opts["is_causal"], attn_mask=mask,
            quantized=quant_bwd, interpret=interp)
        if not layout_is_hnd:
            dq, dk, dv = (jnp.swapaxes(x, 1, 2) for x in (dq, dk, dv))
        # bool primal -> float0 cotangent
        return dq, dk, dv, np.zeros(mask.shape, dtype=jax.dtypes.float0)

    f.defvjp(fwd, bwd)
    return f


def _nondiff(fn, why: str):
    """Wrap an inference-only path so jax.grad fails LOUDLY instead of
    silently flowing zeros through the quantization rounding."""
    f = jax.custom_vjp(fn)

    def fwd(*args):
        return fn(*args), None

    def bwd(res, g):
        raise NotImplementedError(why)

    f.defvjp(fwd, bwd)
    return f


def _dispatch_diff(q, k, v, **opts):
    """Route through the differentiable wrapper (static opts hashed)."""
    return _diff_sage_factory(tuple(sorted(opts.items())))(q, k, v)


def _route(q, k, v, return_lse=False, attn_mask=None, **opts):
    """Public entry routing.  Every path is either differentiable via
    custom_vjp (exact-math backward kernels; straight-through estimator for
    the quantization) or raises on jax.grad — no silent zero-gradients:

      - plain             -> custom_vjp (saved o/lse, Pallas backward)
      - bool attn_mask    -> custom_vjp, mask threaded into the backward
      - float bias mask   -> loudly non-differentiable (the bias gradient
                             would require materializing an O(S^2) dS)
      - return_lse        -> loudly non-differentiable (lse consumers —
                             ring attention — are inference-side)
    """
    quant_bwd = opts.pop("quant_backward", None)   # factories only; the
    # non-diff paths below never reach the backward kernels
    if return_lse:
        fn = _nondiff(
            lambda a, b, c: _sage_attention(
                a, b, c, return_lse=True, attn_mask=attn_mask, **opts),
            "sageattn(return_lse=True) is not differentiable; take gradients "
            "through the plain output (return_lse=False) instead")
        return fn(q, k, v)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            return _diff_sage_masked_factory(tuple(sorted(
                (*opts.items(), ("quant_backward", quant_bwd)))))(
                q, k, v, attn_mask)
        fn = _nondiff(
            lambda a, b, c, m: _sage_attention(
                a, b, c, return_lse=False, attn_mask=m, **opts),
            "sageattn with a float additive-bias mask is not differentiable "
            "(the bias gradient is O(S^2) to materialize); use a bool mask "
            "or the exact jax.nn.dot_product_attention for training")
        return fn(q, k, v, attn_mask)
    return _dispatch_diff(q, k, v, quant_backward=quant_bwd, **opts)


def sageattn(
    q,
    k,
    v,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    return_lse: bool = False,
    **kwargs: Any,
):
    """Auto-dispatching SageAttention (reference `core.py:79-157`).

    Picks the fastest accurate mode for the local TPU generation:
    int8 QK^T everywhere; PV in fp8 on generations with a native fp8 MXU,
    otherwise int8 PV with per-channel scales + mean smoothing.

    Layouts: "HND" [B,H,S,D] or "NHD" [B,S,H,D]; GQA via Hq % Hk == 0;
    ``return_lse`` returns the natural-log row logsumexp for ring attention.
    """
    caps = dispatch.detect()
    # FP4 routing (SageAttention3 class): gated on a MEASURED capability —
    # no current TPU generation has a 4-bit MXU (benchsuite/probe_lowbit.py),
    # so this branch is dormant; when a generation flips has_fp4 the
    # plumbing is already here (reference keeps sageattn3 a separate API,
    # `sageattn3/api.py:131-152`; we fold it into the dispatcher).
    if (caps.has_fp4 and not return_lse and kwargs.get("attn_mask") is None
            and not kwargs.get("sliding_window") and q.shape[-1] <= 128):
        from .ops.lowbit import sageattn3_tiled
        qh, kh, vh = ((q, k, v) if tensor_layout == "HND" else
                      (jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                       jnp.swapaxes(v, 1, 2)))
        out = sageattn3_tiled(qh, kh, vh, is_causal=is_causal,
                              sm_scale=sm_scale)
        return out if tensor_layout == "HND" else jnp.swapaxes(out, 1, 2)
    return _route(
        q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
        sm_scale=sm_scale, return_lse=return_lse,
        qk_quant_gran=kwargs.pop("qk_quant_gran", "per_thread"),
        pv_dtype=kwargs.pop("pv_dtype", caps.default_pv_dtype),
        compute_dtype=kwargs.pop("compute_dtype", caps.default_compute_dtype),
        smooth_k=kwargs.pop("smooth_k", True),
        smooth_v=kwargs.pop("smooth_v", True),
        k_scale_mode=kwargs.pop("k_scale_mode", "head"),
        attn_mask=kwargs.pop("attn_mask", None),
        interpret=kwargs.pop("interpret", None),
        fuse_q_quant=kwargs.pop("fuse_q_quant", None),
        quant_backward=kwargs.pop("quant_backward", None),
        sliding_window=kwargs.pop("sliding_window", 0),
        attention_sinks=kwargs.pop("attention_sinks", 0),
    )


def sageattn_qk_int8_pv_bf16(
    q, k, v,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    qk_quant_gran: str = "per_thread",
    sm_scale: Optional[float] = None,
    smooth_k: bool = True,
    attn_mask=None,
    return_lse: bool = False,
    **kwargs: Any,
):
    """INT8 QK^T + bf16 PV with fp32 accumulation — the TPU analogue of the
    reference's most robust mode, ``sageattn_qk_int8_pv_fp16_cuda`` with
    ``pv_accum_dtype="fp32"`` (`core.py:451-633`).  ``attn_mask`` (bool keep
    mask or additive float bias, [B, 1|H, Sq, Sk]) matches the triton path
    (`core.py:160-171`)."""
    return _route(
        q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
        sm_scale=sm_scale, smooth_k=smooth_k, smooth_v=False,
        qk_quant_gran=qk_quant_gran, pv_dtype="bf16", return_lse=return_lse,
        attn_mask=attn_mask,
        interpret=kwargs.pop("interpret", None),
        quant_backward=kwargs.pop("quant_backward", None),
    )


def sageattn_qk_int8_pv_int8(
    q, k, v,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    qk_quant_gran: str = "per_thread",
    sm_scale: Optional[float] = None,
    smooth_k: bool = True,
    smooth_v: bool = True,
    attn_mask=None,
    return_lse: bool = False,
    **kwargs: Any,
):
    """INT8 QK^T + INT8 PV (per-channel V scales, V-mean smoothing) — the
    TPU-native lowest-bit mode: both matmuls run at the MXU's 2x int8 rate.
    No direct reference analogue (the closest is the fp8-PV SageAttention2
    path, `core.py:636-826`); accuracy is maintained the same way — fine
    QK scale granularity + smoothing + exact normalization by the quantized
    P rowsum."""
    return _route(
        q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
        sm_scale=sm_scale, smooth_k=smooth_k, smooth_v=smooth_v,
        qk_quant_gran=qk_quant_gran, pv_dtype="int8", return_lse=return_lse,
        attn_mask=attn_mask,
        interpret=kwargs.pop("interpret", None),
        quant_backward=kwargs.pop("quant_backward", None),
    )


def sageattn_qk_int8_pv_fp8(
    q, k, v,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    qk_quant_gran: str = "per_thread",
    sm_scale: Optional[float] = None,
    smooth_k: bool = True,
    smooth_v: bool = True,
    attn_mask=None,
    return_lse: bool = False,
    **kwargs: Any,
):
    """INT8 QK^T + FP8(e4m3) PV with the exp-offset trick — SageAttention2
    equivalent (`core.py:636-826`; offset math `attn_utils.cuh:30,377-389`).
    Fast only on TPU generations with a native fp8 MXU (see dispatch.py);
    numerically valid everywhere."""
    return _route(
        q, k, v, tensor_layout=tensor_layout, is_causal=is_causal,
        sm_scale=sm_scale, smooth_k=smooth_k, smooth_v=smooth_v,
        qk_quant_gran=qk_quant_gran, pv_dtype="fp8", return_lse=return_lse,
        attn_mask=attn_mask,
        interpret=kwargs.pop("interpret", None),
        quant_backward=kwargs.pop("quant_backward", None),
    )


# ---------------------------------------------------------------------------
# Reference-compatible aliases (drop-in import parity).
# ---------------------------------------------------------------------------

def _alias(fn, note):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        kwargs.pop("pv_accum_dtype", None)       # accumulation is always fp32 on TPU
        kwargs.pop("quantization_backend", None)  # single backend on TPU
        return fn(*args, **kwargs)
    wrapper.__doc__ = note + "\n\n" + (fn.__doc__ or "")
    return wrapper


sageattn_qk_int8_pv_fp16_triton = _alias(
    sageattn_qk_int8_pv_bf16,
    "Reference-name alias (`core.py:160-331`): fp16 PV maps to bf16 PV on TPU.")
sageattn_qk_int8_pv_fp16_cuda = _alias(
    sageattn_qk_int8_pv_bf16,
    "Reference-name alias (`core.py:451-633`): fp16 PV maps to bf16 PV on TPU.")
sageattn_qk_int8_pv_fp8_cuda = _alias(
    sageattn_qk_int8_pv_fp8,
    "Reference-name alias (`core.py:636-826`).")
sageattn_qk_int8_pv_fp8_cuda_sm90 = _alias(
    sageattn_qk_int8_pv_fp8,
    "Reference-name alias (`core.py:829-996`).")


def flash_attention(
    q, k, v,
    tensor_layout: str = "HND",
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    return_lse: bool = False,
    block_q: int = 0,
    block_k: int = 0,
    interpret: Optional[bool] = None,
    sliding_window: int = 0,
    attention_sinks: int = 0,
):
    """Unquantized bf16 FlashAttention baseline (Pallas).

    This is the denominator of the >=2x performance target (BASELINE.md) and
    the numeric baseline the quantized modes are compared against.
    """
    layout = get_layout(tensor_layout)
    if not layout.is_hnd:
        q = jnp.swapaxes(q, 1, 2)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
    B, Hq, Sq, D_og = q.shape
    Sk = k.shape[2]
    if is_causal and Sq != Sk:
        raise ValueError("is_causal requires qo_len == kv_len")
    if sm_scale is None:
        sm_scale = 1.0 / (D_og ** 0.5)
    if interpret is None:
        interpret = dispatch.default_interpret()

    q, D = pad_head_dim(q, HND_LAYOUT)
    k, _ = pad_head_dim(k, HND_LAYOUT)
    v, _ = pad_head_dim(v, HND_LAYOUT)
    if block_q and block_k:
        bq, bk, bki = block_q, block_k, block_k
    else:
        bq, bk, bki = _choose_blocks(Sq, Sk, quantized=False)
    Sq_pad = round_up(Sq, bq)
    Sk_pad = round_up(Sk, bk)
    q = pad_axis(q, 2, Sq_pad).astype(jnp.bfloat16)
    k = pad_axis(k, 2, Sk_pad).astype(jnp.bfloat16)
    v = pad_axis(v, 2, Sk_pad).astype(jnp.bfloat16)

    if sliding_window and not is_causal:
        raise ValueError("sliding_window requires is_causal=True")
    if attention_sinks and not sliding_window:
        raise ValueError("attention_sinks requires sliding_window")
    cfg = AttnConfig(
        block_q=bq, block_k=bk, block_k_inner=bki, causal=is_causal,
        quantized=False, layout="HND", sm_scale=sm_scale, kv_len=Sk,
        out_dtype=jnp.bfloat16, emit_lse=return_lse,
        window=sliding_window, sinks=attention_sinks,
    )
    out, lse_b2 = attention_call(q, k, v, cfg=cfg, interpret=interpret)
    out = out[:, :, :Sq, :D_og]
    if not layout.is_hnd:
        out = jnp.swapaxes(out, 1, 2)
    if not return_lse:
        return out
    return out, _finish_lse(lse_b2, None, Sq)
