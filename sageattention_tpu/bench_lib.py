"""Benchmark library (reference `bench/` equivalent).

Kernel-scope timing: quantization preprocessing excluded, exactly like the
reference's published numbers (`/root/reference/README.md:174` "quantization
and smoothing excluded"; formula `bench_qk_int8_pv_fp16_cuda.py:39`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .dispatch import default_interpret, detect
from .ops.attention import AttnConfig, attention_call
from .utils.testing import attention_tflops, time_fn

from .core import _choose_blocks  # tuned tile heuristic (v5e-measured)


def _prep(B, H, S, D, pv_dtype, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    q_i8 = (jax.random.normal(ks[0], (B, H, S, D)) * 30).astype(jnp.int8)
    k_i8 = (jax.random.normal(ks[1], (B, H, S, D)) * 30).astype(jnp.int8)
    q_scale = jax.random.uniform(ks[2], (B, H, S, 1), jnp.float32, 0.01, 0.02)
    k_scale = jax.random.uniform(ks[3], (B, H, 1, S), jnp.float32, 0.01, 0.02)
    if pv_dtype == "bf16":
        v = jax.random.normal(ks[4], (B, H, S, D), jnp.bfloat16)
        v_scale = None
    elif pv_dtype == "int8":
        v = (jax.random.normal(ks[4], (B, H, S, D)) * 30).astype(jnp.int8)
        v_scale = jnp.full((B, H, 1, D), 0.02, jnp.float32)
    else:
        v = jax.random.normal(ks[4], (B, H, S, D)).astype(jnp.float8_e4m3fn)
        v_scale = jnp.full((B, H, 1, D), 0.02, jnp.float32)
    return q_i8, k_i8, v, q_scale, k_scale, v_scale


def bench_kernel(B=4, H=32, S=8192, D=128, causal=False, pv_dtype="int8",
                 blocks=None, quantized=True, fold_k=True,
                 compute_dtype="native", softmax_mode="online", reps=10,
                 interpret: Optional[bool] = None):
    """Time one kernel config; returns (seconds, tflops)."""
    if interpret is None:
        interpret = default_interpret()
    if blocks is None:
        bq, bk, bki = _choose_blocks(S, S, quantized, compute_dtype,
                                     causal=causal)
    else:
        bq, bk = (min(b, S) for b in blocks[:2])
        bki = blocks[2] if len(blocks) > 2 else bk
    cfg = AttnConfig(block_q=bq, block_k=bk, block_k_inner=bki, causal=causal,
                     quantized=quantized, pv_dtype=pv_dtype, layout="HND",
                     fp8_native_dot=detect().has_fast_fp8,
                     kv_len=S, out_dtype=jnp.bfloat16,
                     fold_k_scale=quantized and fold_k,
                     compute_dtype=compute_dtype, softmax_mode=softmax_mode,
                     # inference scope: sageattn(return_lse=False) skips the
                     # lse store (r3), so the kernel bench does too
                     emit_lse=False)
    if quantized:
        q, k, v, qs, ks, vs = _prep(B, H, S, D, pv_dtype)
        cap = None
        if softmax_mode == "static":
            # per-(b,h) K-side cap factor; the kernel builds the per-row
            # cap qs*||q8||*kn_max itself (ops/attention.py)
            kn = jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=3))
            if not fold_k:
                kn = kn * ks[:, :, 0, :]
            cap = jnp.max(kn, axis=2)[:, :, None, None]
        fn = jax.jit(functools.partial(attention_call, cfg=cfg, interpret=interpret))
        args = (q, k, v, qs, None if fold_k else ks) \
            + ((vs,) if pv_dtype != "bf16" else ())
        if softmax_mode == "static":
            fn_inner = fn

            def fn(*a):  # kn_max is keyword-only downstream
                return fn_inner(*a, kn_max=cap)
    else:
        ks_ = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks_[0], (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(ks_[1], (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(ks_[2], (B, H, S, D), jnp.bfloat16)
        cfg = AttnConfig(block_q=bq, block_k=bk, block_k_inner=bki,
                         causal=causal, quantized=False, layout="HND",
                         sm_scale=D ** -0.5, kv_len=S, out_dtype=jnp.bfloat16)
        fn = jax.jit(functools.partial(attention_call, cfg=cfg, interpret=interpret))
        args = (q, k, v)
    t = time_fn(fn, *args, reps=reps)
    return t, attention_tflops(B, H, S, S, D, causal, t)


def bench_e2e(B=4, H=32, S=8192, D=128, causal=False, pv_dtype=None,
              compute_dtype=None, softmax_mode="auto", reps=10):
    """END-TO-END scope: the public ``sageattn`` call from bf16 inputs —
    fused Pallas quantization, smoothing, kernel, and repairs all included.
    The reference's published numbers exclude quantization
    (`/root/reference/README.md:174`); this row quantifies what that
    exclusion hides (the fused CUDA quant is ~free there; our Pallas quant
    should be too)."""
    from .core import sageattn
    caps = detect()
    pv_dtype = pv_dtype or caps.default_pv_dtype
    compute_dtype = compute_dtype or caps.default_compute_dtype
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
    fn = jax.jit(functools.partial(
        sageattn, is_causal=causal, pv_dtype=pv_dtype,
        compute_dtype=compute_dtype, softmax_mode=softmax_mode))
    t = time_fn(fn, q, k, v, reps=reps)
    return t, attention_tflops(B, H, S, S, D, causal, t)


def bench_stock_flash(B=4, H=32, S=8192, D=128, causal=False, reps=10):
    """The canonical FP16/bf16 Pallas flash baseline:
    jax.experimental.pallas.ops.tpu.flash_attention with block sizes tuned
    as well as its API allows (defaults measure 17 TFLOPS at S=8192 —
    grid-overhead-bound; see docs/PERF_NOTES.md)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
    bs = BlockSizes(block_q=512, block_k_major=1024, block_k=512, block_b=1,
                    block_q_major_dkv=512, block_k_major_dkv=512,
                    block_k_dkv=512, block_q_dkv=512,
                    block_k_major_dq=512, block_k_dq=512, block_q_dq=512)
    fn = jax.jit(functools.partial(flash_attention, causal=causal,
                                   sm_scale=D ** -0.5, block_sizes=bs))
    t = time_fn(fn, q, k, v, reps=reps)
    return t, attention_tflops(B, H, S, S, D, causal, t)


def run_headline(S=8192, D=128, B=4, H=32):
    """Driver-facing headline: the auto-dispatched sageattn kernel (int8
    storage, generation-optimal compute) vs the FP16 Pallas flash baseline
    (stock jax flash-attention, tuned — the TPU incumbent, playing the role
    FlashAttention2 plays in the reference's headline).  Reference
    methodology: kernel scope, TFLOPS = 4HBD*S^2/t."""
    caps = detect()
    pv = caps.default_pv_dtype
    compute = caps.default_compute_dtype
    softmax = "online" if pv == "fp8" else "static"
    t_stock, tf_stock = bench_stock_flash(B, H, S, D)
    t_ours, tf_ours = bench_kernel(B, H, S, D, pv_dtype="bf16", quantized=False)
    t_q, tf_q = bench_kernel(B, H, S, D, pv_dtype=pv, quantized=True,
                             compute_dtype=compute, softmax_mode=softmax)
    # causal (the reference benches ±causal; our largest relative win) and
    # e2e scope (quant preamble INCLUDED — the reference excludes it)
    t_oc, tf_oc = bench_kernel(B, H, S, D, causal=True, pv_dtype="bf16",
                               quantized=False)
    t_qc, tf_qc = bench_kernel(B, H, S, D, causal=True, pv_dtype=pv,
                               quantized=True, compute_dtype=compute,
                               softmax_mode=softmax)
    _, tf_e2e = bench_e2e(B, H, S, D)
    # hd64 lane (the reference benches hd64 + hd128 everywhere,
    # `bench_qk_int8_pv_fp16_cuda.py:9-11`).  r5 block sweep
    # (benchsuite/logs/r5_hd64_sweep.log): the hd128-tuned defaults are
    # within noise of the best hd64 tiling; absolute TFLOPS halve because
    # the D=64 QK^T contraction half-fills the MXU — the flash baseline
    # pays the same, so the speedup holds.
    t_f64, tf_f64 = bench_kernel(B, H, S, 64, pv_dtype="bf16",
                                 quantized=False)
    t_q64, tf_q64 = bench_kernel(B, H, S, 64, pv_dtype=pv, quantized=True,
                                 compute_dtype=compute, softmax_mode=softmax)
    t_f64c, tf_f64c = bench_kernel(B, H, S, 64, causal=True,
                                   pv_dtype="bf16", quantized=False)
    t_q64c, tf_q64c = bench_kernel(B, H, S, 64, causal=True, pv_dtype=pv,
                                   quantized=True, compute_dtype=compute,
                                   softmax_mode=softmax)
    dec = bench_decode()
    return {
        "metric": (f"sageattn qk-int8 pv-{pv} compute-{compute} "
                   f"softmax-{softmax} TFLOPS "
                   f"(B{B} H{H} S{S} hd{D}, kernel scope)"),
        "value": round(tf_q, 1),
        "unit": "TFLOPS",
        "vs_baseline": round(t_stock / t_q, 3),
        "baseline": "stock jax pallas flash_attention (tuned blocks)",
        "baseline_tflops": round(tf_stock, 1),
        "our_flash_tflops": round(tf_ours, 1),
        "vs_our_flash": round(t_ours / t_q, 3),
        "causal_tflops": round(tf_qc, 1),
        "causal_vs_our_flash": round(t_oc / t_qc, 3),
        "causal_our_flash_tflops": round(tf_oc, 1),
        "e2e_tflops_quant_included": round(tf_e2e, 1),
        "hd64_tflops": round(tf_q64, 1),
        "hd64_vs_our_flash": round(t_f64 / t_q64, 3),
        "hd64_our_flash_tflops": round(tf_f64, 1),
        "hd64_causal_tflops": round(tf_q64c, 1),
        "hd64_causal_vs_our_flash": round(t_f64c / t_q64c, 3),
        "decode_16k_us": dec["int8_us"],
        "decode_16k_vs_xla_bf16": dec["vs_xla"],
        "device": caps.generation,
    }


def bench_decode(L=16384, B=8, Hq=32, Hk=8, D=128, reps=50):
    """Serving headline: one int8-KV-cache decode step (GQA fold, whole-tile
    dots, kv_split multi-stream DMA) vs the stock-JAX bf16-cache decode —
    the serving analogue of the prefill headline.  Wall scope (queued host
    calls, one sync); the full table lives in benchsuite/probe_decode.py."""
    import numpy as np

    from .decode import kv_cache_init, sageattn_decode

    r = jax.random.split(jax.random.PRNGKey(0), 3)
    k = jax.random.normal(r[0], (B, Hk, L, D), jnp.bfloat16)
    v = jax.random.normal(r[1], (B, Hk, L, D), jnp.bfloat16)
    q = jax.random.normal(r[2], (B, Hq, 1, D), jnp.bfloat16)
    cache = kv_cache_init(k, v, max_len=L)

    def xla_decode(q, k, v):
        G = q.shape[1] // k.shape[1]
        kk = jnp.repeat(k, G, axis=1)
        vv = jnp.repeat(v, G, axis=1)
        s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                       kk.astype(jnp.float32)) * (1.0 / np.sqrt(D))
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", p, vv.astype(jnp.float32)
                          ).astype(jnp.bfloat16)

    fn = jax.jit(lambda q, c: sageattn_decode(q, c, bucket=L))
    t_int8 = time_fn(fn, q, cache, reps=reps)
    t_xla = time_fn(jax.jit(xla_decode), q, k, v, reps=reps)
    return {"int8_us": round(t_int8 * 1e6, 1),
            "vs_xla": round(t_xla / t_int8, 2)}


def run_sweep(seqs=(1024, 2048, 4096, 8192, 16384, 32768), D=128, B=4, H=32,
              causal=False):
    """Reference-style sweep table (bench/bench_qk_int8_pv_*_cuda.py)."""
    caps = detect()
    softmax = "online" if caps.default_pv_dtype == "fp8" else "static"
    rows = []
    for S in seqs:
        t_b, tf_b = bench_kernel(B, H, S, D, causal=causal, pv_dtype="bf16",
                                 quantized=False)
        t_q, tf_q = bench_kernel(B, H, S, D, causal=causal,
                                 pv_dtype=caps.default_pv_dtype,
                                 compute_dtype=caps.default_compute_dtype,
                                 softmax_mode=softmax)
        rows.append({"seq": S, "flash_tflops": round(tf_b, 1),
                     "sage_tflops": round(tf_q, 1),
                     "speedup": round(t_b / t_q, 3)})
    return rows
