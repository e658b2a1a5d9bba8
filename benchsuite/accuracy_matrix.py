#!/usr/bin/env python
"""Compiled (Mosaic) accuracy matrix on the real TPU.

Sweeps the §4 config matrix — head dims, sequence lengths, causal, GQA,
quant/PV modes, varlen, masks — through the COMPILED kernels and reports
1 − cosine-sim against the fp32 jnp oracle, with the same bars the test
suite uses (int8 modes < 1e-3, fp8 PV < 2.5e-3 — post r5 vm-fold fix the
compiled fp8 path sits at 5e-4-1e-3).  This is the breadth evidence that the interpret-mode
CPU suite and the small `-m tpu` lane compile-check: run it after kernel
changes and paste the table into docs/PERF_NOTES.md.

Usage (TPU, ~25 distinct compiles ≈ 25 min through the tunnel):
  PYTHONPATH=/root/.axon_site:. python benchsuite/accuracy_matrix.py
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sageattention_tpu as sa
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff

FAILS = []


def mk(B=1, Hq=4, Hk=None, S=4096, Sk=None, D=128, key=0, scale=1.0):
    Hk = Hk or Hq
    Sk = Sk or S
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D), jnp.bfloat16) * scale
    k = jax.random.normal(ks[1], (B, Hk, Sk, D), jnp.bfloat16) * scale
    v = jax.random.normal(ks[2], (B, Hk, Sk, D), jnp.bfloat16)
    return q, k, v


def row(name, q, k, v, bar=1e-3, fn=None, **kw):
    fn = fn or sa.sageattn
    fn_kw = {k_: v_ for k_, v_ in kw.items() if k_ != "mask"}
    out = jax.jit(functools.partial(fn, **fn_kw))(q, k, v)
    ref = sdpa(q, k, v, **{k_: v_ for k_, v_ in kw.items()
                           if k_ in ("is_causal", "mask")})
    d = float(calc_diff(out, ref))
    ok = d < bar
    if not ok:
        FAILS.append(name)
    print(f"{name:<52} diff={d:.2e}  bar={bar:.0e}  "
          f"{'OK' if ok else 'FAIL'}", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # 1. flagship auto across head dims / lengths / causal
    for D in (64, 128):
        for S in (1024, 4096, 16384):
            q, k, v = mk(S=S, D=D, key=S + D)
            row(f"auto hd{D} S{S} dense", q, k, v)
            row(f"auto hd{D} S{S} causal", q, k, v, is_causal=True)

    # 2. explicit PV modes at hd128 S4096
    q, k, v = mk(key=1)
    row("pv bf16 dense", q, k, v, fn=sa.sageattn_qk_int8_pv_bf16)
    row("pv bf16 causal", q, k, v, fn=sa.sageattn_qk_int8_pv_bf16,
        is_causal=True)
    # fp8 bars tightened r5 after the vm-fold barrier fix (compiled now ==
    # interpret: dense 4.6e-4, causal ~1e-3, V-outlier 8.5e-4); 2.5e-3
    # keeps 2.5x headroom while catching any regression to the old 3-11e-3
    row("pv fp8 (exp-offset) dense", q, k, v, bar=2.5e-3,
        fn=sa.sageattn_qk_int8_pv_fp8)
    row("pv int8 online fine-gran", q, k, v,
        fn=sa.sageattn_qk_int8_pv_int8, k_scale_mode="fine",
        softmax_mode="online")
    row("int8-storage bf16-compute", q, k, v,
        fn=sa.sageattn_qk_int8_pv_int8, compute_dtype="bf16")

    # 3. GQA / unaligned
    q, k, v = mk(Hq=8, Hk=2, key=2)
    row("GQA 8q/2kv dense", q, k, v)
    row("GQA 8q/2kv causal", q, k, v, is_causal=True)
    q, k, v = mk(Hq=8, Hk=2, S=5000, key=3)
    row("GQA unaligned S5000", q, k, v)

    # 3b. r3 widening: fp8-PV causal, per_warp granularity, NHD layout
    q, k, v = mk(key=6)
    row("pv fp8 causal", q, k, v, bar=2.5e-3, fn=sa.sageattn_qk_int8_pv_fp8,
        is_causal=True)
    row("per_warp granularity dense", q, k, v, qk_quant_gran="per_warp")
    qn, kn, vn = (jnp.swapaxes(x, 1, 2) for x in mk(key=7))
    out = jax.jit(functools.partial(sa.sageattn, tensor_layout="NHD"))(
        qn, kn, vn)
    d = float(calc_diff(out, jnp.swapaxes(
        sdpa(jnp.swapaxes(qn, 1, 2), jnp.swapaxes(kn, 1, 2),
             jnp.swapaxes(vn, 1, 2)), 1, 2)))
    ok = d < 1e-3
    if not ok:
        FAILS.append("NHD layout")
    print(f"{'NHD layout (zero-copy path) dense':<52} diff={d:.2e}  "
          f"bar=1e-03  {'OK' if ok else 'FAIL'}", flush=True)
    qn, kn, vn = (jnp.swapaxes(x, 1, 2) for x in mk(key=8))
    out = jax.jit(functools.partial(sa.sageattn, tensor_layout="NHD",
                                    is_causal=True))(qn, kn, vn)
    d = float(calc_diff(out, jnp.swapaxes(
        sdpa(jnp.swapaxes(qn, 1, 2), jnp.swapaxes(kn, 1, 2),
             jnp.swapaxes(vn, 1, 2), is_causal=True), 1, 2)))
    ok = d < 1e-3
    if not ok:
        FAILS.append("NHD causal")
    print(f"{'NHD layout causal':<52} diff={d:.2e}  bar=1e-03  "
          f"{'OK' if ok else 'FAIL'}", flush=True)

    # 3c. 1-device ring (compiled shard_map path on the real chip)
    from jax.sharding import Mesh
    from sageattention_tpu.parallel import ring_sageattn
    import numpy as np
    mesh1 = Mesh(np.array(jax.devices()[:1]).reshape(1, 1, 1),
                 ("dp", "sp", "tp"))
    q, k, v = mk(S=2048, key=9)
    out = jax.jit(lambda a, b, c: ring_sageattn(
        a, b, c, mesh1, pv_dtype="int8"))(q, k, v)
    d = float(calc_diff(out, sdpa(q, k, v)))
    ok = d < 1.5e-3
    if not ok:
        FAILS.append("ring-1dev")
    print(f"{'ring attention (1-device mesh, compiled)':<52} diff={d:.2e}  "
          f"bar=2e-03  {'OK' if ok else 'FAIL'}", flush=True)

    # 4. bool mask (block-skip path)
    q, k, v = mk(key=4)
    keep = jax.random.bernoulli(jax.random.PRNGKey(9), 0.9,
                                (1, 1, 4096, 4096))
    row("bool attn_mask 90% keep", q, k, v, mask=keep, attn_mask=keep)

    # 5. varlen (ragged causal, 3 sequences)
    T = 4096
    cu = jnp.array([0, 1500, 2600, T], jnp.int32)
    ks_ = jax.random.split(jax.random.PRNGKey(5), 3)
    qp, kp, vp = (jax.random.normal(kk, (T, 4, 128), jnp.bfloat16)
                  for kk in ks_)
    ov = sa.sageattn_varlen(qp, kp, vp, cu, cu, 1600, 1600, is_causal=True)
    refs = []
    for i in range(3):
        a, b = int(cu[i]), int(cu[i + 1])
        refs.append(sdpa(qp[None, a:b].swapaxes(1, 2),
                         kp[None, a:b].swapaxes(1, 2),
                         vp[None, a:b].swapaxes(1, 2),
                         is_causal=True)[0].swapaxes(0, 1))
    d = float(calc_diff(ov, jnp.concatenate(refs, 0)))
    ok = d < 1e-3
    if not ok:
        FAILS.append("varlen")
    print(f"{'varlen causal 3-seq':<52} diff={d:.2e}  bar=1e-03  "
          f"{'OK' if ok else 'FAIL'}", flush=True)

    # 5b. r3 fuse_q_quant varlen: static softmax on MISMATCHED packings
    # (exact post-hoc lmin safety — the predictive bound had to refuse)
    cuq = jnp.array([0, 1800, 2800, T], jnp.int32)
    cuk = jnp.array([0, 1024, 2048, T], jnp.int32)
    ov = sa.sageattn_varlen(qp, kp, vp, cuq, cuk, 1800, 2048,
                            softmax_mode="static")
    refs = []
    for i in range(3):
        a, b = int(cuq[i]), int(cuq[i + 1])
        c, e = int(cuk[i]), int(cuk[i + 1])
        refs.append(sdpa(qp[None, a:b].swapaxes(1, 2),
                         kp[None, c:e].swapaxes(1, 2),
                         vp[None, c:e].swapaxes(1, 2))[0].swapaxes(0, 1))
    d = float(calc_diff(ov, jnp.concatenate(refs, 0)))
    ok = d < 1e-3
    if not ok:
        FAILS.append("varlen-mismatch-static")
    print(f"{'varlen mismatched packs, static (post-hoc)':<52} "
          f"diff={d:.2e}  bar=1e-03  {'OK' if ok else 'FAIL'}", flush=True)

    # 6. r3 serving features: sliding window, dense decode, paged decode
    q, k, v = mk(S=4096, key=10)
    rows_i = jnp.arange(4096)[:, None]
    cols_i = jnp.arange(4096)[None, :]
    band = ((cols_i <= rows_i) & (cols_i >= rows_i - 1023))[None, None]
    row("sliding window W=1024 causal", q, k, v, mask=band,
        is_causal=True, sliding_window=1024)

    from sageattention_tpu import decode as dec
    q1, kd, vd = mk(Hq=8, Hk=2, S=1, Sk=5000, key=11)
    cache = dec.kv_cache_init(kd, vd, max_len=5120)
    out = jax.jit(lambda a, c: dec.sageattn_decode(a, c))(q1, cache)
    ref = sdpa(q1, jnp.repeat(kd, 4, 1), jnp.repeat(vd, 4, 1))
    d = float(calc_diff(out, ref))
    ok = d < 2e-3
    if not ok:
        FAILS.append("decode")
    print(f"{'int8-cache decode T=1 GQA S5000':<52} diff={d:.2e}  "
          f"bar=2e-03  {'OK' if ok else 'FAIL'}", flush=True)

    from sageattention_tpu.paged import (
        PageAllocator, build_table, paged_prefill, sageattn_decode_paged)
    PAGE = 256
    lens = [5000, 3000]
    q2, kp2, vp2 = mk(B=2, Hq=8, Hk=2, S=1, Sk=5120, key=12)
    alloc = PageAllocator(64, PAGE)
    table = build_table([alloc.reserve(20)[::-1], alloc.reserve(20)],
                        max_pages=20)
    pc = paged_prefill(kp2, vp2, jnp.asarray(lens), table, num_pages=64)
    out = jax.jit(lambda a, c: sageattn_decode_paged(a, c))(q2, pc)
    d = 0.0
    for b, L in enumerate(lens):
        refb = sdpa(q2[b:b + 1], jnp.repeat(kp2[b:b + 1, :, :L], 4, 1),
                    jnp.repeat(vp2[b:b + 1, :, :L], 4, 1))
        d = max(d, float(calc_diff(out[b:b + 1], refb)))
    ok = d < 2e-3
    if not ok:
        FAILS.append("paged-decode")
    print(f"{'paged decode ragged 2-seq shuffled tables':<52} diff={d:.2e}  "
          f"bar=2e-03  {'OK' if ok else 'FAIL'}", flush=True)

    # r5 superpage-run path: contiguous aligned tables take the run
    # kernel through the wrapper's lax.cond — the DEFAULT for fresh /
    # run-aware-allocated pools, so its compiled numerics get a row
    alloc2 = PageAllocator(64, PAGE)
    tablec = build_table([alloc2.reserve(20), alloc2.reserve(20)],
                         max_pages=20)
    pcc = paged_prefill(kp2, vp2, jnp.asarray(lens), tablec, num_pages=64)
    outc = jax.jit(lambda a, c: sageattn_decode_paged(a, c))(q2, pcc)
    d = 0.0
    for b, L in enumerate(lens):
        refb = sdpa(q2[b:b + 1], jnp.repeat(kp2[b:b + 1, :, :L], 4, 1),
                    jnp.repeat(vp2[b:b + 1, :, :L], 4, 1))
        d = max(d, float(calc_diff(outc[b:b + 1], refb)))
    ok = d < 2e-3
    if not ok:
        FAILS.append("paged-runs")
    print(f"{'paged decode contiguous (superpage runs)':<52} diff={d:.2e}  "
          f"bar=2e-03  {'OK' if ok else 'FAIL'}", flush=True)

    out = jax.jit(lambda a, c: sageattn_decode_paged(
        a, c, sliding_window=1024))(q2, pc)
    d = 0.0
    for b, L in enumerate(lens):
        lo = max(0, L - 1024)
        refb = sdpa(q2[b:b + 1], jnp.repeat(kp2[b:b + 1, :, lo:L], 4, 1),
                    jnp.repeat(vp2[b:b + 1, :, lo:L], 4, 1))
        d = max(d, float(calc_diff(out[b:b + 1], refb)))
    ok = d < 2e-3
    if not ok:
        FAILS.append("paged-swa-decode")
    print(f"{'paged decode sliding window W=1024':<52} diff={d:.2e}  "
          f"bar=2e-03  {'OK' if ok else 'FAIL'}", flush=True)

    # 7. r4 outlier-realistic rows (VERDICT r3 weak #5): the regimes
    # smooth_k / fine granularity exist for — LLM-activation-like K channel
    # bias (50-100x RMS) and heavy-tailed t(3) Q/K.  Margins pinned on CPU
    # in tests/test_outliers.py; these are the COMPILED-kernel confirmations.
    q, k, v = mk(S=4096, key=13)
    k = k.at[..., :3].add(jnp.asarray([60.0, -45.0, 80.0], k.dtype))
    row("K channel-bias 60-80x, smooth_k (auto)", q, k, v)
    d_off = float(calc_diff(
        jax.jit(functools.partial(sa.sageattn_qk_int8_pv_bf16,
                                  smooth_k=False))(q, k, v),
        sdpa(q, k, v)))
    print(f"{'  (margin: smooth_k=False reads)':<52} diff={d_off:.2e}  "
          f"(expected >20x the smoothed row)", flush=True)

    kq, kk2, kv2 = jax.random.split(jax.random.PRNGKey(14), 3)
    q = jax.random.t(kq, 3.0, (1, 4, 4096, 128), jnp.float32
                     ).astype(jnp.bfloat16)
    k = jax.random.t(kk2, 3.0, (1, 4, 4096, 128), jnp.float32
                     ).astype(jnp.bfloat16)
    v = jax.random.normal(kv2, (1, 4, 4096, 128), jnp.bfloat16)
    # Bars (r5 recalibration): the original 8e-3 was extrapolated from the
    # CPU suite's S=512/D=64 margins; at S=4096/D=128 the t(3) spikes are
    # larger (16x more samples) and the AUTO path's per-HEAD K scale — the
    # static-softmax speed tradeoff — costs 5x accuracy vs fine K groups.
    # Cross-checked r5: interpret mode reproduces the compiled numbers
    # exactly (auto 1.39e-2 vs 1.31e-2, causal 1.92e-2 vs 1.86e-2,
    # per_thread 2.46e-3 vs 2.46e-3) — inherent to the math at this shape,
    # not a kernel defect.  The remedy for outlier-heavy K is the fine-K
    # ladder below (reference parity: its flagship always runs per-thread
    # granularity, `/root/reference/sageattention/core.py:792-793`).
    row("heavy-tail t3 auto (per-row Q quant)", q, k, v, bar=2.5e-2)
    row("heavy-tail t3 causal", q, k, v, bar=2.5e-2, is_causal=True)
    for gran, gbar in (("per_block", 3e-2), ("per_thread", 8e-3)):
        row(f"heavy-tail t3 {gran} (margin ladder)", q, k, v, bar=gbar,
            fn=sa.sageattn_qk_int8_pv_bf16, qk_quant_gran=gran,
            fuse_q_quant=False)

    q, k, v = mk(S=4096, key=15)
    v = v.at[..., 5].multiply(80.0)
    row("V channel x80 per-channel scale (pv int8)", q, k, v,
        fn=sa.sageattn_qk_int8_pv_int8)
    row("V channel x80 (pv fp8)", q, k, v, bar=2.5e-3,
        fn=sa.sageattn_qk_int8_pv_fp8)

    print(f"MATRIX {'PASS' if not FAILS else 'FAIL: ' + ', '.join(FAILS)}",
          flush=True)
    return 1 if FAILS else 0


if __name__ == "__main__":
    sys.exit(main())
