"""Ring attention over ICI — quantized KV blocks rotate with their scales.

The reference only *hooks into* external ring attention via ``return_lse``
(`/root/reference/sageattention/core.py:120-133`); xDiT does the actual
communication with NCCL.  Here the ring is in-repo and TPU-native:

  - ``shard_map`` over the "sp" mesh axis, ``jax.lax.ppermute`` rotation —
    point-to-point neighbor transfers that ride ICI links.
  - K/V are quantized ONCE per shard before the ring starts; the **int8
    payloads + their scales** rotate, halving ring bandwidth vs bf16.  Only
    live buffers rotate (no dummy placeholders in the permuted tree).
  - K-mean smoothing needs the *global* K mean: a ``pmean`` over the ring
    axis before quantization (SURVEY.md §7 "hard parts").
  - Each step's ppermute is issued BEFORE that step's attention, so XLA's
    latency-hiding scheduler can overlap the collective-permute of chunk
    t+1 with the compute on chunk t (the TPU analogue of the NCCL
    send/recv-compute overlap external ring implementations do).
  - Partial outputs are written bf16 (half the HBM traffic per step) and
    merged in fp32 by lse-weighted online-softmax combination — the same
    math the kernel uses across KV tiles, applied across chips.
  - Causal masking uses the kernel's dynamic q/kv offsets: off-diagonal
    source chunks skip all their tiles inside the kernel at runtime.
  - GQA (Hq a multiple of Hk) is supported: K-side per-head scales, V
    scales and means broadcast over the query head groups here, and the
    kernel indexes KV heads by ``h // (Hq//Hk)`` natively.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..dispatch import default_interpret, detect
from ..ops import quant as quant_ops
from ..ops.attention import AttnConfig, attention_call
from ..utils.layout import round_up
from .mesh import DP, SP, TP

LOG2E = quant_ops.LOG2E


def _merge(o1, lse1, o2, lse2):
    """Combine two attention partials (natural-log lse), lse-weighted."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    l = w1 + w2
    l = jnp.where(l == 0.0, 1.0, l)
    o = (o1.astype(jnp.float32) * w1[..., None] + o2.astype(jnp.float32) * w2[..., None]) / l[..., None]
    return o, m + jnp.log(l)


def _repeat_heads(x, G):
    """Broadcast a KV-head tensor [B,Hk,...] over query head groups -> [B,Hq,...]."""
    return x if G == 1 else jnp.repeat(x, G, axis=1)


def _ring_body(
    q, k, v, *, axis_name, is_causal, sm_scale, qk_quant_gran, pv_dtype,
    compute_dtype, interpret, block_q, block_k, block_k_inner, return_lse,
    softmax_mode, s_true=0,
):
    """Runs on each device inside shard_map.  q: [B, Hq, S_local, D],
    k/v: [B, Hk, S_local, D]; head_dim and seq already padded/aligned by
    the caller.

    With fold_k (head K scales — the bf16-compute and static-softmax modes)
    K is quantized per head per shard; the rotating chunk carries its scalar
    scale, which is folded into the per-row Q scales each step before the
    kernel call.

    softmax_mode="static" runs each per-chunk kernel with the static
    Cauchy–Schwarz cap (the v5e flagship softmax): the chunk's max||k8||
    rotates with its payload, and safety is decided ONCE globally (pmax of
    the per-chunk cap factors before the loop) so every step's lax.cond
    takes the same branch on a device and no collective sits inside a
    divergent branch.  Per-chunk underflow is harmless here: a chunk whose
    rows all underflow contributes o=0 with an lse ~cap-123 that the
    lse-weighted merge reduces to ~0 weight (the diagonal chunk, which
    always sees the self logits, anchors every row — same argument as the
    single-chip diagonal bound)."""
    B, Hq, S, D = q.shape
    Hk = k.shape[1]
    G = Hq // Hk
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    static_mode = softmax_mode == "static"
    # r3 padding support: when the global sequence was padded up to n*S,
    # only positions < s_true are real.  Statistics mask the pad rows; the
    # kernel masks pad COLUMNS through a per-chunk dynamic kv-length
    # (the chunk from source shard c has clip(s_true - c*S, 0, S) real
    # rows — computable locally, nothing extra travels the ring).
    padded = bool(s_true) and s_true != n * S
    if padded:
        rows = idx * S + jnp.arange(S)
        valid = (rows < s_true)[None, None, :, None]             # [1,1,S,1]

    # Global K mean over the ring (smooth_k with exact global mean; masked
    # sum when padded so pad rows don't bias it).
    if padded:
        km = jax.lax.psum(
            jnp.sum(k.astype(jnp.float32) * valid, axis=2, keepdims=True),
            axis_name) * (1.0 / s_true)
        # pad rows of K become the mean itself: k - km == 0 there, so the
        # head amax, the quant codes, and the static capmax all see zeros
        k = jnp.where(valid, k, km.astype(k.dtype))
    else:
        km_local = jnp.mean(k.astype(jnp.float32), axis=2, keepdims=True)
        km = jax.lax.pmean(km_local, axis_name)

    q_group, k_group = quant_ops.QUANT_GRANULARITIES[qk_quant_gran]
    fold_k = compute_dtype == "bf16" or static_mode
    fold = sm_scale * LOG2E
    # Fused Pallas quant on the compiled path (same read-once/write-once
    # kernels the single-chip pipeline uses — ops/quant_pallas.py); the jnp
    # path serves interpret/CPU-mesh runs.  The scalar-mode capmax output IS
    # the chunk's max||k8|| cap factor, so static mode gets kn_local for
    # free in the K quant pass.
    use_fused = not interpret
    if use_fused:
        from ..ops import quant_pallas as qp
    kn_local = None
    q_capmax = None
    if fold_k:
        kf32 = k.astype(jnp.float32) - km
        amax = jnp.max(jnp.abs(kf32), axis=(2, 3), keepdims=True)
        k_head_scale = jnp.where(amax > 0, amax * (1.0 / 127.0), 1.0)  # [B,Hk,1,1]
        if use_fused:
            if static_mode:
                k_i8, kn_local = qp.quant_int8_fixed_pallas(
                    k, k_head_scale, sub=km, with_capmax=True)
                q_i8, q_s, q_capmax = qp.quant_int8_groupwise_pallas(
                    q, q_group, fold=fold, with_capmax=True)
            else:
                k_i8 = qp.quant_int8_fixed_pallas(k, k_head_scale, sub=km)
                q_i8, q_s = qp.quant_int8_groupwise_pallas(
                    q, q_group, fold=fold)
        else:
            k_i8 = jnp.clip(jnp.rint(kf32 / k_head_scale),
                            -127, 127).astype(jnp.int8)
            q_i8, q_s = quant_ops.quant_int8_groupwise(q, q_group, fold=fold)
        k_scale = None
    else:
        if use_fused:
            q_i8, q_s = qp.quant_int8_groupwise_pallas(q, q_group, fold=fold)
            k_i8, k_s = qp.quant_int8_groupwise_pallas(k, k_group, sub=km)
        else:
            q_i8, q_s = quant_ops.quant_int8_groupwise(q, q_group, fold=fold)
            k_i8, k_s = quant_ops.quant_int8_groupwise(k, k_group, sub=km)
        k_scale = quant_ops.expand_scales_cols(k_s, k_group, S)
        k_head_scale = None
    q_scale = quant_ops.expand_scales_rows(q_s, q_group, S)

    static_safe = None
    if static_mode:
        if kn_local is None:
            # jnp fallback: max over the shard's rows of ||k8|| [B,Hk,1,1]
            kn_local = jnp.max(jnp.sqrt(jnp.sum(
                jnp.square(k_i8.astype(jnp.float32)), axis=3)),
                axis=2)[:, :, None, None]
        # worst chunk factor anywhere on the ring, decided once up front
        g_kfac = jax.lax.pmax(kn_local * k_head_scale, axis_name)
        if is_causal:
            # ADVICE r2: under causal masking the visible row max can sit
            # far below 0 (the smooth_k row-mean-zero argument covers ALL
            # columns, not the visible prefix), so anchor the bound with
            # the per-row DIAGONAL logit — the self logit is always visible
            # and lives in this device's own chunk, where q and k rows are
            # position-aligned.  slack_i = cap_i - diag_i <= 80 guarantees
            # no globally-significant logit underflows in ANY chunk
            # (cap_i bounds every chunk's logits via g_kfac).
            q8f = q_i8.astype(jnp.float32)
            qn_row = jnp.sqrt(jnp.sum(q8f * q8f, axis=3, keepdims=True))
            cap_row = (q_scale * qn_row * _repeat_heads(g_kfac, G)
                       * (1.0 + 1e-5))                   # [B,Hq,S,1]
            diag = jnp.sum(q8f * _repeat_heads(k_i8, G).astype(jnp.float32),
                           axis=3, keepdims=True)
            diag = diag * q_scale * _repeat_heads(k_head_scale, G)
            static_safe = jnp.all(cap_row - diag <= 80.0)
        else:
            if q_capmax is None:
                q_capmax = jnp.max(q_scale * jnp.sqrt(jnp.sum(
                    jnp.square(q_i8.astype(jnp.float32)), axis=3,
                    keepdims=True)), axis=2, keepdims=True)  # [B,Hq,1,1]
            # dense: global smooth_k row mean 0 => visible row max >= 0,
            # so the absolute cap bound suffices
            static_safe = jnp.all(
                q_capmax * _repeat_heads(g_kfac, G) * (1.0 + 1e-5) <= 80.0)

    vm = None
    v_scale = None
    if padded:
        # per-chunk channel stats over REAL rows only (the local true count
        # is dynamic, so the jnp masked form replaces the fused stats pass;
        # quantized pad rows are garbage the kernel's dynamic kv mask hides)
        n_real = jnp.clip(s_true - idx * S, 0, S).astype(jnp.float32)
        vf = v.astype(jnp.float32)
        vm_pad = (jnp.sum(vf * valid, axis=2, keepdims=True)
                  / jnp.maximum(n_real, 1.0))
        va_pad = jnp.max(jnp.abs(vf - vm_pad) * valid, axis=2, keepdims=True)
    if pv_dtype == "bf16":
        v_in = v.astype(jnp.bfloat16)
    elif pv_dtype == "int8":
        if padded:
            vm, v_amax = vm_pad, va_pad
            v_scale = jnp.where(v_amax > 0, v_amax * (1.0 / 127.0), 1.0)
            if use_fused:
                v_in = qp.quant_int8_fixed_pallas(v, v_scale, sub=vm)
            else:
                v_in = jnp.clip(jnp.rint((vf - vm) / v_scale),
                                -127, 127).astype(jnp.int8)
        elif use_fused:
            vm, v_amax = qp.channel_stats_pallas(v, S)
            v_scale = jnp.where(v_amax > 0, v_amax * (1.0 / 127.0), 1.0)
            v_in = qp.quant_int8_fixed_pallas(v, v_scale, sub=vm)
        else:
            v_in, vs, vm = quant_ops.per_channel_int8(v, "HND", smooth_v=True)
            v_scale = vs[:, :, None, :]
    elif padded:
        vm, v_amax = vm_pad, va_pad
        v_scale = jnp.where(v_amax > 0, v_amax * (1.0 / 448.0), 1.0)
        v_in = ((v.astype(jnp.float32) - vm) / v_scale
                ).astype(jnp.float8_e4m3fn)
    else:
        v_in, vs, vm = quant_ops.per_channel_fp8(v, "HND", smooth_v=True)
        v_scale = vs[:, :, None, :]

    def _cfg(mode):
        return AttnConfig(
            block_q=block_q, block_k=block_k, block_k_inner=block_k_inner,
            causal=is_causal,
            causal_dynamic=is_causal,  # offsets vary with the rotating source
            quantized=True, fold_k_scale=fold_k, compute_dtype=compute_dtype,
            pv_dtype=pv_dtype, layout="HND", kv_len=S, softmax_mode=mode,
            fp8_native_dot=detect().has_fast_fp8,
            # keep P bf16 in the online fallback so both branches of the
            # safety cond share numerics (as core._sage_attention does)
            pv_via_bf16=(mode == "online" and static_mode),
            kv_len_dynamic=padded,
            # bf16 partials: merged in fp32 below; halves per-step HBM writes.
            out_dtype=jnp.bfloat16,
        )

    def step_attend(state, kv_chunk, step):
        o_acc, lse_acc = state
        src = (idx - step) % n
        offsets = jnp.stack([idx * S, src * S]).astype(jnp.int32)
        # real-row count of the incoming chunk (derived locally from its
        # source index; nothing extra rotates)
        kv_true_c = (jnp.clip(s_true - src * S, 0, S).astype(jnp.int32)
                     if padded else None)
        k_i8_c = kv_chunk["k"]
        v_c = kv_chunk["v"]
        if fold_k:
            # chunk's per-head K scale (KV heads) folds into per-row Q scales
            qs_step = q_scale * _repeat_heads(kv_chunk["ks_head"], G)[:, :, :, 0:1]
            ks_c = None
        else:
            qs_step = q_scale
            ks_c = kv_chunk["ks"]
        vs_c = kv_chunk.get("vs")

        def _call(mode):
            return attention_call(
                q_i8, k_i8_c, v_c, qs_step, ks_c, vs_c,
                offsets=offsets if is_causal else None,
                kn_max=(_repeat_heads(kv_chunk["knmax"], G)
                        if mode == "static" else None),
                kv_true_dyn=kv_true_c,
                cfg=_cfg(mode), interpret=interpret)

        if static_mode:
            # the predicate is global (pmax'd) so both kernels are pure —
            # no collective inside a potentially divergent branch
            o_p, lse_b2 = jax.lax.cond(
                static_safe, lambda: _call("static"),
                lambda: _call("online"))
        else:
            o_p, lse_b2 = _call(softmax_mode)
        lse_p = lse_b2 / LOG2E
        # smooth_v repair must happen pre-merge (each chunk has its own vm):
        # o_true_chunk = o_p + vm_chunk (rows with l==0 produce o_p=0 and
        # lse=-inf so the merge weight kills the spurious +vm).
        o_p = o_p.astype(jnp.float32)
        if vm is not None:
            o_p = o_p + _repeat_heads(kv_chunk["vm"], G)
        return _merge(o_acc, lse_acc, o_p, lse_p)

    o_acc = jnp.zeros((B, Hq, S, D), jnp.float32)
    lse_acc = jnp.full((B, Hq, S), -jnp.inf, jnp.float32)
    # int8 payloads + their scales travel together around the ring; only
    # live buffers enter the permuted tree.
    chunk = {"k": k_i8, "v": v_in}
    if fold_k:
        chunk["ks_head"] = k_head_scale
    else:
        chunk["ks"] = k_scale
    if static_mode:
        chunk["knmax"] = kn_local  # cap factor travels with its payload
    if v_scale is not None:
        chunk["vs"] = v_scale
    if vm is not None:
        chunk["vm"] = vm
    for step in range(n):
        if step != n - 1:
            # issue the rotation FIRST: no data dependency on this step's
            # attention, so the collective-permute overlaps the compute.
            next_chunk = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), chunk)
        o_acc, lse_acc = step_attend((o_acc, lse_acc), chunk, step)
        if step != n - 1:
            chunk = next_chunk

    # smooth_k lse repair (global km).
    lse_corr = jnp.einsum("bhsd,bhod->bhs", q.astype(jnp.float32),
                          _repeat_heads(km, G)) * sm_scale
    lse_acc = lse_acc + lse_corr
    o_acc = o_acc.astype(q.dtype)
    if return_lse:
        return o_acc, lse_acc
    return o_acc


def _ring_bwd_body(q, k, v, o, lse, do, *, axis_name, is_causal, sm_scale,
                   quantized, interpret):
    """Context-parallel backward: the q-side rotates, KV stays home.

    Completes the reference's training story for its ring hook
    (`/root/reference/sageattention/core.py:120-133` exposes lse for
    external ring forwards only).  Each device keeps its (k, v) shard
    resident and accumulates dK/dV in f32 across all q sources; the
    rotating payload is (q, do, lse, di) — di = rowsum(dO*O) is computed
    once up front so ``o`` itself never travels — plus an f32 dQ
    accumulator that hops WITH its chunk and lands home after the final
    rotation (n dQ hops, n-1 payload hops; the payload permute is issued
    before the step's compute so it overlaps, like the forward).

    Causal masking across shards is all-or-nothing at shard granularity
    (shards are contiguous in sequence order): a q chunk from source s
    against home kv shard j is fully visible when s > j, standard aligned
    causal when s == j, and contributes nothing when s < j — so the
    single-chip backward kernels are reused unchanged per pair, with a
    3-way lax.switch instead of in-kernel offsets."""
    from ..ops.backward_pallas import attention_backward_pallas

    B, Hq, S, D = q.shape
    Hk = k.shape[1]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    di = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    kb = k.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    dk_acc = jnp.zeros((B, Hk, S, D), jnp.float32)
    dv_acc = jnp.zeros((B, Hk, S, D), jnp.float32)
    dq_rot = jnp.zeros((B, Hq, S, D), jnp.float32)
    chunk = {"q": q.astype(jnp.bfloat16), "do": do.astype(jnp.bfloat16),
             "lse": lse.astype(jnp.float32), "di": di}

    def pair(c, causal_flag):
        return attention_backward_pallas(
            c["q"], kb, vb, None, c["lse"], c["do"], di=c["di"],
            sm_scale=sm_scale, is_causal=causal_flag, quantized=quantized,
            out_dtype=jnp.float32, interpret=interpret)

    def zeros():
        return (jnp.zeros((B, Hq, S, D), jnp.float32),
                jnp.zeros((B, Hk, S, D), jnp.float32),
                jnp.zeros((B, Hk, S, D), jnp.float32))

    for step in range(n):
        if step != n - 1:
            next_chunk = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis_name, perm), chunk)
        if is_causal:
            src = (idx - step) % n
            # 0: src < idx (invisible), 1: diagonal, 2: src > idx (full)
            case = jnp.int32(1) + jnp.sign(src - idx)
            dq_p, dk_p, dv_p = jax.lax.switch(
                case, [zeros,
                       functools.partial(pair, chunk, True),
                       functools.partial(pair, chunk, False)])
        else:
            dq_p, dk_p, dv_p = pair(chunk, False)
        dk_acc += dk_p
        dv_acc += dv_p
        # dQ hops with its chunk every step (incl. the last -> home)
        dq_rot = jax.lax.ppermute(dq_rot + dq_p, axis_name, perm)
        if step != n - 1:
            chunk = next_chunk

    return (dq_rot.astype(q.dtype), dk_acc.astype(k.dtype),
            dv_acc.astype(v.dtype))


def _ring_block(cap: int, seq: int) -> int:
    cand = cap
    while cand > 128:
        if seq % cand == 0:
            return cand
        cand //= 2
    return 128


def ring_sageattn(
    q, k, v,
    mesh: Mesh,
    axis_name: str = SP,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    qk_quant_gran: str = "per_thread",
    pv_dtype: Optional[str] = None,
    compute_dtype: Optional[str] = None,
    softmax_mode: str = "auto",  # "auto" -> static unless pv fp8 (the
    # same rule as core._sage_attention; static is the v5e flagship)
    return_lse: bool = False,
    block_q: int = 0,
    block_k: int = 0,
    differentiable: bool = False,
    quant_backward: Optional[bool] = None,
    interpret: Optional[bool] = None,
):
    """Sequence-parallel quantized attention over a mesh axis.

    ``q``: global HND [B, Hq, S, D]; ``k``/``v``: [B, Hk, S, D] with
    Hq % Hk == 0 (GQA).  S must divide evenly by the ``axis_name`` mesh-axis
    size times the kernel block.  Heads may additionally be sharded over
    "tp" and batch over "dp" by the caller's shardings — this wrapper only
    fixes the sequence axis.  ``block_q``/``block_k`` of 0 pick tuned sizes
    for the local shard length (docs/PERF_NOTES.md sweep).

    ``differentiable=True`` attaches the context-parallel backward
    (``_ring_bwd_body``): jax.grad through the ring matches the
    single-device custom_vjp gradients (same straight-through scheme —
    exact-math flash backward from the saved (q, k, v, o, lse)).
    Requires the global S to already divide n*block (the padded-stats
    masking is forward-only) and is incompatible with ``return_lse``.
    ``quant_backward`` as in :func:`sageattention_tpu.sageattn`
    (None -> int8 backward kernels for non-causal).
    """
    B, Hq, S, D = q.shape
    Hk = k.shape[1]
    if Hq % Hk != 0:
        raise ValueError(f"num_qo_heads ({Hq}) must be divisible by "
                         f"num_kv_heads ({Hk}) for ring GQA")
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if pv_dtype is None:
        pv_dtype = detect().default_pv_dtype
    if compute_dtype is None:
        compute_dtype = detect().default_compute_dtype
    if compute_dtype == "bf16" and pv_dtype == "fp8":
        pv_dtype = "int8"
    if softmax_mode == "auto":
        softmax_mode = "static" if pv_dtype != "fp8" else "online"
    if interpret is None:
        interpret = default_interpret()
    n = mesh.shape[axis_name]
    # r3: ugly global lengths (CogVideoX 17776 over 8 devices) are padded
    # up to n * S_local with S_local block-aligned; statistics mask the pad
    # rows and the kernel masks pad columns via a dynamic per-chunk length
    # (see _ring_body) — the parallel analogue of core._BLOCK_EFF padding.
    S_true = S
    S_local_min = -(-S // n)
    gran = max(block_q, block_k)
    if not gran:
        from ..core import _pick_block
        gran = _pick_block(2048, S_local_min)
    S_local = round_up(S_local_min, gran)
    S_pad = n * S_local
    if S_pad != S:
        pads = ((0, 0), (0, 0), (0, S_pad - S), (0, 0))
        q, k, v = (jnp.pad(x, pads) for x in (q, k, v))
        S = S_pad
    if not block_q:
        # local shards are short; cap below the single-chip 4096 default so
        # the per-step grid still has >=2 q tiles to pipeline
        block_q = _ring_block(2048, S_local)
    if not block_k:
        block_k = _ring_block(2048, S_local)
    if compute_dtype == "bf16":
        block_k_inner = min(256, block_k)
    elif softmax_mode == "static":
        block_k_inner = min(1024, block_k)  # r2 sweep: sub-tiled wide kv
    else:
        block_k_inner = block_k
    assert S_local % block_q == 0 and S_local % block_k == 0
    D_og = D
    if D not in (64, 128, 256):
        target = 64 if D < 64 else (128 if D < 128 else 256)
        pads = [(0, 0)] * 3 + [(0, target - D)]
        q, k, v = (jnp.pad(x, pads) for x in (q, k, v))
        D = target

    def body_partial(want_lse):
        return functools.partial(
            _ring_body, axis_name=axis_name, is_causal=is_causal,
            sm_scale=sm_scale, qk_quant_gran=qk_quant_gran,
            pv_dtype=pv_dtype, compute_dtype=compute_dtype,
            interpret=interpret, block_q=block_q, block_k=block_k,
            block_k_inner=block_k_inner, return_lse=want_lse,
            softmax_mode=softmax_mode, s_true=S_true if S != S_true else 0)

    in_spec = P(None, None, axis_name, None)
    o_spec = P(None, None, axis_name, None)
    lse_spec = P(None, None, axis_name)

    if differentiable:
        if return_lse:
            raise ValueError(
                "differentiable ring attention does not return lse; take "
                "gradients through the plain output")
        if S != S_true:
            raise ValueError(
                f"differentiable ring attention requires the global "
                f"sequence length ({S_true}) to divide evenly into "
                f"block-aligned shards ({n} x {S_local}); pad the inputs "
                f"or use ulysses_sageattn")
        from ..core import _resolve_quant_bwd
        quant_bwd = _resolve_quant_bwd(quant_backward, is_causal)
        bwd_body = functools.partial(
            _ring_bwd_body, axis_name=axis_name, is_causal=is_causal,
            sm_scale=sm_scale, quantized=quant_bwd, interpret=interpret)

        @jax.custom_vjp
        def f(qp, kp, vp):
            return shard_map(body_partial(False), mesh=mesh,
                             in_specs=(in_spec,) * 3, out_specs=o_spec,
                             check_vma=False)(qp, kp, vp)

        def f_fwd(qp, kp, vp):
            o, lse = shard_map(body_partial(True), mesh=mesh,
                               in_specs=(in_spec,) * 3,
                               out_specs=(o_spec, lse_spec),
                               check_vma=False)(qp, kp, vp)
            return o, (qp, kp, vp, o, lse)

        def f_bwd(res, do):
            grads = shard_map(bwd_body, mesh=mesh,
                              in_specs=(in_spec,) * 4 + (lse_spec, in_spec),
                              out_specs=(in_spec,) * 3,
                              check_vma=False)(*res, do)
            return grads

        f.defvjp(f_fwd, f_bwd)
        return f(q, k, v)[:, :, :, :D_og]

    body = body_partial(return_lse)
    out_spec = (o_spec, lse_spec) if return_lse else o_spec
    res = shard_map(body, mesh=mesh, in_specs=(in_spec,) * 3,
                    out_specs=out_spec, check_vma=False)(q, k, v)
    if return_lse:
        out, lse = res
        out = out[:, :, :S_true, :D_og]
        return out, lse[:, :, :S_true]
    return res[:, :, :S_true, :D_og]
