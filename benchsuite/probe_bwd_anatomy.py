"""Backward-kernel anatomy on the real TPU (the probe_roofline.py story
for the training path): where do the non-MXU milliseconds go?

Self-contained copies of the dKV/dQ kernel skeletons (non-causal,
unmasked, bf16) with the VPU chain progressively stripped:

  full       p = exp2(s - lse); ds = p * (dov - di)      (production math)
  exp2bf16   exp2 computed on bf16 operands               (candidate opt)
  noexp2     p = (s - lse) * 1e-5  (same passes, no transcendental)
  dotsonly   p = s cast; ds = dov cast  (pure 7-matmul skeleton = the
             structural MXU ceiling at these tiles)

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_bwd_anatomy.py

``--causal`` adds the causal column's decomposition (the r4 forward-
ceiling story, replayed for the training path): tile-skip-only
(structural ceiling at these tiles), mask-every-live-tile (the r3
shipped kernels' shape), and mask-straddlers-only (two pl.when bodies;
fully-below-diagonal tiles run the unmasked math) — TF-eff uses the
causal /2 convention.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.utils.testing import time_fn  # noqa: E402

LOG2E = 1.4426950408889634


def _p_ds(variant, s, lse2, dov, di):
    if variant == "full":
        p = jnp.exp2(s - lse2)
        ds = p * (dov - di)
    elif variant == "exp2bf16":
        p = jnp.exp2((s - lse2).astype(jnp.bfloat16)).astype(jnp.float32)
        ds = p * (dov - di)
    elif variant == "noexp2":
        p = (s - lse2) * 1e-5
        ds = p * (dov - di)
    else:  # dotsonly
        p = s * 1e-5
        ds = dov * 1e-5
    return p, ds


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, variant, n_q):
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q, k, v, do = (r[0, 0] for r in (q_ref, k_ref, v_ref, do_ref))
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (0.088388 * LOG2E)
    dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    p, ds = _p_ds(variant, s, lse_ref[0, 0], dov, di_ref[0, 0])
    dv_acc[...] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(jnp.bfloat16), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_acc[...] * 0.088388
        dv_ref[0, 0] = dv_acc[...] * 1.0


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
               dq_ref, dq_acc, *, variant, n_kv):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q, k, v, do = (r[0, 0] for r in (q_ref, k_ref, v_ref, do_ref))
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (0.088388 * LOG2E)
    dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    _, ds = _p_ds(variant, s, lse_ref[0, 0], dov, di_ref[0, 0])
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(jnp.bfloat16), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == n_kv - 1)
    def _():
        dq_ref[0, 0] = dq_acc[...] * 0.088388


def _mask(x, i, j, BQ, BK):
    rows = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0) + i * BQ
    cols = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1) + j * BK
    return jnp.where(cols <= rows, x, 0.0)


def _dkv_causal_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                       dk_ref, dv_ref, dk_acc, dv_acc, *, cvariant, n_q,
                       BQ, BK):
    j = pl.program_id(2)   # kv block
    i = pl.program_id(3)   # q block (innermost)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = (j * BK) <= (i * BQ + BQ - 1)
    straddle = (j * BK + BK - 1) > (i * BQ)   # tile not fully visible

    def body(masked):
        q, k, v, do = (r[0, 0] for r in (q_ref, k_ref, v_ref, do_ref))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (0.088388 * LOG2E)
        dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if cvariant == "skip":
            p = s * 1e-5
            ds = dov * 1e-5
        else:
            p = jnp.exp2(s - lse_ref[0, 0])
            if masked:
                p = _mask(p, i, j, BQ, BK)
            ds = p * (dov - di_ref[0, 0])
        dv_acc[...] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if cvariant == "straddle":
        @pl.when(jnp.logical_and(run, straddle))
        def _():
            body(True)

        @pl.when(jnp.logical_and(run, jnp.logical_not(straddle)))
        def _():
            body(False)
    else:
        @pl.when(run)
        def _():
            body(cvariant == "maskall")

    @pl.when(i == n_q - 1)
    def _():
        dk_ref[0, 0] = dk_acc[...] * 0.088388
        dv_ref[0, 0] = dv_acc[...] * 1.0


def _dq_causal_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                      dq_ref, dq_acc, *, cvariant, n_kv, BQ, BK):
    i = pl.program_id(2)   # q block
    j = pl.program_id(3)   # kv block (innermost)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = (j * BK) <= (i * BQ + BQ - 1)
    straddle = (j * BK + BK - 1) > (i * BQ)

    def body(masked):
        q, k, v, do = (r[0, 0] for r in (q_ref, k_ref, v_ref, do_ref))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (0.088388 * LOG2E)
        dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if cvariant == "skip":
            ds = dov * 1e-5
        else:
            p = jnp.exp2(s - lse_ref[0, 0])
            if masked:
                p = _mask(p, i, j, BQ, BK)
            ds = p * (dov - di_ref[0, 0])
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if cvariant == "straddle":
        @pl.when(jnp.logical_and(run, straddle))
        def _():
            body(True)

        @pl.when(jnp.logical_and(run, jnp.logical_not(straddle)))
        def _():
            body(False)
    else:
        @pl.when(run)
        def _():
            body(cvariant == "maskall")

    @pl.when(j == n_kv - 1)
    def _():
        dq_ref[0, 0] = dq_acc[...] * 0.088388


def backward_causal(cvariant, q, k, v, do, lse2, di, BQ=2048, BK=2048):
    """Causal skeletons with the production index-map DMA clamps."""
    B, H, S, D = q.shape
    n = S // BQ
    _iq = lambda j, i: jnp.maximum(i, (j * BK) // BQ)        # noqa: E731
    _jk = lambda i, j: jnp.minimum(j, ((i + 1) * BQ - 1) // BK)  # noqa: E731
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_causal_kernel, cvariant=cvariant, n_q=n,
                          BQ=BQ, BK=BK),
        grid=(B, H, n, n),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, j, i: (b, h, _iq(j, i), 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, j, i: (b, h, _iq(j, i), 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, j, i: (b, h, _iq(j, i), 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, j, i: (b, h, _iq(j, i), 0)),
        ],
        out_specs=(pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0)),
                   pl.BlockSpec((1, 1, BK, D), lambda b, h, j, i: (b, h, j, 0))),
        out_shape=(jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),) * 2,
        scratch_shapes=[pltpu.VMEM((BK, D), jnp.float32)] * 2,
        compiler_params=cp,
    )(q, k, v, do, lse2, di)
    dq = pl.pallas_call(
        functools.partial(_dq_causal_kernel, cvariant=cvariant, n_kv=n,
                          BQ=BQ, BK=BK),
        grid=(B, H, n, n),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, _jk(i, j), 0)),
            pl.BlockSpec((1, 1, BK, D), lambda b, h, i, j: (b, h, _jk(i, j), 0)),
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        compiler_params=cp,
    )(q, k, v, do, lse2, di)
    return dq, dk, dv


def backward(variant, q, k, v, do, lse2, di, BQ=2048, BK=2048):
    B, H, S, D = q.shape
    n = S // BQ
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024)
    qspec = pl.BlockSpec((1, 1, BQ, D), lambda b, h, x, i: (b, h, i, 0))
    kspec = pl.BlockSpec((1, 1, BK, D), lambda b, h, x, i: (b, h, x, 0))
    rspec = pl.BlockSpec((1, 1, BQ, 1), lambda b, h, x, i: (b, h, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, variant=variant, n_q=n),
        grid=(B, H, n, n),
        in_specs=[qspec, kspec, kspec, qspec, rspec, rspec],
        out_specs=(kspec, kspec),
        out_shape=(jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),) * 2,
        scratch_shapes=[pltpu.VMEM((BK, D), jnp.float32)] * 2,
        compiler_params=cp,
    )(q, k, v, do, lse2, di)
    qspec2 = pl.BlockSpec((1, 1, BQ, D), lambda b, h, i, x: (b, h, i, 0))
    kspec2 = pl.BlockSpec((1, 1, BK, D), lambda b, h, i, x: (b, h, x, 0))
    rspec2 = pl.BlockSpec((1, 1, BQ, 1), lambda b, h, i, x: (b, h, i, 0))
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, variant=variant, n_kv=n),
        grid=(B, H, n, n),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rspec2, rspec2],
        out_specs=qspec2,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BQ, D), jnp.float32)],
        compiler_params=cp,
    )(q, k, v, do, lse2, di)
    return dq, dk, dv


def main(S=8192, B=4, H=32, D=128, causal=False):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
                   for kk in ks)
    lse2 = jnp.full((B, H, S, 1), 60.0, jnp.float32)
    di = jnp.zeros((B, H, S, 1), jnp.float32)
    fl = 2.5 * 4 * H * B * D * S * S
    if causal:
        fl /= 2  # causal TF-eff convention
        fns = {var: jax.jit(functools.partial(backward_causal, var))
               for var in ("skip", "maskall", "straddle")}
    else:
        fns = {var: jax.jit(functools.partial(backward, var))
               for var in ("full", "exp2bf16", "noexp2", "dotsonly")}
    times = {var: [] for var in fns}
    for var, f in fns.items():
        f(q, k, v, do, lse2, di)  # compile
    for _ in range(3):
        for var, f in fns.items():
            times[var].append(time_fn(f, q, k, v, do, lse2, di, reps=5))
    for var, ts in times.items():
        t = min(ts)
        print(f"{var:9s}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF-eff",
              flush=True)


if __name__ == "__main__":
    main(causal="--causal" in sys.argv)
