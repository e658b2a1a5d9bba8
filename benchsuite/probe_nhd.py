"""NHD layout-fusion probe v2 — whole-head blocks + in-kernel transpose.

v1 finding (committed here as evidence): Mosaic REJECTS per-head blocks
out of a (B,S,H,D) array — "last two dims of the block shape must be
divisible by (8, 128) or equal the array dims", and a (1, bs, 1, D) block
has second-minor 1 vs array dim H.  The legal alternative is a block
covering ALL heads, (1, bs, H, D) at index (b, i, 0, 0): its last two
dims equal the array dims.  The kernel then sees (bs, H, D) and must
transpose to (H, bs, D) before storing HND output blocks.

This probe measures that in-kernel swapaxes(0,1) pattern vs the XLA
transpose pass it would replace.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_nhd.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.utils.testing import time_fn  # noqa: E402
from sageattention_tpu.dispatch import default_interpret  # noqa: E402


def _nhd2hnd_kernel(x_ref, o_ref):
    x = x_ref[0]                      # (bs, H, D)
    o_ref[0] = jnp.swapaxes(x, 0, 1)  # (H, bs, D)


def _nhd_quant_kernel(x_ref, o_ref, s_ref):
    """Quant-shaped work on the whole-head block: per-(row, head) amax,
    scale, int8 store transposed to HND."""
    x = x_ref[0].astype(jnp.float32)            # (bs, H, D)
    a = jnp.max(jnp.abs(x), axis=2)             # (bs, H)
    scale = jnp.where(a > 0, a * (1.0 / 127.0), 1.0)
    q = jnp.clip(jnp.rint(x * (1.0 / scale)[:, :, None]), -127, 127)
    o_ref[0] = jnp.swapaxes(q.astype(jnp.int8), 0, 1)
    s_ref[0] = jnp.swapaxes(scale, 0, 1)[:, :, None]


def nhd_to_hnd(x, BS=512, interpret=False):
    B, S, H, D = x.shape
    return pl.pallas_call(
        _nhd2hnd_kernel,
        grid=(B, S // BS),
        in_specs=[pl.BlockSpec((1, BS, H, D), lambda b, i: (b, i, 0, 0))],
        out_specs=pl.BlockSpec((1, H, BS, D), lambda b, i: (b, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)


def nhd_quant(x, BS=512, interpret=False):
    B, S, H, D = x.shape
    return pl.pallas_call(
        _nhd_quant_kernel,
        grid=(B, S // BS),
        in_specs=[pl.BlockSpec((1, BS, H, D), lambda b, i: (b, i, 0, 0))],
        out_specs=(
            pl.BlockSpec((1, H, BS, D), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, BS, 1), lambda b, i: (b, 0, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, S, D), jnp.int8),
            jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)


def main():
    interp = default_interpret()
    B, H, S, D = 4, 32, 8192, 128
    x_nhd = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D),
                              jnp.bfloat16)
    x_hnd = jnp.swapaxes(x_nhd, 1, 2)

    for BS in (256, 512, 1024):
        f = jax.jit(functools.partial(nhd_to_hnd, BS=BS, interpret=interp))
        got = f(x_nhd)
        ok = np.array_equal(np.asarray(got), np.asarray(x_hnd))
        t = time_fn(f, x_nhd, reps=20)
        nbytes = x_nhd.size * 2 * 2
        print(f"NHD->HND pallas whole-head copy BS={BS}: "
              f"{'OK' if ok else 'MISMATCH'} {t*1e3:.3f} ms "
              f"{nbytes/t/1e9:.0f} GB/s", flush=True)

    f4 = jax.jit(lambda a: jnp.swapaxes(a, 1, 2).copy())
    t = time_fn(f4, x_nhd, reps=20)
    print(f"XLA transpose NHD->HND: {t*1e3:.3f} ms  "
          f"{x_nhd.size*4/t/1e9:.0f} GB/s", flush=True)

    fq = jax.jit(functools.partial(nhd_quant, BS=512, interpret=interp))
    q8, sc = fq(x_nhd)
    # oracle
    a = jnp.max(jnp.abs(x_hnd.astype(jnp.float32)), axis=3)
    scale = jnp.where(a > 0, a / 127.0, 1.0)
    ref = jnp.clip(jnp.rint(x_hnd.astype(jnp.float32) / scale[..., None]),
                   -127, 127).astype(jnp.int8)
    ok = np.array_equal(np.asarray(q8), np.asarray(ref))
    t = time_fn(fq, x_nhd, reps=20)
    nbytes = x_nhd.size * 2 + q8.size
    print(f"NHD fused quant (per-row scale): {'OK' if ok else 'MISMATCH'} "
          f"{t*1e3:.3f} ms {nbytes/t/1e9:.0f} GB/s", flush=True)

    # the HND fused quant it must compete with (same work, contiguous read)
    from sageattention_tpu.ops import quant_pallas as qp
    fh = jax.jit(functools.partial(qp.quant_int8_groupwise_pallas, group=1,
                                   interpret=interp))
    fh(x_hnd)
    t = time_fn(fh, x_hnd, reps=20)
    print(f"HND fused quant (contiguous): {t*1e3:.3f} ms "
          f"{nbytes/t/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
