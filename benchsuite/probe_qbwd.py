"""Quantized (SageBwd-class) vs bf16 backward kernels on the real TPU.

TFLOPS-effective convention matches PERF_NOTES r2: 2.5x the forward flop
count (5 gradient matmuls vs the forward's 2), / (2 if causal).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_qbwd.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.core import sageattn  # noqa: E402
from sageattention_tpu.ops.backward_pallas import attention_backward_pallas  # noqa: E402
from sageattention_tpu.utils.testing import time_fn, calc_diff  # noqa: E402


def accuracy_spot(S=2048, B=1, H=2, D=128, causal=False):
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q, k, v, do = (jax.random.normal(kk, (B, H, S, D), jnp.float32)
                   for kk in ks)
    sm = 1.0 / D ** 0.5

    def exact(q, k, v):
        s = jnp.einsum("bhid,bhjd->bhij", q, k) * sm
        if causal:
            s = jnp.where(jnp.tril(jnp.ones((S, S), bool)), s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", p, v)

    o, vjp = jax.vjp(exact, q, k, v)
    dq_e, dk_e, dv_e = vjp(do)
    lse = jnp.einsum("bhid,bhjd->bhij", q, k) * sm
    if causal:
        lse = jnp.where(jnp.tril(jnp.ones((S, S), bool)), lse, -jnp.inf)
    lse = jax.nn.logsumexp(lse, axis=-1)
    for quant in (False, True):
        dq, dk, dv = jax.jit(functools_partial(quant, causal, sm))(
            q, k, v, o, lse, do)
        print(f"acc S={S} causal={causal} quant={int(quant)}: "
              f"dq {calc_diff(dq, dq_e):.2e} dk {calc_diff(dk, dk_e):.2e} "
              f"dv {calc_diff(dv, dv_e):.2e}", flush=True)


def functools_partial(quant, causal, sm, blk=2048):
    return lambda q, k, v, o, lse, do: attention_backward_pallas(
        q, k, v, o, lse, do, sm_scale=sm, is_causal=causal,
        quantized=quant, block_q=blk, block_k=blk)


def run(S=8192, B=4, H=32, D=128, causal=False, blocks=(2048,)):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
                   for kk in ks)
    sm = 1.0 / D ** 0.5
    # o/lse from the repo's own forward (the O(S^2) jnp oracle OOMs at 8K)
    o, lse = sageattn(q, k, v, is_causal=causal, return_lse=True)

    fns, times = {}, {}
    for quant in (False, True):
        for blk in blocks:
            f = jax.jit(lambda q, k, v, o, lse, do, quant=quant, blk=blk:
                        attention_backward_pallas(
                            q, k, v, o, lse, do, sm_scale=sm,
                            is_causal=causal, quantized=quant,
                            block_q=blk, block_k=blk))
            key = (quant, blk)
            fns[key] = f
            times[key] = []
            dq, dk, dv = f(q, k, v, o, lse, do)
            assert all(bool(jnp.all(jnp.isfinite(x.astype(jnp.float32))))
                       for x in (dq, dk, dv))
    for _ in range(3):
        for key, f in fns.items():
            times[key].append(time_fn(f, q, k, v, o, lse, do, reps=5))
    fl = 2.5 * 4 * H * B * D * S * S / (2 if causal else 1)
    for (quant, blk), ts in times.items():
        t = min(ts)
        print(f"causal={causal} quant={int(quant)} blk={blk}: {t*1e3:7.2f} ms"
              f"  {fl/t/1e12:6.1f} TFLOPS-eff", flush=True)


if __name__ == "__main__":
    accuracy_spot(causal=False)
    run(causal=False, blocks=(1024, 2048))
    run(causal=True, blocks=(2048,))
