"""Varlen in-kernel Q quant (fuse_q_quant) A/B: static vs online, fuse vs
pre-quantized, at 4K and 16K packs.

r2 story: varlen static LOST at <=8K packs on jnp prep; r3 fused Pallas prep
made it tie at 4K and win 1.2x at 16K.  This probe records what the in-kernel
Q quant adds on top (one fewer quant launch + bf16-Q read).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_varlen_fuseqq.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.varlen import sageattn_varlen  # noqa: E402
from sageattention_tpu.utils.testing import time_fn  # noqa: E402


def run(T, n_seq=3, H=8, D=128, causal=True):
    rng = np.random.default_rng(0)
    cuts = np.sort(rng.choice(np.arange(128, T - 128), n_seq - 1,
                              replace=False))
    lengths = np.diff([0, *cuts, T]).tolist()
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (T, H, D), jnp.bfloat16) for kk in ks)
    cu = jnp.array(np.cumsum([0] + lengths), jnp.int32)

    fns, times = {}, {}
    for mode in ("static", "online"):
        for fq in (True, False):
            f = jax.jit(lambda q, k, v, cu, mode=mode, fq=fq: sageattn_varlen(
                q, k, v, cu, cu, is_causal=causal, softmax_mode=mode,
                fuse_q_quant=fq))
            fns[(mode, fq)] = f
            times[(mode, fq)] = []
    for _ in range(3):  # interleaved A/B rounds
        for key, f in fns.items():
            times[key].append(time_fn(f, q, k, v, cu, reps=10))
    for (mode, fq), ts in times.items():
        t = min(ts)
        print(f"varlen T={T:6d} {mode:7s} fuse_qq={int(fq)}: {t*1e3:7.2f} ms",
              flush=True)
    s = min(times[("static", True)])
    o = min(times[("online", True)])
    sp = min(times[("static", False)])
    print(f"  -> static/online (fuse) = {o/s:.3f}x ; "
          f"fuse/prequant (static) = {sp/s:.3f}x", flush=True)


if __name__ == "__main__":
    run(4096)
    run(16384)
