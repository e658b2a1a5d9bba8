"""r3 feature benchmarks: NHD e2e, varlen prep, masked paths.

Evidence rows for docs/PERF_NOTES.md (VERDICT r2 items 2, 3, 9):
  - NHD e2e must land within ~3% of HND e2e (zero-copy layout path)
  - varlen static softmax must win at 4K packs (it lost in r2 on jnp prep)
  - bool-mask block-skip must show a measured win vs dense-with-mask

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/bench_r3_features.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.core import sageattn  # noqa: E402
from sageattention_tpu.varlen import sageattn_varlen  # noqa: E402
from sageattention_tpu.utils.testing import time_fn, attention_tflops  # noqa: E402


def nhd_vs_hnd(B=4, H=32, S=8192, D=128):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16) for kk in ks)
    qn, kn, vn = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    f_hnd = jax.jit(functools.partial(sageattn, tensor_layout="HND"))
    f_nhd = jax.jit(functools.partial(sageattn, tensor_layout="NHD"))
    # interleaved A/B
    t_h1 = time_fn(f_hnd, q, k, v, reps=10)
    t_n1 = time_fn(f_nhd, qn, kn, vn, reps=10)
    t_h2 = time_fn(f_hnd, q, k, v, reps=10)
    t_n2 = time_fn(f_nhd, qn, kn, vn, reps=10)
    t_h, t_n = min(t_h1, t_h2), min(t_n1, t_n2)
    print(f"e2e HND {t_h*1e3:.2f} ms ({attention_tflops(B,H,S,S,D,False,t_h):.1f} TF) | "
          f"NHD {t_n*1e3:.2f} ms ({attention_tflops(B,H,S,S,D,False,t_n):.1f} TF) | "
          f"NHD/HND = {t_n/t_h:.3f}", flush=True)


def varlen_modes(T, n_seq=3, H=8, D=128, causal=True):
    rng = np.random.default_rng(0)
    cuts = np.sort(rng.choice(np.arange(128, T - 128), n_seq - 1,
                              replace=False))
    lengths = np.diff([0, *cuts, T]).tolist()
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (T, H, D), jnp.bfloat16) for kk in ks)
    cu = jnp.array(np.cumsum([0] + lengths), jnp.int32)
    for mode in ("static", "online"):
        # one cu arg passed twice INSIDE jit => same tracer, provably
        # matched packings (the causal guard requires this)
        f = jax.jit(lambda q, k, v, cu, mode=mode: sageattn_varlen(
            q, k, v, cu, cu, is_causal=causal, softmax_mode=mode))
        t = time_fn(f, q, k, v, cu, reps=10)
        print(f"varlen T={T} {mode:7s}: {t*1e3:.2f} ms", flush=True)


def masked(B=4, H=32, S=8192, D=128):
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in ks[:3])
    f_dense = jax.jit(sageattn)
    t = time_fn(f_dense, q, k, v, reps=8)
    print(f"masked: dense (no mask)      {t*1e3:.2f} ms "
          f"({attention_tflops(B,H,S,S,D,False,t):.1f} TF)", flush=True)
    # random 90%-keep bool mask (no block can be skipped)
    m_rand = jax.random.bernoulli(ks[3], 0.9, (B, 1, S, S))
    f_m = jax.jit(lambda q, k, v, m: sageattn(q, k, v, attn_mask=m))
    t = time_fn(f_m, q, k, v, m_rand, reps=8)
    print(f"masked: bool 90% random keep {t*1e3:.2f} ms", flush=True)
    # block-sparse: only 25% of 1024-wide column bands visible per row band
    bands = jax.random.bernoulli(jax.random.PRNGKey(9), 0.25,
                                 (B, 1, S // 1024, S // 1024))
    m_blk = jnp.repeat(jnp.repeat(bands, 1024, axis=2), 1024, axis=3)
    t = time_fn(f_m, q, k, v, m_blk, reps=8)
    print(f"masked: block-sparse 25% live {t*1e3:.2f} ms "
          f"(block-skip target ~4x dense-with-mask)", flush=True)


if __name__ == "__main__":
    print("== NHD vs HND e2e ==", flush=True)
    nhd_vs_hnd()
    print("== varlen static vs online ==", flush=True)
    varlen_modes(4096)
    varlen_modes(16384)
    print("== masked paths ==", flush=True)
    masked()
