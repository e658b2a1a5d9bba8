#!/usr/bin/env python
"""Sequence-parallel DiT denoising over a device mesh — the TPU equivalent
of `/root/reference/example/parallel_sageattn_cogvideo.py` + run_parallel.sh.

The reference delegates to xDiT (torchrun + NCCL, --ulysses_degree /
--ring_degree / --use_cfg_parallel); here the same three axes are a native
jax mesh: dp (CFG batch split), sp (ring or ulysses sequence parallel),
tp (head parallel), all over ICI collectives inside shard_map.

Run on N virtual devices (no pod needed):
  PYTHONPATH= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python examples/parallel_dit_infer.py --sp 4 --dp 2 --seq-parallel ring
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sageattention_tpu.models import DiTConfig, make_dit, example_inputs
from sageattention_tpu.parallel import make_mesh, ring_sageattn, ulysses_sageattn, DP, SP
from sageattention_tpu.utils.testing import calc_diff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=int, default=1, help="CFG/data parallel degree")
    ap.add_argument("--sp", type=int, default=None, help="sequence parallel degree")
    ap.add_argument("--tp", type=int, default=1, help="head parallel degree")
    ap.add_argument("--seq-parallel", choices=["ring", "ulysses"], default="ring")
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp)
    sp = mesh.shape[SP]
    print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    # text_len chosen so the joint sequence divides by sp * block (ring
    # sharding constraint; video tokens 4*16*16=1024 already divide).
    cfg = DiTConfig(hidden=256, heads=8, depth=2, frames=4, height=32, width=32,
                    text_len=sp * 128, zero_init_gates=False)
    total_tokens = cfg.text_len + cfg.video_tokens
    assert total_tokens % (sp * 128) == 0, (
        f"joint sequence {total_tokens} must divide by sp*128={sp*128}")

    seq_fn = ring_sageattn if args.seq_parallel == "ring" else ulysses_sageattn

    def attn(q, k, v, *a, **kw):
        qh, kh, vh = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        out = seq_fn(qh, kh, vh, mesh, axis_name=SP, pv_dtype="bf16")
        return jnp.swapaxes(out, 1, 2)

    model = make_dit(cfg, attn_fn=attn)
    batch = 2 * args.dp  # CFG pairs
    latents, text, t = example_inputs(cfg, batch=batch)
    params = model.init(jax.random.PRNGKey(0), latents, text, t)

    latents = jax.device_put(latents, NamedSharding(mesh, P(DP)))
    text = jax.device_put(text, NamedSharding(mesh, P(DP)))

    def denoise(mdl, params, x, txt):
        def step(i, x):
            tt = jnp.full((x.shape[0],), 1000 - i * (1000 // args.steps), jnp.int32)
            eps = mdl.apply(params, x, txt, tt)
            return x - (1.0 / args.steps) * eps.astype(x.dtype)
        return jax.lax.fori_loop(0, args.steps, step, x)

    f = jax.jit(lambda p, x, txt: denoise(model, p, x, txt))
    out = f(params, latents, text)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    out = f(params, latents, text)
    np.asarray(out.ravel()[:1])
    print(f"{args.seq_parallel} sp={sp}: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"/ {args.steps} steps, out {out.shape}")

    # single-device (replicated) reference for parity
    ref_model = make_dit(cfg, attn_fn=None)
    ref = jax.jit(lambda p, x, txt: denoise(ref_model, p, x, txt))(
        params, latents, text)
    print(f"cosine-diff vs jax.nn attention: {calc_diff(out, ref):.3e}")


if __name__ == "__main__":
    main()
