#!/usr/bin/env python
"""Kernel benchmark sweep — reference `bench/bench_qk_int8_pv_*_cuda.py`
equivalent (same shapes/formula/scope).

Usage:
  PYTHONPATH=/root/.axon_site:. python benchsuite/bench_kernels.py \\
      [--head-dim 128] [--causal] [--mode flagship|native-int8|bf16pv|flash]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sageattention_tpu.bench_lib import (bench_e2e, bench_kernel,
                                          bench_stock_flash)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seqs", type=int, nargs="+",
                    default=[1024, 2048, 4096, 8192, 16384, 32768])
    ap.add_argument("--mode", default="flagship",
                    choices=["flagship", "native-int8", "bf16pv", "flash",
                             "stock-flash"])
    ap.add_argument("--softmax", default="online",
                    choices=["online", "static"],
                    help="softmax_mode for quantized modes")
    ap.add_argument("--scope", default="kernel", choices=["kernel", "e2e"],
                    help="e2e = full sageattn() incl. fused quantization")
    args = ap.parse_args()

    kw = dict(B=args.batch, H=args.heads, D=args.head_dim, causal=args.causal)
    print(f"mode={args.mode} B={args.batch} H={args.heads} D={args.head_dim} "
          f"causal={args.causal}")
    print(f"{'seq':>8} {'ms':>10} {'TFLOPS':>8}")
    for S in args.seqs:
        if args.scope == "e2e":
            mode_map = {"flagship": ("int8", "bf16"),
                        "native-int8": ("int8", "native"),
                        "bf16pv": ("bf16", "native")}
            pv, comp = mode_map.get(args.mode, ("int8", "bf16"))
            t, tf = bench_e2e(S=S, pv_dtype=pv, compute_dtype=comp,
                              softmax_mode=args.softmax, **kw)
        elif args.mode == "flagship":
            t, tf = bench_kernel(S=S, pv_dtype="int8", compute_dtype="bf16",
                                 softmax_mode=args.softmax, **kw)
        elif args.mode == "native-int8":
            t, tf = bench_kernel(S=S, pv_dtype="int8", compute_dtype="native", **kw)
        elif args.mode == "bf16pv":
            t, tf = bench_kernel(S=S, pv_dtype="bf16", compute_dtype="native",
                                 softmax_mode=args.softmax, **kw)
        elif args.mode == "flash":
            t, tf = bench_kernel(S=S, quantized=False, pv_dtype="bf16", **kw)
        else:
            t, tf = bench_stock_flash(S=S, **kw)
        print(f"{S:>8} {t*1e3:>10.2f} {tf:>8.1f}", flush=True)


if __name__ == "__main__":
    main()
