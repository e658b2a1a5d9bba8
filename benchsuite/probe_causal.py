#!/usr/bin/env python
"""Causal tile-shape sweep for the native static-softmax kernel.

Causal executed-flop waste at tile granularity is ~ 1 + BQ/S (rows at the
top of a q-block execute kv columns only the bottom rows need), and the
diagonal mask's VPU cost scales with S*(BQ + BKI) under the 3-phase loop —
so unlike the non-causal case (flat 2048x2048 optimal), causal may prefer
smaller/rectangular tiles.  This probe measures the real kernel across the
candidate set.

Usage (TPU):
  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_causal.py [--seq 8192]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sageattention_tpu.bench_lib import bench_kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    S, D = args.seq, args.head_dim

    candidates = [
        (2048, 2048, 2048),   # current default (non-causal optimum)
        (2048, 2048, 1024),
        (2048, 2048, 512),
        (1024, 2048, 2048),
        (1024, 2048, 1024),
        (1024, 2048, 512),
        (1024, 1024, 1024),
        (512, 2048, 512),
        (1024, 4096, 1024),
    ]
    print(f"causal sweep S={S} hd{D} B4 H32 (native int8, static softmax)")
    print(f"{'BQ':>6} {'BK':>6} {'BKI':>6} {'ms':>9} {'TFLOPS':>8}")
    for bq, bk, bki in candidates:
        if bq > S or bk > S:
            continue
        t, tf = bench_kernel(S=S, D=D, causal=True, pv_dtype="int8",
                             compute_dtype="native", softmax_mode="static",
                             blocks=(bq, bk, bki), reps=args.reps)
        print(f"{bq:>6} {bk:>6} {bki:>6} {t*1e3:>9.2f} {tf:>8.1f}", flush=True)


if __name__ == "__main__":
    main()
