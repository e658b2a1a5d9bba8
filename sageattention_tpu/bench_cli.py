"""Console entry point: ``sageattn-tpu-bench`` (pyproject [project.scripts]).

Reference analogue: the per-kernel scripts under `/root/reference/bench/`;
here one CLI fronts the bench library.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description="SageAttention-TPU benchmarks")
    ap.add_argument("--mode", choices=["headline", "sweep"], default="headline")
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--causal", action="store_true")
    args = ap.parse_args(argv)

    from . import bench_lib
    if args.mode == "headline":
        print(json.dumps(bench_lib.run_headline(
            S=args.seq, D=args.head_dim, B=args.batch, H=args.heads)))
    else:
        for row in bench_lib.run_sweep(D=args.head_dim, B=args.batch,
                                       H=args.heads, causal=args.causal):
            print(json.dumps(row))


if __name__ == "__main__":
    main()
