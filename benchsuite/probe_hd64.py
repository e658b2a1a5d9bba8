#!/usr/bin/env python
"""hd64 block tuning probe (VERDICT r4 #4): the reference benches hd64 and
hd128 everywhere (`/root/reference/bench/bench_qk_int8_pv_fp16_cuda.py:9-11`)
but the repo's tuned blocks were swept at hd128 only.  D=64 half-fills the
MXU contraction on QK^T (inherent) and halves VMEM per tile, so wider
tiles are affordable — sweep the flagship static config and the flash
baseline at S=8192/16384.

  PYTHONPATH=/root/.axon_site:. python benchsuite/probe_hd64.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sageattention_tpu.bench_lib import bench_kernel, bench_stock_flash

D = 64
for S in (8192, 16384):
    print(f"== S={S} hd{D} ==", flush=True)
    t, tf = bench_stock_flash(S=S, D=D)
    print(f"stock flash:              {t*1e3:8.2f} ms {tf:7.1f} TF", flush=True)
    t, tf = bench_kernel(S=S, D=D, quantized=False, pv_dtype="bf16")
    print(f"our flash (default blk):  {t*1e3:8.2f} ms {tf:7.1f} TF", flush=True)
    for blocks in (None, (1024, 8192, 1024), (2048, 8192, 1024),
                   (1024, 8192, 2048), (2048, 8192, 2048),
                   (2048, 2048, 2048), (1024, 16384, 1024)):
        for causal in (False, True):
            t, tf = bench_kernel(S=S, D=D, pv_dtype="int8",
                                 compute_dtype="native", softmax_mode="static",
                                 causal=causal, blocks=blocks)
            print(f"flagship blk={str(blocks):<20} causal={causal}: "
                  f"{t*1e3:8.2f} ms {tf:7.1f} TF", flush=True)
print("HD64 PROBE DONE", flush=True)
