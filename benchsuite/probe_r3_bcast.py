"""r3 experiment: lane-broadcast strategy for per-row stats (see
ops/attention.py _bcast).  Runs the four headline kernel configs for one
SAGE_EXP_BCAST mode (pass as argv[1]); the driver shell interleaves modes.

PYTHONPATH=/root/.axon_site:/root/repo python -u benchsuite/probe_r3_bcast.py slice
"""

import json
import os
import sys

mode = sys.argv[1] if len(sys.argv) > 1 else "slice"
os.environ["SAGE_EXP_BCAST"] = mode

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from sageattention_tpu.bench_lib import bench_kernel  # noqa: E402

rows = {}
for label, kw in [
    ("static-noncausal", dict(pv_dtype="int8", softmax_mode="static")),
    ("static-causal", dict(pv_dtype="int8", softmax_mode="static",
                           causal=True)),
    ("flash-noncausal", dict(pv_dtype="bf16", quantized=False)),
    ("flash-causal", dict(pv_dtype="bf16", quantized=False, causal=True)),
    ("online-int8dot", dict(pv_dtype="int8", softmax_mode="online")),
]:
    t, tf = bench_kernel(**kw)
    rows[label] = round(tf, 1)
    print(f"[{mode}] {label:18s} {tf:7.1f} TFLOPS", flush=True)
print(json.dumps({"mode": mode, "tflops": rows}))
