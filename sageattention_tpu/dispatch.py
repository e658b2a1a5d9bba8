"""TPU generation detection and kernel-mode selection.

The reference picks a kernel per CUDA arch (sm80/86/89/90/120,
`/root/reference/sageattention/core.py:71-76,143-157`).  The TPU analogue
keys on the device kind: every generation runs the same Pallas kernel, but
the profitable PV dtype differs — int8 matmul is ~2x bf16 on all recent
TPUs, while a *fast* fp8 MXU path only exists on v6e+ (on v5e, XLA emulates
fp8 dots slower than bf16 — measured on this host).
"""

from __future__ import annotations

import dataclasses
import functools

import jax


@dataclasses.dataclass(frozen=True)
class TpuCapabilities:
    generation: str        # "v4" | "v5e" | "v5p" | "v6e" | "cpu" | "unknown"
    has_fast_int8: bool    # int8 MXU at 2x bf16 throughput *at attention tile shapes*
    has_fast_fp8: bool     # native fp8 e4m3 matmul
    default_pv_dtype: str  # pv dtype the auto path picks
    # "bf16": int8-storage/bf16-compute dequant kernel (v5e: int8 MXU ops
    # contend with the VPU, so bf16 compute + halved HBM traffic wins —
    # measured 157 vs 147 TFLOPS, docs/PERF_NOTES.md); "native": real
    # low-bit MXU dots (generations where they are genuinely faster)
    default_compute_dtype: str = "native"


@functools.lru_cache(maxsize=1)
def detect() -> TpuCapabilities:
    try:
        kind = jax.devices()[0].device_kind.lower()
        platform = jax.devices()[0].platform
    except Exception:
        kind, platform = "", "cpu"

    if platform != "tpu":
        # CPU (tests run on a virtual CPU mesh): kernels run in interpret
        # mode; all dtypes "work", none are fast.
        return TpuCapabilities(platform, False, False, "bf16", "native")

    if "v5 lite" in kind or "v5e" in kind:
        gen = "v5e"
    elif "v5" in kind or "v5p" in kind:
        gen = "v5p"
    elif "v6" in kind or "trillium" in kind:
        gen = "v6e"
    elif "v4" in kind:
        gen = "v4"
    else:
        gen = "unknown"

    has_fp8 = gen in ("v6e",)
    # fp8 PV (SageAttention2 mode) where the MXU supports it natively.
    # On v5-class chips the int8-storage / bf16-compute mode is fastest
    # (int8 kept for V storage with per-channel scales + smoothing).
    default_pv = "fp8" if has_fp8 else "int8"
    default_compute = "native" if has_fp8 else "bf16"
    return TpuCapabilities(gen, gen not in ("v5e", "v5p", "v4"), has_fp8,
                           default_pv, default_compute)


def default_interpret() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU test meshes).

    Checked via the device platform, not ``jax.default_backend()``: tunneled
    TPU platforms (e.g. "axon") report a non-"tpu" backend name while the
    devices themselves are real TPUs.
    """
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True
