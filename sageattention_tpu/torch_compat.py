"""Drop-in torch-tensor front end for reference users.

The reference API (`/root/reference/sageattention/core.py:79-157`) takes
``torch.Tensor``s; a user migrating a torch pipeline to TPU shouldn't have
to hand-convert.  This module mirrors every public attention entry point
with a wrapper that accepts torch tensors (CPU — this environment's torch
has no TPU backend), moves them through numpy into jax (the one host copy
a cross-framework hop costs), runs the TPU path, and hands back a torch
tensor of the input's dtype and layout.

    from sageattention_tpu import torch_compat as sageattention
    out = sageattention.sageattn(q_torch, k_torch, v_torch,
                                 tensor_layout="NHD", is_causal=True)

bf16 note: numpy has no bfloat16 — bf16 torch tensors cross via float32
(exact: every bf16 value is a float32) and return as bf16.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import core as _core
from . import varlen as _varlen

try:  # torch is an optional peer — the module degrades to a clear error
    import torch
    _HAS_TORCH = True
except Exception:  # pragma: no cover
    torch = None
    _HAS_TORCH = False

_TORCH_TO_JNP = {}
if _HAS_TORCH:
    _TORCH_TO_JNP = {
        torch.float32: jnp.float32,
        torch.float16: jnp.float16,
        torch.bfloat16: jnp.bfloat16,
        torch.int32: jnp.int32,
        torch.int64: jnp.int32,   # cu_seqlens: jax-side kernels take int32
        torch.bool: jnp.bool_,
    }


def _to_jax(t):
    if not _HAS_TORCH or not isinstance(t, torch.Tensor):
        return t
    dt = _TORCH_TO_JNP.get(t.dtype)
    if dt is None:
        raise TypeError(f"unsupported torch dtype {t.dtype}")
    th = t.detach()
    if t.dtype == torch.bfloat16:
        # numpy can't represent bf16; float32 carries it exactly
        return jnp.asarray(th.float().cpu().numpy()).astype(jnp.bfloat16)
    return jnp.asarray(th.cpu().numpy(), dtype=dt)


def _to_torch(x, like_dtype):
    if x.dtype == jnp.bfloat16:   # numpy-representable carrier, exact
        x = x.astype(jnp.float32)
    arr = np.array(jax.device_get(x))   # owned copy: torch wants writable
    return torch.from_numpy(arr).to(like_dtype)


def _wrap(fn):
    @functools.wraps(fn)
    def wrapper(q, k, v, *args, **kwargs):
        if not _HAS_TORCH:
            raise RuntimeError("torch is not installed; use the jax API "
                               "(sageattention_tpu.sageattn) directly")
        if not isinstance(q, torch.Tensor):
            return fn(q, k, v, *args, **kwargs)  # jax arrays: pass through
        out_dtype = q.dtype
        args = tuple(_to_jax(a) for a in args)
        kwargs = {kk: _to_jax(vv) for kk, vv in kwargs.items()}
        res = fn(_to_jax(q), _to_jax(k), _to_jax(v), *args, **kwargs)
        if isinstance(res, tuple):  # (out, lse)
            out, lse = res
            return _to_torch(out, out_dtype), _to_torch(lse, torch.float32)
        return _to_torch(res, out_dtype)

    wrapper.__doc__ = (f"torch-tensor front end for "
                       f"`sageattention_tpu.{fn.__name__}` — see its doc.\n\n"
                       + (fn.__doc__ or ""))
    return wrapper


sageattn = _wrap(_core.sageattn)
sageattn_qk_int8_pv_bf16 = _wrap(_core.sageattn_qk_int8_pv_bf16)
sageattn_qk_int8_pv_int8 = _wrap(_core.sageattn_qk_int8_pv_int8)
sageattn_qk_int8_pv_fp8 = _wrap(_core.sageattn_qk_int8_pv_fp8)
sageattn_qk_int8_pv_fp16_triton = _wrap(_core.sageattn_qk_int8_pv_fp16_triton)
sageattn_qk_int8_pv_fp16_cuda = _wrap(_core.sageattn_qk_int8_pv_fp16_cuda)
sageattn_qk_int8_pv_fp8_cuda = _wrap(_core.sageattn_qk_int8_pv_fp8_cuda)
sageattn_qk_int8_pv_fp8_cuda_sm90 = _wrap(_core.sageattn_qk_int8_pv_fp8_cuda_sm90)
flash_attention = _wrap(_core.flash_attention)
sageattn_varlen = _wrap(_varlen.sageattn_varlen)

__all__ = [
    "sageattn", "sageattn_varlen",
    "sageattn_qk_int8_pv_bf16", "sageattn_qk_int8_pv_int8",
    "sageattn_qk_int8_pv_fp8", "sageattn_qk_int8_pv_fp16_triton",
    "sageattn_qk_int8_pv_fp16_cuda", "sageattn_qk_int8_pv_fp8_cuda",
    "sageattn_qk_int8_pv_fp8_cuda_sm90", "flash_attention",
]
