"""Tensor-layout helpers.

The reference library supports two memory layouts for attention inputs
(`/root/reference/sageattention/core.py:92-107`):

- ``"HND"``: ``[batch, heads, seq, head_dim]``
- ``"NHD"``: ``[batch, seq, heads, head_dim]``

On TPU we avoid physical transposes entirely: the Pallas kernels index both
layouts natively through their BlockSpec index maps.  These helpers only
extract dimension metadata and perform the cheap padding ops that the
reference does with ``F.pad`` (`core.py:750-761`).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LayoutInfo:
    """Dimension indices for a given tensor layout."""

    name: str  # "HND" or "NHD"
    batch_axis: int
    head_axis: int
    seq_axis: int
    dim_axis: int

    @property
    def is_hnd(self) -> bool:
        return self.name == "HND"


HND = LayoutInfo("HND", 0, 1, 2, 3)
NHD = LayoutInfo("NHD", 0, 2, 1, 3)


def get_layout(tensor_layout: str) -> LayoutInfo:
    if tensor_layout == "HND":
        return HND
    if tensor_layout == "NHD":
        return NHD
    raise ValueError(f"tensor_layout must be 'HND' or 'NHD', got {tensor_layout!r}")


def dims(x, layout: LayoutInfo):
    """Return (batch, heads, seq, head_dim) sizes of ``x`` under ``layout``."""
    s = x.shape
    return (s[layout.batch_axis], s[layout.head_axis], s[layout.seq_axis], s[layout.dim_axis])


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_axis(x, axis: int, target: int, value=0):
    """Zero-pad ``x`` along ``axis`` up to length ``target`` (no-op if equal)."""
    cur = x.shape[axis]
    if cur == target:
        return x
    if cur > target:
        raise ValueError(f"cannot pad axis {axis} from {cur} down to {target}")
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - cur)
    return jnp.pad(x, pads, constant_values=value)


def pad_head_dim(x, layout: LayoutInfo):
    """Pad head_dim to the next supported size {64, 128, 256}.

    Mirrors the reference's padding of head_dim to 64/128
    (`/root/reference/sageattention/core.py:750-761`); on TPU 256 is also a
    natural lane multiple so we allow it rather than erroring.
    """
    d = x.shape[layout.dim_axis]
    if d <= 64:
        target = 64
    elif d <= 128:
        target = 128
    elif d <= 256:
        target = 256
    else:
        raise ValueError(f"head_dim {d} > 256 is unsupported")
    return pad_axis(x, layout.dim_axis, target), target


def to_hnd(x, layout: LayoutInfo):
    """Transpose to HND if needed (used only by non-kernel reference paths)."""
    if layout.is_hnd:
        return x
    return jnp.swapaxes(x, 1, 2)


def from_hnd(x, layout: LayoutInfo):
    if layout.is_hnd:
        return x
    return jnp.swapaxes(x, 1, 2)
