"""Loader for the native host-side extension with pure-python fallback.

`csrc/varlen_pack.cpp` implements the ragged-batch bookkeeping (cumulative
length tables, token segment ids, pack/unpack index maps) in C++; if the
extension hasn't been built (`python setup_native.py build_ext --inplace`)
numpy fallbacks keep everything functional.
"""

from __future__ import annotations

import numpy as np

try:
    import _sageattn_native as _ext  # built at repo root

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - depends on build state
    _ext = None
    HAVE_NATIVE = False


def cu_seqlens(lengths) -> np.ndarray:
    """[n] int32 lengths -> [n+1] int32 cumulative table."""
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    if _ext is not None:
        return _ext.cu_seqlens(lengths)
    return np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)


def segment_ids(cu, total_padded: int) -> np.ndarray:
    """[n+1] cu table -> [total_padded] int32 segment ids (padding = -1)."""
    cu = np.ascontiguousarray(cu, dtype=np.int32)
    if _ext is not None:
        return _ext.segment_ids(cu, int(total_padded))
    pos = np.arange(total_padded)
    seg = np.searchsorted(cu, pos, side="right") - 1
    seg[pos >= cu[-1]] = -1
    return seg.astype(np.int32)


def pack_indices(lengths, max_len: int):
    """Gather map from padded [n, max_len] layout into packed [total] and the
    validity mask — the host-side step a ragged data loader runs per batch."""
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    if _ext is not None:
        return _ext.pack_indices(lengths, int(max_len))
    n = len(lengths)
    mask = (np.arange(max_len)[None, :] < lengths[:, None]).reshape(-1)
    gather = np.nonzero(mask)[0].astype(np.int64)
    return gather, mask


def pack_padded(x_padded: np.ndarray, lengths) -> np.ndarray:
    """[n, max_len, ...] -> packed [total, ...] using the native index map."""
    n, max_len = x_padded.shape[:2]
    gather, _ = pack_indices(lengths, max_len)
    flat = x_padded.reshape(n * max_len, *x_padded.shape[2:])
    return flat[gather]


def unpack_to_padded(x_packed: np.ndarray, lengths, max_len: int) -> np.ndarray:
    """packed [total, ...] -> [n, max_len, ...] zero-padded."""
    lengths = np.ascontiguousarray(lengths, dtype=np.int32)
    n = len(lengths)
    gather, _ = pack_indices(lengths, max_len)
    out = np.zeros((n * max_len, *x_packed.shape[1:]), dtype=x_packed.dtype)
    out[gather] = x_packed
    return out.reshape(n, max_len, *x_packed.shape[1:])
