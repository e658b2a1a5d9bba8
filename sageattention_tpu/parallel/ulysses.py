"""Ulysses sequence parallelism: all_to_all heads<->sequence.

The reference reaches Ulysses only through xDiT's ``--ulysses_degree``
(`/root/reference/example/parallel_sageattn_cogvideo.py:31-36`); here it is
an in-repo shard_map transform: each device trades its sequence shard of
*all* heads for the full sequence of *its* heads, runs the full quantized
single-device attention locally, and trades back.  Communication is two
``all_to_all`` collectives over ICI; attention itself needs no collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..dispatch import default_interpret, detect
from .. import core as core_api
from .mesh import SP


def _ulysses_body(q, k, v, *, axis_name, is_causal, sm_scale, qk_quant_gran,
                  pv_dtype, interpret):
    """q/k/v local shards [B, H, S/n, D] (HND) -> output [B, H, S/n, D]."""
    # heads -> devices, gather sequence: [B, H/n, S, D]
    def scatter_heads(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    def gather_heads(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    qg, kg, vg = scatter_heads(q), scatter_heads(k), scatter_heads(v)
    out = core_api._route(
        qg, kg, vg, tensor_layout="HND", is_causal=is_causal,
        sm_scale=sm_scale, qk_quant_gran=qk_quant_gran, pv_dtype=pv_dtype,
        interpret=interpret)
    return gather_heads(out)


def ulysses_sageattn(
    q, k, v,
    mesh: Mesh,
    axis_name: str = SP,
    is_causal: bool = False,
    sm_scale: Optional[float] = None,
    qk_quant_gran: str = "per_thread",
    pv_dtype: Optional[str] = None,
    interpret: Optional[bool] = None,
):
    """Sequence-parallel attention via head scatter / seq gather.

    Global HND arrays [B, H, S, D]; requires H % axis_size == 0.
    """
    B, H, S, D = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if pv_dtype is None:
        pv_dtype = detect().default_pv_dtype
    if interpret is None:
        interpret = default_interpret()
    n = mesh.shape[axis_name]
    assert H % n == 0, f"heads {H} must divide by ulysses degree {n}"

    body = functools.partial(
        _ulysses_body, axis_name=axis_name, is_causal=is_causal,
        sm_scale=sm_scale, qk_quant_gran=qk_quant_gran, pv_dtype=pv_dtype,
        interpret=interpret)
    spec = P(None, None, axis_name, None)
    return shard_map(body, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                     check_vma=False)(q, k, v)
