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
                  pv_dtype, interpret, n, kv_true=0):
    """q/k/v local shards [B, H, S/n, D] (HND) -> output [B, Hq, S/n, D].

    GQA: when the KV heads don't divide by the ulysses degree, K/V are
    all-gathered along the sequence instead and each device slices the KV
    head(s) its contiguous q-head chunk maps to (replication is inherent
    when Hk < degree — same tradeoff as Ulysses-GQA in Megatron/xDiT)."""
    Hk = k.shape[1]

    # heads -> devices, gather sequence: [B, H/n, S, D]
    def scatter_heads(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    def gather_heads(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    qg = scatter_heads(q)
    if Hk % n == 0:
        kg, vg = scatter_heads(k), scatter_heads(v)
    else:
        # gather full KV sequence, slice this device's kv-head range
        Hq = q.shape[1]
        G = Hq // Hk
        hq_loc = Hq // n
        idx = jax.lax.axis_index(axis_name)
        k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
        if hq_loc % G == 0:
            span = hq_loc // G
        else:
            assert G % hq_loc == 0, (
                f"ulysses GQA needs the per-device q-head chunk ({hq_loc}) "
                f"and the group size ({G}) to divide one another")
            span = 1
        start = (idx * hq_loc) // G
        kg = jax.lax.dynamic_slice_in_dim(k_full, start, span, axis=1)
        vg = jax.lax.dynamic_slice_in_dim(v_full, start, span, axis=1)
    out = core_api._route(
        qg, kg, vg, tensor_layout="HND", is_causal=is_causal,
        sm_scale=sm_scale, qk_quant_gran=qk_quant_gran, pv_dtype=pv_dtype,
        interpret=interpret, kv_true=kv_true)
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

    Global HND arrays: q [B, Hq, S, D], k/v [B, Hk, S, D] with
    Hq % Hk == 0 (GQA).  Awkward shapes are handled by padding (r3):
    ``S`` is padded to a multiple of the degree (pad columns masked via
    ``kv_true``, pad rows sliced off), and when Hq doesn't divide by the
    degree, whole GQA GROUPS of zero heads are appended (Hk -> Hk', Hq ->
    G*Hk') so the head->kv-head map of every real head is unchanged; the
    dummy heads compute garbage that is sliced off after the gather.
    """
    B, H, S, D = q.shape
    Hk = k.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if pv_dtype is None:
        pv_dtype = detect().default_pv_dtype
    if interpret is None:
        interpret = default_interpret()
    n = mesh.shape[axis_name]
    assert H % Hk == 0, f"q heads {H} must be a multiple of kv heads {Hk}"
    G = H // Hk
    H_pad, Hk_pad = H, Hk
    if H % n != 0:
        # smallest Hk' >= Hk with (G * Hk') % n == 0: step by whole groups
        import math
        step = n // math.gcd(G, n)
        Hk_pad = -(-Hk // step) * step
        H_pad = G * Hk_pad
        q = jnp.pad(q, ((0, 0), (0, H_pad - H), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Hk_pad - Hk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Hk_pad - Hk), (0, 0), (0, 0)))
    S_pad = -(-S // n) * n
    if S_pad != S:
        pads = ((0, 0), (0, 0), (0, S_pad - S), (0, 0))
        q, k, v = (jnp.pad(x, pads) for x in (q, k, v))

    body = functools.partial(
        _ulysses_body, axis_name=axis_name, is_causal=is_causal,
        sm_scale=sm_scale, qk_quant_gran=qk_quant_gran, pv_dtype=pv_dtype,
        interpret=interpret, n=n, kv_true=S if S_pad != S else 0)
    spec = P(None, None, axis_name, None)
    out = shard_map(body, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                    check_vma=False)(q, k, v)
    if H_pad != H:
        out = out[:, :H]
    if S_pad != S:
        out = out[:, :, :S]
    return out
