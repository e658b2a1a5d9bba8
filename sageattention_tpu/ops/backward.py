"""Attention backward pass (training support).

The reference is inference-only (no backward anywhere; SURVEY.md §4), but
its authors' follow-up (SageBwd, arXiv 2505.11594) trains with quantized
forward + straight-through gradients.  We take the same position: the
quantized forward is treated as exact attention and gradients are the
standard flash-attention backward computed from the saved (q, k, v, o, lse):

    D_i   = sum(dO_i * O_i)
    P_ij  = exp(q_i.k_j * scale - lse_i)
    dV_j  = sum_i P_ij dO_i
    dS_ij = P_ij * (dO_i . V_j - D_i)
    dQ_i  = scale * sum_j dS_ij K_j ;  dK_j = scale * sum_i dS_ij Q_i

Round-1 implementation is pure jnp chunked over KV blocks via lax.map
(O(S * chunk) memory); a Pallas backward kernel replaces the inner math in a
later milestone without changing this interface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attention_backward(q, k, v, o, lse, do, *, sm_scale, is_causal,
                       chunk: int = 512):
    """HND inputs: q/o/do [B,Hq,Sq,D]; k/v [B,Hk,Sk,D]; lse [B,Hq,Sq]
    (natural log).  Returns (dq, dk, dv) with GQA head-group reduction."""
    B, Hq, Sq, D = q.shape
    _, Hk, Sk, _ = k.shape
    G = Hq // Hk
    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k.astype(jnp.float32), G, axis=1) if G > 1 else k.astype(jnp.float32)
    vf = jnp.repeat(v.astype(jnp.float32), G, axis=1) if G > 1 else v.astype(jnp.float32)
    of = o.astype(jnp.float32)
    dof = do.astype(jnp.float32)

    Di = jnp.sum(dof * of, axis=-1)  # [B,Hq,Sq]

    n_chunks = max(1, (Sk + chunk - 1) // chunk)
    pad = n_chunks * chunk - Sk
    if pad:
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad), (0, 0)))

    rows = jnp.arange(Sq)

    def kv_chunk(c):
        ks = jax.lax.dynamic_slice_in_dim(kf, c * chunk, chunk, axis=2)
        vs = jax.lax.dynamic_slice_in_dim(vf, c * chunk, chunk, axis=2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, ks) * sm_scale
        p = jnp.exp(s - lse[..., None])
        cols = c * chunk + jnp.arange(chunk)
        valid = (cols < Sk)[None, None, None, :]
        if is_causal:
            valid = valid & (cols[None, None, None, :] <= rows[None, None, :, None])
        p = jnp.where(valid, p, 0.0)
        dv_c = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
        ds = p * (jnp.einsum("bhqd,bhkd->bhqk", dof, vs) - Di[..., None])
        dq_c = jnp.einsum("bhqk,bhkd->bhqd", ds, ks) * sm_scale
        dk_c = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * sm_scale
        return dq_c, dk_c, dv_c

    dq_cs, dk_cs, dv_cs = jax.lax.map(kv_chunk, jnp.arange(n_chunks))
    dq = jnp.sum(dq_cs, axis=0)
    dk = jnp.moveaxis(dk_cs, 0, 2).reshape(B, Hq, n_chunks * chunk, D)[:, :, :Sk]
    dv = jnp.moveaxis(dv_cs, 0, 2).reshape(B, Hq, n_chunks * chunk, D)[:, :, :Sk]
    if G > 1:
        dk = dk.reshape(B, Hk, G, Sk, D).sum(axis=2)
        dv = dv.reshape(B, Hk, G, Sk, D).sum(axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
