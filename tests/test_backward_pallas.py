"""Pallas backward kernels vs the chunked-jnp reference backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.ops.backward_pallas import attention_backward_pallas
from sageattention_tpu.ops.reference import sdpa


def attention_backward(q, k, v, o, lse, do, *, sm_scale, is_causal):
    """Test-local dense jnp reference backward (the standard flash
    backward math; formerly ops/backward.py, which the r4 verdict flagged
    as dead package code — shapes here are tiny, no chunking needed).

        D_i   = sum(dO_i * O_i)
        P_ij  = exp(q_i.k_j * scale - lse_i)
        dV_j  = sum_i P_ij dO_i
        dS_ij = P_ij * (dO_i . V_j - D_i)
        dQ_i  = scale * sum_j dS_ij K_j ;  dK_j = scale * sum_i dS_ij Q_i
    """
    B, Hq, Sq, D = q.shape
    _, Hk, Sk, _ = k.shape
    G = Hq // Hk
    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k, G, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, G, axis=1).astype(jnp.float32)
    dof = do.astype(jnp.float32)
    Di = jnp.sum(dof * o.astype(jnp.float32), axis=-1)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
    p = jnp.exp(s - lse[..., None])
    if is_causal:
        cols = jnp.arange(Sk)[None, None, None, :]
        p = jnp.where(cols <= jnp.arange(Sq)[None, None, :, None], p, 0.0)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
    ds = p * (jnp.einsum("bhqd,bhkd->bhqk", dof, vf) - Di[..., None])
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * sm_scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * sm_scale
    if G > 1:
        dk = dk.reshape(B, Hk, G, Sk, D).sum(axis=2)
        dv = dv.reshape(B, Hk, G, Sk, D).sum(axis=2)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


def setup(B=1, Hq=2, Hk=2, Sq=256, Sk=256, D=64, causal=False, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    q = jax.random.normal(ks[0], (B, Hq, Sq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hk, Sk, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hk, Sk, D), jnp.float32)
    do = jax.random.normal(ks[3], (B, Hq, Sq, D), jnp.float32)
    o, lse = sdpa(q, k, v, is_causal=causal, return_lse=True)
    return q, k, v, o, lse, do


def assert_close(a, b, tol=3e-2):
    for x, y, n in zip(a, b, "qkv"):
        num = np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32)).max()
        den = np.abs(np.asarray(y, np.float32)).max() + 1e-9
        assert num / den < tol, f"d{n}: {num/den}"


@pytest.mark.parametrize("causal", [False, True], ids=["full", "causal"])
def test_matches_jnp_backward(causal):
    q, k, v, o, lse, do = setup(causal=causal)
    sm = q.shape[-1] ** -0.5
    ref = attention_backward(q, k, v, o, lse, do, sm_scale=sm, is_causal=causal)
    got = attention_backward_pallas(q, k, v, o, lse, do, sm_scale=sm,
                                    is_causal=causal, block_q=128, block_k=128,
                                    interpret=True)
    assert_close(got, ref)


def test_gqa_group_sum():
    q, k, v, o, lse, do = setup(Hq=4, Hk=2)
    sm = q.shape[-1] ** -0.5
    ref = attention_backward(q, k, v, o, lse, do, sm_scale=sm, is_causal=False)
    got = attention_backward_pallas(q, k, v, o, lse, do, sm_scale=sm,
                                    is_causal=False, block_q=128, block_k=128,
                                    interpret=True)
    assert got[1].shape == k.shape and got[2].shape == v.shape
    assert_close(got, ref)


def test_unaligned_lengths():
    q, k, v, o, lse, do = setup(Sq=200, Sk=333)
    sm = q.shape[-1] ** -0.5
    ref = attention_backward(q, k, v, o, lse, do, sm_scale=sm, is_causal=False)
    got = attention_backward_pallas(q, k, v, o, lse, do, sm_scale=sm,
                                    is_causal=False, block_q=128, block_k=128,
                                    interpret=True)
    assert_close(got, ref)


def test_grads_vs_autodiff_oracle():
    """End-to-end: grads through the public API (now Pallas-backed) vs
    autodiff through exact attention."""
    import sageattention_tpu as sa
    q, k, v, *_ = setup(Sq=256, Sk=256)
    f = lambda q, k, v: jnp.sum(sa.sageattn_qk_int8_pv_bf16(q, k, v) ** 2)
    fr = lambda q, k, v: jnp.sum(sdpa(q, k, v) ** 2)
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    assert_close(g, gr, tol=6e-2)


class TestQuantizedBackward:
    """SageBwd-class int8 backward (r3): 5 of 7 matmuls int8 via the
    scale-absorption scheme (backward_pallas.py docstring); dO V^T stays
    bf16.  Gradient cossim vs the exact f32 vjp must stay ~1e-3-class."""

    def cosdiff(self, a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return 1 - 2 * (a @ b) / ((a @ a) + (b @ b) + 1e-30)

    @pytest.mark.parametrize("causal", [False, True], ids=["full", "causal"])
    def test_matches_exact_vjp(self, causal):
        q, k, v, o, lse, do = setup(Sq=384, Sk=384, causal=causal)
        sm = q.shape[-1] ** -0.5

        def exact(q, k, v):
            s = jnp.einsum("bhid,bhjd->bhij", q, k) * sm
            if causal:
                S = s.shape[-1]
                s = jnp.where(jnp.tril(jnp.ones((S, S), bool)), s, -jnp.inf)
            return jnp.einsum("bhij,bhjd->bhid",
                              jax.nn.softmax(s, axis=-1), v)

        _, vjp = jax.vjp(exact, q, k, v)
        ref = vjp(do)
        got = attention_backward_pallas(q, k, v, o, lse, do, sm_scale=sm,
                                        is_causal=causal, quantized=True,
                                        block_q=128, block_k=128,
                                        interpret=True)
        for a, b, n in zip(got, ref, "qkv"):
            assert self.cosdiff(a, b) < 1.5e-3, f"d{n}"
        assert_close(got, ref, tol=6e-2)

    def test_gqa_masked(self):
        q, k, v, o, lse, do = setup(Hq=4, Hk=2)
        sm = q.shape[-1] ** -0.5
        mask = jax.random.bernoulli(jax.random.PRNGKey(9), 0.85,
                                    (1, 1, q.shape[2], k.shape[2]))
        kr, vr = (jnp.repeat(x, 2, axis=1) for x in (k, v))
        s = jnp.einsum("bhid,bhjd->bhij", q, kr) * sm
        s = jnp.where(mask, s, -jnp.inf)
        lse = jax.nn.logsumexp(s, axis=-1)

        def exact(q, k, v):
            kk, vv = (jnp.repeat(x, 2, axis=1) for x in (k, v))
            s = jnp.einsum("bhid,bhjd->bhij", q, kk) * sm
            s = jnp.where(mask, s, -jnp.inf)
            return jnp.einsum("bhij,bhjd->bhid",
                              jax.nn.softmax(s, axis=-1), vv)

        o, vjp = jax.vjp(exact, q, k, v)
        ref = vjp(do)
        got = attention_backward_pallas(q, k, v, o, lse, do, sm_scale=sm,
                                        is_causal=False, attn_mask=mask,
                                        quantized=True, block_q=128,
                                        block_k=128, interpret=True)
        for a, b, n in zip(got, ref, "qkv"):
            assert self.cosdiff(a, b) < 1.5e-3, f"d{n}"

    def test_api_opt_out_matches_bf16(self):
        """quant_backward=False must reproduce the exact-math backward."""
        import sageattention_tpu as sa
        q, k, v, *_ = setup(Sq=256, Sk=256)
        g_q = jax.grad(lambda q, k, v: jnp.sum(
            sa.sageattn_qk_int8_pv_bf16(q, k, v) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        g_e = jax.grad(lambda q, k, v: jnp.sum(
            sa.sageattn_qk_int8_pv_bf16(q, k, v, quant_backward=False) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(sdpa(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        # default (quantized) and opt-out (bf16) both track the oracle;
        # the opt-out must be the tighter of the two
        assert_close(g_q, gr, tol=6e-2)
        assert_close(g_e, gr, tol=3e-2)
        for a, b in zip(g_q, g_e):
            assert float(jnp.max(jnp.abs(a - b))) > 0.0  # paths differ
