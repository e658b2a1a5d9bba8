"""Pallas backward kernels vs the chunked-jnp reference backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.ops.backward import attention_backward
from sageattention_tpu.ops.backward_pallas import attention_backward_pallas
from sageattention_tpu.ops.reference import sdpa


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
    assert_close(g, gr, tol=5e-2)
