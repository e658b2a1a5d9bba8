"""attn_mask paths and straight-through gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sageattention_tpu as sa
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff


def qkv(S=256, D=64, H=2):
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    return tuple(jax.random.normal(k, (1, H, S, D), jnp.float32) for k in ks)


def masked_oracle(q, k, v, mask_or_bias, sm_scale=None):
    D = q.shape[-1]
    sm_scale = sm_scale or D ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm_scale
    if mask_or_bias.dtype == jnp.bool_:
        s = jnp.where(mask_or_bias, s, -1e30)
    else:
        s = s + mask_or_bias
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


class TestAttnMask:
    def test_bool_mask(self):
        q, k, v = qkv()
        mask = jax.random.bernoulli(jax.random.PRNGKey(9), 0.8, (1, 1, 256, 256))
        out = sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=mask)
        assert calc_diff(out, masked_oracle(q, k, v, mask)) < 1e-3

    def test_float_bias(self):
        q, k, v = qkv()
        bias = jax.random.normal(jax.random.PRNGKey(10), (1, 1, 256, 256)) * 2
        out = sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=bias)
        assert calc_diff(out, masked_oracle(q, k, v, bias)) < 1e-3

    def test_per_head_mask(self):
        q, k, v = qkv(H=4)
        mask = jax.random.bernoulli(jax.random.PRNGKey(11), 0.7, (1, 4, 256, 256))
        out = sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=mask)
        assert calc_diff(out, masked_oracle(q, k, v, mask)) < 1e-3

    def test_mask_with_causal(self):
        q, k, v = qkv()
        mask = jax.random.bernoulli(jax.random.PRNGKey(12), 0.9, (1, 1, 256, 256))
        out = sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=mask, is_causal=True)
        tri = jnp.tril(jnp.ones((256, 256), bool))[None, None]
        assert calc_diff(out, masked_oracle(q, k, v, mask & tri)) < 1e-3

    def test_block_sparse_mask(self):
        """Entire 128-blocks masked out — exercises the block-skip path
        (dead blocks never run; rows with zero live blocks output 0)."""
        q, k, v = qkv(S=512)
        keep = jnp.ones((1, 1, 512, 512), bool)
        keep = keep.at[:, :, :, 128:384].set(False)   # kill 2 kv blocks
        keep = keep.at[:, :, 256:384, :].set(False)   # kill a full q block
        out = sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=keep)
        ref = masked_oracle(q, k, v, keep)
        # fully-masked q rows: kernel outputs 0, oracle softmax is uniform —
        # compare live rows, check dead rows are 0
        live = np.r_[0:256, 384:512]
        assert calc_diff(out[:, :, live], ref[:, :, live]) < 1e-3
        assert float(jnp.max(jnp.abs(out[:, :, 256:384]))) == 0.0

    def test_mask_via_jax_nn_adapter(self):
        from sageattention_tpu.models import sage_dot_product_attention
        q, k, v = qkv()
        qn, kn, vn = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        mask = jax.random.bernoulli(jax.random.PRNGKey(13), 0.8, (1, 1, 256, 256))
        out = sage_dot_product_attention(qn, kn, vn, mask=mask)
        ref = jax.nn.dot_product_attention(qn, kn, vn, mask=mask)
        assert calc_diff(out, ref) < 1e-3


class TestGradients:
    def test_matches_exact_attention_grads(self):
        q, k, v = qkv()

        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

        g = jax.grad(loss(sa.sageattn_qk_int8_pv_bf16), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss(sdpa), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() / np.abs(np.asarray(b)).max()
            # 0.06 with the r3 int8-backward default (max-rel is an
            # outlier metric; gradient cossim stays ~1e-3-class — see
            # test_backward_pallas.TestQuantizedBackward, and
            # quant_backward=False restores the exact-math path at 0.03)
            assert rel < 0.06

    def test_causal_grads(self):
        q, k, v = qkv()
        f = lambda q, k, v: jnp.sum(sa.sageattn_qk_int8_pv_bf16(q, k, v, is_causal=True))
        fr = lambda q, k, v: jnp.sum(sdpa(q, k, v, is_causal=True))
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (np.abs(np.asarray(b)).max() + 1e-9)
            assert rel < 0.05

    def test_gqa_grads_shapes(self):
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(ks[0], (1, 4, 128, 64))
        k = jax.random.normal(ks[1], (1, 2, 128, 64))
        v = jax.random.normal(ks[2], (1, 2, 128, 64))
        g = jax.grad(lambda *a: jnp.sum(sa.sageattn_qk_int8_pv_bf16(*a)),
                     argnums=(0, 1, 2))(q, k, v)
        assert g[0].shape == q.shape and g[1].shape == k.shape and g[2].shape == v.shape

    def test_int8_mode_differentiable(self):
        q, k, v = qkv(S=128)
        g = jax.grad(lambda q: jnp.sum(sa.sageattn_qk_int8_pv_int8(q, k, v)))(q)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_bool_mask_grads_match_exact(self):
        # regression: masked calls used to bypass custom_vjp and silently
        # differentiate through jnp.rint (near-zero dq/dk)
        q, k, v = qkv()
        mask = jax.random.bernoulli(jax.random.PRNGKey(21), 0.8, (1, 1, 256, 256))
        f = lambda q, k, v: jnp.sum(
            sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=mask) ** 2)
        fr = lambda q, k, v: jnp.sum(sdpa(q, k, v, mask=mask) ** 2)
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() / np.abs(np.asarray(b)).max()
            assert rel < 0.05

    def test_bool_mask_causal_grads(self):
        q, k, v = qkv()
        mask = jax.random.bernoulli(jax.random.PRNGKey(22), 0.9, (1, 1, 256, 256))
        tri = jnp.tril(jnp.ones((256, 256), bool))[None, None]
        f = lambda q: jnp.sum(sa.sageattn_qk_int8_pv_bf16(
            q, k, v, attn_mask=mask, is_causal=True))
        fr = lambda q: jnp.sum(sdpa(q, k, v, mask=mask & tri))
        a = np.asarray(jax.grad(f)(q))
        b = np.asarray(jax.grad(fr)(q))
        assert np.abs(a - b).max() / np.abs(b).max() < 0.05

    def test_float_bias_grad_raises(self):
        q, k, v = qkv(S=128)
        bias = jnp.zeros((1, 1, 128, 128), jnp.float32)
        with pytest.raises(NotImplementedError, match="float additive-bias"):
            jax.grad(lambda q: jnp.sum(
                sa.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=bias)))(q)

    def test_return_lse_grad_raises(self):
        q, k, v = qkv(S=128)
        with pytest.raises(NotImplementedError, match="return_lse"):
            jax.grad(lambda q: jnp.sum(
                sa.sageattn_qk_int8_pv_bf16(q, k, v, return_lse=True)[0]))(q)

    def test_nhd_grads(self):
        q, k, v = qkv()
        qn, kn, vn = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        g = jax.grad(lambda q: jnp.sum(
            sa.sageattn_qk_int8_pv_bf16(q, kn, vn, tensor_layout="NHD")))(qn)
        assert g.shape == qn.shape and bool(jnp.all(jnp.isfinite(g)))
