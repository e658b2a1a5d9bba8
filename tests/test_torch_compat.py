"""torch front end: tensors cross the bridge, outputs keep dtype/layout."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sageattention_tpu import torch_compat as tc
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff


def qkv_t(B=1, H=2, S=256, D=64, dtype=torch.float32, seed=0):
    g = torch.Generator().manual_seed(seed)
    return tuple(torch.randn(B, H, S, D, generator=g, dtype=torch.float32
                             ).to(dtype) for _ in range(3))


class TestTorchBridge:
    def test_sageattn_fp32(self):
        q, k, v = qkv_t()
        out = tc.sageattn(q, k, v)
        assert isinstance(out, torch.Tensor) and out.dtype == torch.float32
        ref = sdpa(*(jnp.asarray(t.numpy()) for t in (q, k, v)))
        assert calc_diff(jnp.asarray(out.numpy()), ref) < 1e-3

    def test_sageattn_bf16_causal_nhd(self):
        q, k, v = qkv_t(dtype=torch.bfloat16, seed=1)
        qn, kn, vn = (t.transpose(1, 2).contiguous() for t in (q, k, v))
        out = tc.sageattn(qn, kn, vn, tensor_layout="NHD", is_causal=True)
        assert out.dtype == torch.bfloat16 and out.shape == qn.shape
        ref = sdpa(*(jnp.asarray(t.float().numpy()) for t in (q, k, v)),
                   is_causal=True)
        assert calc_diff(jnp.asarray(out.float().numpy()),
                         jnp.swapaxes(ref, 1, 2)) < 1e-3

    def test_bool_mask_crosses(self):
        q, k, v = qkv_t(seed=2)
        mask = torch.rand(1, 1, 256, 256) > 0.2
        out = tc.sageattn_qk_int8_pv_bf16(q, k, v, attn_mask=mask)
        ref = sdpa(*(jnp.asarray(t.numpy()) for t in (q, k, v)),
                   mask=jnp.asarray(mask.numpy()))
        assert calc_diff(jnp.asarray(out.numpy()), ref) < 1e-3

    def test_return_lse_pair(self):
        q, k, v = qkv_t(seed=3)
        out, lse = tc.sageattn(q, k, v, return_lse=True)
        assert lse.dtype == torch.float32
        ref, lse_ref = sdpa(*(jnp.asarray(t.numpy()) for t in (q, k, v)),
                            return_lse=True)
        assert calc_diff(jnp.asarray(out.numpy()), ref) < 1e-3
        assert float(np.abs(lse.numpy() - np.asarray(lse_ref)).max()) < 2e-2

    def test_varlen_cu_seqlens_int64(self):
        g = torch.Generator().manual_seed(4)
        qp, kp, vp = (torch.randn(256, 2, 64, generator=g) for _ in range(3))
        cu = torch.tensor([0, 100, 256], dtype=torch.int64)  # torch default
        out = tc.sageattn_varlen(qp, kp, vp, cu, cu, 156, 156)
        assert out.shape == qp.shape
        refA = sdpa(jnp.swapaxes(jnp.asarray(qp.numpy()[:100])[None], 1, 2),
                    jnp.swapaxes(jnp.asarray(kp.numpy()[:100])[None], 1, 2),
                    jnp.swapaxes(jnp.asarray(vp.numpy()[:100])[None], 1, 2))
        assert calc_diff(jnp.asarray(out.numpy()[:100]),
                         jnp.swapaxes(refA[0], 0, 1)) < 1.5e-3

    def test_jax_arrays_pass_through(self):
        import jax
        r = jax.random.split(jax.random.PRNGKey(5), 3)
        q, k, v = (jax.random.normal(kk, (1, 2, 256, 64)) for kk in r)
        out = tc.sageattn(q, k, v)
        assert not isinstance(out, torch.Tensor)
        assert calc_diff(out, sdpa(q, k, v)) < 1e-3
