"""Sliding-window (local) causal attention vs a band-masked fp32 oracle.

The window is enforced at three levels — index-map DMA clamp, sub-tile
skip, in-tile mask — so the oracle comparison over unaligned sizes and
window widths that straddle block boundaries covers all of them.
"""

import jax
import jax.numpy as jnp
import pytest

import sageattention_tpu as sa
from sageattention_tpu.ops.reference import sdpa
from sageattention_tpu.utils.testing import calc_diff


def qkv(B=1, H=2, S=512, D=64, seed=0):
    r = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(kk, (B, H, S, D), jnp.float32)
                 for kk in r)


def band_ref(q, k, v, window):
    S = q.shape[2]
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(S)[None, :]
    mask = (cols <= rows) & (cols >= rows - (window - 1))
    return sdpa(q, k, v, mask=mask[None, None])


class TestSlidingWindow:
    @pytest.mark.parametrize("window", [128, 200, 512])
    def test_quantized_matches_band_oracle(self, window):
        q, k, v = qkv(S=512)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=window)
        assert calc_diff(out, band_ref(q, k, v, window)) < 1e-3

    def test_unaligned_seq(self):
        q, k, v = qkv(S=700, seed=1)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=300)
        assert calc_diff(out, band_ref(q, k, v, 300)) < 1e-3

    def test_window_wider_than_seq_is_causal(self):
        q, k, v = qkv(S=256, seed=2)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=4096)
        assert calc_diff(out, sdpa(q, k, v, is_causal=True)) < 1e-3

    def test_online_softmax_path(self):
        q, k, v = qkv(S=512, seed=3)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=256,
                          softmax_mode="online")
        assert calc_diff(out, band_ref(q, k, v, 256)) < 1e-3

    def test_flash_baseline_window(self):
        q, k, v = qkv(S=512, seed=4)
        out = sa.flash_attention(q, k, v, is_causal=True, sliding_window=256)
        assert calc_diff(out, band_ref(q, k, v, 256)) < 2e-5

    def test_narrow_window_on_long_seq(self):
        # many fully-skipped blocks on both sides of the band
        q, k, v = qkv(S=2048, seed=5)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=128)
        assert calc_diff(out, band_ref(q, k, v, 128)) < 1e-3

    def test_varlen_chunked_prefill(self):
        """SWA chunked prefill: a 3-sequence varlen pack with a band must
        match each sequence's own banded attention."""
        T, H, D, W = 768, 2, 64, 150
        cu = jnp.array([0, 300, 520, 768], jnp.int32)
        r = jax.random.split(jax.random.PRNGKey(8), 3)
        qp, kp, vp = (jax.random.normal(kk, (T, H, D), jnp.float32)
                      for kk in r)
        out = sa.sageattn_varlen(qp, kp, vp, cu, cu, 0, 0, is_causal=True,
                                 sliding_window=W)
        for i in range(3):
            a, b = int(cu[i]), int(cu[i + 1])
            ref = band_ref(jnp.swapaxes(qp[None, a:b], 1, 2),
                           jnp.swapaxes(kp[None, a:b], 1, 2),
                           jnp.swapaxes(vp[None, a:b], 1, 2), W)
            assert calc_diff(out[a:b], jnp.swapaxes(ref[0], 0, 1)) < 1e-3, i

    def test_grads_match_band_oracle(self):
        """The backward kernels thread the window (r3): grads through the
        public API must match autodiff through exact banded attention."""
        import numpy as np
        q, k, v = qkv(S=384, seed=6)
        W = 150  # straddles block boundaries
        f = lambda q, k, v: jnp.sum(sa.sageattn(
            q, k, v, is_causal=True, sliding_window=W) ** 2)
        fr = lambda q, k, v: jnp.sum(band_ref(q, k, v, W) ** 2)
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for x, y, n in zip(g, gr, "qkv"):
            num = np.abs(np.asarray(x) - np.asarray(y, np.float32)).max()
            den = np.abs(np.asarray(y, np.float32)).max() + 1e-9
            assert num / den < 6e-2, f"d{n}: {num/den}"

    def test_grad_window_wider_than_seq_matches_causal(self):
        q, k, v = qkv(S=256, seed=9)
        import numpy as np
        f = lambda q: jnp.sum(sa.sageattn(q, k, v, is_causal=True,
                                          sliding_window=4096) ** 2)
        fc = lambda q: jnp.sum(sa.sageattn(q, k, v, is_causal=True) ** 2)
        g, gc = jax.grad(f)(q), jax.grad(fc)(q)
        assert np.abs(np.asarray(g) - np.asarray(gc)).max() < 1e-4

    def test_requires_causal(self):
        q, k, v = qkv(S=256, seed=7)
        with pytest.raises(ValueError, match="is_causal"):
            sa.sageattn(q, k, v, sliding_window=128)
        with pytest.raises(ValueError, match="is_causal"):
            sa.flash_attention(q, k, v, sliding_window=128)


def band_sink_ref(q, k, v, window, sinks):
    S = q.shape[2]
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(S)[None, :]
    mask = (cols <= rows) & ((cols >= rows - (window - 1)) | (cols < sinks))
    return sdpa(q, k, v, mask=mask[None, None])


class TestAttentionSinks:
    """StreamingLLM sinks on the PREFILL band kernel (decode already has
    them, ops/paged_decode.py): the first `sinks` key positions stay
    visible to every row in addition to its band."""

    @pytest.mark.parametrize("window,sinks", [(128, 4), (200, 64), (128, 130)])
    def test_matches_oracle(self, window, sinks):
        q, k, v = qkv(S=512, seed=10)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=window,
                          attention_sinks=sinks)
        assert calc_diff(out, band_sink_ref(q, k, v, window, sinks)) < 1e-3

    def test_unaligned_seq(self):
        q, k, v = qkv(S=700, seed=11)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=300,
                          attention_sinks=37)
        assert calc_diff(out, band_sink_ref(q, k, v, 300, 37)) < 1e-3

    def test_narrow_window_long_seq(self):
        # sink blocks far below every row's band: exercises the DMA
        # pass-through clamp + maskless fully-sink sub-tiles
        q, k, v = qkv(S=2048, seed=12)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=128,
                          attention_sinks=16)
        assert calc_diff(out, band_sink_ref(q, k, v, 128, 16)) < 1e-3

    def test_online_softmax_path(self):
        q, k, v = qkv(S=512, seed=13)
        out = sa.sageattn(q, k, v, is_causal=True, sliding_window=256,
                          attention_sinks=8, softmax_mode="online")
        assert calc_diff(out, band_sink_ref(q, k, v, 256, 8)) < 1e-3

    def test_flash_baseline_sinks(self):
        q, k, v = qkv(S=512, seed=14)
        out = sa.flash_attention(q, k, v, is_causal=True, sliding_window=256,
                                 attention_sinks=8)
        assert calc_diff(out, band_sink_ref(q, k, v, 256, 8)) < 2e-5

    def test_grads_match_oracle(self):
        import numpy as np
        q, k, v = qkv(S=384, seed=15)
        W, n = 150, 32
        f = lambda q, k, v: jnp.sum(sa.sageattn(
            q, k, v, is_causal=True, sliding_window=W,
            attention_sinks=n) ** 2)
        fr = lambda q, k, v: jnp.sum(band_sink_ref(q, k, v, W, n) ** 2)
        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for x, y, nm in zip(g, gr, "qkv"):
            num = np.abs(np.asarray(x) - np.asarray(y, np.float32)).max()
            den = np.abs(np.asarray(y, np.float32)).max() + 1e-9
            assert num / den < 6e-2, f"d{nm}: {num/den}"

    def test_requires_window(self):
        q, k, v = qkv(S=256, seed=16)
        with pytest.raises(ValueError, match="sliding_window"):
            sa.sageattn(q, k, v, is_causal=True, attention_sinks=4)
        with pytest.raises(ValueError, match="sliding_window"):
            sa.flash_attention(q, k, v, is_causal=True, attention_sinks=4)

    def test_varlen_per_segment_sinks(self):
        """Per-SEGMENT sinks in a varlen pack: each sequence keeps its OWN
        first `n` tokens visible beyond the band — StreamingLLM chunked
        prefill.  Sink columns of later segments sit far below the global
        band, exercising the dynamic (segpos-driven) tile liveness."""
        T, H, D, W, n = 768, 2, 64, 150, 24
        cu = jnp.array([0, 300, 520, 768], jnp.int32)
        r = jax.random.split(jax.random.PRNGKey(17), 3)
        qp, kp, vp = (jax.random.normal(kk, (T, H, D), jnp.float32)
                      for kk in r)
        out = sa.sageattn_varlen(qp, kp, vp, cu, cu, 0, 0, is_causal=True,
                                 sliding_window=W, attention_sinks=n)
        for i in range(3):
            a, b = int(cu[i]), int(cu[i + 1])
            ref = band_sink_ref(jnp.swapaxes(qp[None, a:b], 1, 2),
                                jnp.swapaxes(kp[None, a:b], 1, 2),
                                jnp.swapaxes(vp[None, a:b], 1, 2), W, n)
            assert calc_diff(out[a:b], jnp.swapaxes(ref[0], 0, 1)) < 1e-3, i

    def test_varlen_sinks_online_mode(self):
        T, H, D, W, n = 512, 2, 64, 100, 16
        cu = jnp.array([0, 200, 512], jnp.int32)
        r = jax.random.split(jax.random.PRNGKey(18), 3)
        qp, kp, vp = (jax.random.normal(kk, (T, H, D), jnp.float32)
                      for kk in r)
        out = sa.sageattn_varlen(qp, kp, vp, cu, cu, 0, 0, is_causal=True,
                                 sliding_window=W, attention_sinks=n,
                                 softmax_mode="online")
        for i in range(2):
            a, b = int(cu[i]), int(cu[i + 1])
            ref = band_sink_ref(jnp.swapaxes(qp[None, a:b], 1, 2),
                                jnp.swapaxes(kp[None, a:b], 1, 2),
                                jnp.swapaxes(vp[None, a:b], 1, 2), W, n)
            assert calc_diff(out[a:b], jnp.swapaxes(ref[0], 0, 1)) < 1e-3, i

    def test_varlen_sinks_require_window(self):
        T, H, D = 256, 2, 64
        cu = jnp.array([0, 256], jnp.int32)
        r = jax.random.split(jax.random.PRNGKey(19), 3)
        qp, kp, vp = (jax.random.normal(kk, (T, H, D), jnp.float32)
                      for kk in r)
        with pytest.raises(ValueError, match="sliding_window"):
            sa.sageattn_varlen(qp, kp, vp, cu, cu, 0, 0, is_causal=True,
                               attention_sinks=8)
