"""End-to-end model tests: DiT with SageAttention vs exact attention
(SURVEY.md §4: 'small DiT denoising loop, cosine-sim of final latents').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sageattention_tpu.models import (
    DiTConfig, make_dit, example_inputs, diffusion_loss,
    sage_dot_product_attention, patch_jax_nn_attention)
from sageattention_tpu.utils.testing import calc_diff

CFG = DiTConfig(hidden=128, heads=4, depth=2, frames=2, height=8, width=8,
                text_len=32, text_dim=64, zero_init_gates=False)


@pytest.fixture(scope="module")
def setup():
    latents, text, t = example_inputs(CFG)
    ref_model = make_dit(CFG, attn_fn=None)
    params = ref_model.init(jax.random.PRNGKey(0), latents, text, t)
    return params, latents, text, t


class TestDiT:
    def test_forward_shapes(self, setup):
        params, latents, text, t = setup
        out = make_dit(CFG).apply(params, latents, text, t)
        assert out.shape == latents.shape

    def test_sage_attention_parity(self, setup):
        """Forward pass with quantized attention ~= exact attention — the
        quantitative version of the reference's lossless-video check."""
        params, latents, text, t = setup
        ref = make_dit(CFG, attn_fn=None).apply(params, latents, text, t)
        sage = make_dit(CFG, attn_fn=sage_dot_product_attention).apply(
            params, latents, text, t)
        assert calc_diff(sage, ref) < 2e-3

    def test_denoising_loop_parity(self, setup):
        params, latents, text, _ = setup

        def denoise(model, x):
            def step(i, x):
                t = jnp.full((x.shape[0],), 900 - i * 200, jnp.int32)
                eps = model.apply(params, x, text, t)
                return x - 0.2 * eps.astype(x.dtype)
            return jax.lax.fori_loop(0, 4, step, x)

        ref = denoise(make_dit(CFG), latents)
        sage = denoise(make_dit(CFG, attn_fn=sage_dot_product_attention), latents)
        assert calc_diff(sage, ref) < 5e-3  # error accumulates over steps

    def test_training_step(self, setup):
        """Loss + grads through the quantized attention custom_vjp."""
        params, latents, text, t = setup
        model = make_dit(CFG, attn_fn=sage_dot_product_attention)
        loss, grads = jax.value_and_grad(
            lambda p: diffusion_loss(model, p, (latents, text, t),
                                     jax.random.PRNGKey(1)))(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


class TestMonkeypatch:
    def test_patch_context(self, setup):
        """The F.scaled_dot_product_attention-monkeypatch analogue
        (`example/cogvideox_infer.py:35`)."""
        params, latents, text, t = setup
        ref_model = make_dit(CFG, attn_fn=None)  # uses jax.nn.dot_product_attention
        ref = ref_model.apply(params, latents, text, t)
        with patch_jax_nn_attention():
            patched = ref_model.apply(params, latents, text, t)
        restored = ref_model.apply(params, latents, text, t)
        assert calc_diff(patched, ref) < 2e-3     # sage != exact but close
        assert calc_diff(restored, ref) < 1e-12   # patch fully reverted


class TestViT:
    def test_vit_parity(self):
        from sageattention_tpu.models.vit import ViTConfig, ViT
        cfg = ViTConfig(image_size=32, patch=8, hidden=128, heads=4, depth=2,
                        classes=10)
        imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        ref_model = ViT(cfg)
        params = ref_model.init(jax.random.PRNGKey(1), imgs)
        ref = ref_model.apply(params, imgs)
        sage = ViT(cfg, attn_fn=sage_dot_product_attention).apply(params, imgs)
        assert sage.shape == (2, 10)
        assert calc_diff(sage, ref) < 5e-3


class TestLayeredAttention:
    def test_per_layer_selection_and_skip(self):
        from sageattention_tpu.models import (DiTConfig, make_dit,
                                              example_inputs)
        from sageattention_tpu.models.integration import (
            layered_attention, sage_dot_product_attention)
        import jax
        import jax.numpy as jnp
        import numpy as np

        calls = []

        def probe_fn(layer):
            def fn(q, k, v, *a, **kw):
                calls.append(layer)
                return jax.nn.dot_product_attention(q, k, v)
            return fn

        sel = layered_attention(
            default_fn=probe_fn("default"),
            overrides={1: probe_fn("override")},
            skip_layers=(2,))
        cfg = DiTConfig(hidden=64, heads=2, depth=3, frames=1, height=8,
                        width=8, text_len=16, text_dim=64,
                        zero_init_gates=False)
        model = make_dit(cfg, attn_fn=sel)
        latents, text, t = example_inputs(cfg)
        params = model.init(jax.random.PRNGKey(0), latents, text, t)
        out = model.apply(params, latents, text, t)
        assert bool(jnp.all(jnp.isfinite(out)))
        # layer 0 default, layer 1 override, layer 2 skipped (exact jax.nn);
        # traced once for init and once for apply
        assert calls[:2] == ["default", "override"]
        assert set(calls) == {"default", "override"}

        # numerics: all-sage vs layered(all default) identical structure
        m2 = make_dit(cfg, attn_fn=layered_attention(
            default_fn=sage_dot_product_attention))
        out2 = m2.apply(params, latents, text, t)
        m3 = make_dit(cfg, attn_fn=sage_dot_product_attention)
        out3 = m3.apply(params, latents, text, t)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out3))


class TestRaggedJointAttention:
    """Mochi-style per-row padded-text stripping through the varlen path
    (reference craft: `example/modify_model/modify_mochi.py:76-93` loops
    over batch rows on host; here it is one static-shape segmented call)."""

    def _mk(self, B=2, T=64, V=256, H=4, D=64, n_valid=(64, 23)):
        from sageattention_tpu.models import sage_joint_attention_ragged
        S = T + V
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.float32)
                   for kk in ks)
        mask = jnp.asarray(np.array(
            [[i < n for i in range(T)] for n in n_valid]))
        return sage_joint_attention_ragged, q, k, v, mask, T, V

    def _oracle(self, q, k, v, mask, T, V):
        B = q.shape[0]
        valid = jnp.concatenate([mask, jnp.ones((B, V), bool)], axis=1)
        M = valid[:, None, :, None] & valid[:, None, None, :]
        ref = jax.nn.dot_product_attention(q, k, v, mask=M)
        return jnp.where(valid[:, :, None, None], ref, 0), valid

    def test_matches_dense_masked_oracle(self):
        fn, q, k, v, mask, T, V = self._mk()
        out = jax.jit(fn)(q, k, v, mask)
        ref, valid = self._oracle(q, k, v, mask, T, V)
        assert calc_diff(out, ref) < 1e-3
        # stripped positions are zeroed, like the reference's output pad
        assert bool(jnp.all(jnp.where(valid[:, :, None, None], True,
                                      out == 0)))

    def test_full_mask_matches_plain_varlen_free_case(self):
        # every text token valid -> plain joint attention, no stripping
        fn, q, k, v, _, T, V = self._mk(n_valid=(64, 64))
        mask = jnp.ones((2, T), bool)
        out = fn(q, k, v, mask)
        ref = jax.nn.dot_product_attention(q, k, v)
        assert calc_diff(out, ref) < 1e-3

    def test_inside_dit_block(self):
        """DiT-scale integration: the processor closes over the text mask
        and serves as the model's attn_fn (with a last-layer exact skip)."""
        from sageattention_tpu.models import (
            make_dit, example_inputs, layered_attention,
            sage_joint_attention_ragged)
        cfg = CFG
        latents, text, t = example_inputs(cfg)
        B = latents.shape[0]
        n_valid = [20]
        tmask = jnp.asarray(np.array(
            [[i < n for i in range(cfg.text_len)] for n in n_valid]))

        def ragged_fn(q, k, v, *a, **kw):
            return sage_joint_attention_ragged(q, k, v, tmask)

        def exact_masked(q, k, v, *a, **kw):
            valid = jnp.concatenate(
                [tmask, jnp.ones((B, cfg.video_tokens), bool)], axis=1)
            M = valid[:, None, :, None] & valid[:, None, None, :]
            out = jax.nn.dot_product_attention(q, k, v, mask=M)
            return jnp.where(valid[:, :, None, None], out, 0)

        sel = layered_attention(default_fn=ragged_fn,
                                skip_layers=(cfg.depth - 1,))
        model = make_dit(cfg, attn_fn=sel)
        params = model.init(jax.random.PRNGKey(0), latents, text, t)
        out = model.apply(params, latents, text, t)

        ref_model = make_dit(cfg, attn_fn=layered_attention(
            default_fn=exact_masked, skip_layers=(cfg.depth - 1,)))
        ref = ref_model.apply(params, latents, text, t)
        assert calc_diff(out, ref) < 2e-3
        assert bool(jnp.all(jnp.isfinite(out)))
