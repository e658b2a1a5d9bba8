"""LLM (Llama-style) model family with SageAttention — causal GQA + RoPE."""

import jax
import jax.numpy as jnp
import numpy as np

from sageattention_tpu.models.llm import LlamaConfig, LlamaLM
from sageattention_tpu.models import sage_dot_product_attention
from sageattention_tpu.utils.testing import calc_diff

CFG = LlamaConfig(hidden=128, heads=4, kv_heads=2, depth=2, vocab=256)


def test_llm_forward_parity():
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 384), 0, CFG.vocab)
    ref_model = LlamaLM(CFG)
    params = ref_model.init(jax.random.PRNGKey(1), tokens)
    ref = ref_model.apply(params, tokens)
    sage = LlamaLM(CFG, attn_fn=sage_dot_product_attention).apply(params, tokens)
    assert sage.shape == (2, 384, CFG.vocab)
    assert calc_diff(sage, ref) < 2e-3


def test_llm_loss_and_grads():
    tokens = jax.random.randint(jax.random.PRNGKey(2), (1, 256), 0, CFG.vocab)
    model = LlamaLM(CFG, attn_fn=sage_dot_product_attention)
    params = model.init(jax.random.PRNGKey(3), tokens)

    def loss(p):
        logits = model.apply(p, tokens)
        return -jnp.mean(jax.nn.log_softmax(logits)[..., 0])

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_llm_cached_decode_matches_full_forward():
    """Prefill-with-cache then token-by-token decode must reproduce the
    full no-cache forward's logits (int8 cache tolerance)."""
    S0, T = 120, 3
    tokens = jax.random.randint(jax.random.PRNGKey(4), (1, S0 + T), 0,
                                CFG.vocab)
    model = LlamaLM(CFG)
    params = model.init(jax.random.PRNGKey(5), tokens[:, :S0])
    full = model.apply(params, tokens)

    logits, caches = model.apply(params, tokens[:, :S0], max_len=256)
    assert calc_diff(logits, full[:, :S0]) < 1e-6  # prefill math unchanged
    for t in range(T):
        step, caches = model.apply(
            params, tokens[:, S0 + t: S0 + t + 1], caches=caches, pos=S0 + t)
        assert calc_diff(step[:, 0], full[:, S0 + t]) < 2e-3
    assert int(caches[0].length) == S0 + T


def _greedy_oracle(target, tp, prompt, steps, max_len):
    """Plain cached greedy decode with the target alone; returns the token
    list and per-step logits (for tie-gap inspection).  Uses the SAME
    jitted prefill/step functions the speculative loop uses, so the only
    numerics difference left is the T=gamma verify batching."""
    from sageattention_tpu.models.speculative import (_jitted_decode,
                                                      _jitted_prefill)

    logits, caches = _jitted_prefill(target, max_len)(tp, prompt)
    step = _jitted_decode(target)
    ref, ls = [int(jnp.argmax(logits[0, -1]))], [logits[0, -1]]
    for t in range(steps - 1):
        tok = jnp.asarray([[ref[-1]]], jnp.int32)
        logits, caches = step(tp, caches, tok, prompt.shape[1] + t)
        ref.append(int(jnp.argmax(logits[0, -1])))
        ls.append(logits[0, -1])
    return ref, ls


def test_speculative_matches_target_greedy():
    """Greedy speculative decoding emits the target model's own greedy
    continuation (the Leviathan guarantee, deterministic case) — exercises
    windowed verify decodes, O(1) trims, and draft catch-up appends.

    Floating-point caveat the guarantee inherits from EVERY speculative
    implementation: the T=gamma verify forward batches rows the oracle
    computes one at a time, so activations (and the KV codes they append)
    can differ in the last bf16 ulp; an untrained model's near-uniform
    logits then flip argmax on 1-ulp ties (observed top-2 gap 0.0156 at
    |logit|~2.3).  The assertion is therefore exact-or-provable-tie: every
    divergent position must be a near-tie of the ORACLE's own logits."""
    from sageattention_tpu.models.speculative import speculative_generate

    tgt_cfg = CFG
    dft_cfg = LlamaConfig(hidden=128, heads=2, kv_heads=2, depth=1,
                          vocab=CFG.vocab)
    target, draft = LlamaLM(tgt_cfg), LlamaLM(dft_cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(10), (1, 48), 0,
                                CFG.vocab)
    tp = target.init(jax.random.PRNGKey(11), prompt)
    dp = draft.init(jax.random.PRNGKey(12), prompt)

    steps = 10
    spec, rate = speculative_generate(target, tp, draft, dp, prompt, steps,
                                      gamma=3, max_len=96)
    ref, ref_logits = _greedy_oracle(target, tp, prompt, steps, 96)
    got = spec[0, prompt.shape[1]:].tolist()
    n_exact = sum(g == r for g, r in zip(got, ref))
    for g, r, l in zip(got, ref, ref_logits):
        if g != r:   # must be an argmax tie within bf16 noise, not a bug
            l = l.astype(jnp.float32)
            assert float(l[r] - l[g]) < 0.05, (got, ref)
    assert n_exact >= steps - 2, (got, ref)   # ties are rare by construction
    assert 0.0 <= rate <= 1.0


def test_speculative_gamma1_bit_identical():
    """gamma=1 degenerates the loop to plain T=1 cached greedy decode —
    shape-stable forwards, so the output must be BIT-identical to the
    target-alone oracle (no tie tolerance): pins appends, zero-trims, and
    the correction/bonus bookkeeping."""
    from sageattention_tpu.models.speculative import speculative_generate

    dft_cfg = LlamaConfig(hidden=128, heads=2, kv_heads=2, depth=1,
                          vocab=CFG.vocab)
    target, draft = LlamaLM(CFG), LlamaLM(dft_cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(10), (1, 48), 0,
                                CFG.vocab)
    tp = target.init(jax.random.PRNGKey(11), prompt)
    dp = draft.init(jax.random.PRNGKey(12), prompt)

    steps = 8
    spec, rate = speculative_generate(target, tp, draft, dp, prompt, steps,
                                      gamma=1, max_len=96)
    ref, _ = _greedy_oracle(target, tp, prompt, steps, 96)
    assert spec[0, prompt.shape[1]:].tolist() == ref
    assert rate == 0.0   # nothing drafted


def test_speculative_accept_rule_is_exact():
    """The speculative-sampling theorem, checked against THIS
    implementation's accept/resample quantities: for any (p, q) pair the
    analytic single-step output marginal ``q·min(1,p/q) +
    P(reject)·residual`` must equal p identically — enumerated, no
    sampling noise."""
    from sageattention_tpu.models.speculative import (
        acceptance_distribution, residual_distribution)

    rng = np.random.RandomState(0)
    for conc in (0.2, 1.0, 5.0):
        for _ in range(10):
            p = rng.dirichlet(np.full(17, conc))
            q = rng.dirichlet(np.full(17, conc))
            np.testing.assert_allclose(acceptance_distribution(p, q), p,
                                       atol=1e-12)
    # corners: disjoint supports (always reject), q == p (always accept)
    p = np.array([0.5, 0.5, 0.0])
    q = np.array([0.0, 0.0, 1.0])
    np.testing.assert_allclose(acceptance_distribution(p, q), p, atol=1e-12)
    np.testing.assert_allclose(acceptance_distribution(p, p), p, atol=1e-12)
    # residual of identical dists falls back to p (unreachable branch)
    np.testing.assert_allclose(residual_distribution(p, p), p, atol=1e-12)


def test_speculative_stochastic_temp0_matches_greedy():
    """temperature -> 0 collapses both tempered softmaxes to argmax
    one-hots, under which the stochastic accept rule degenerates to the
    greedy rule — the stochastic path must then emit the greedy sequence
    bit-exactly (pins the accept loop, residual resample, bonus token,
    and cache rollbacks against the proven greedy path)."""
    from sageattention_tpu.models.speculative import (
        SpecSampler, speculative_generate)

    dft_cfg = LlamaConfig(hidden=128, heads=2, kv_heads=2, depth=1,
                          vocab=CFG.vocab)
    target, draft = LlamaLM(CFG), LlamaLM(dft_cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(30), (1, 48), 0,
                                CFG.vocab)
    tp = target.init(jax.random.PRNGKey(31), prompt)
    dp = draft.init(jax.random.PRNGKey(32), prompt)

    g, _ = speculative_generate(target, tp, draft, dp, prompt, 8,
                                gamma=3, max_len=96)
    s, rate = speculative_generate(
        target, tp, draft, dp, prompt, 8, gamma=3, max_len=96,
        sampler=SpecSampler(key=jax.random.PRNGKey(33), temperature=1e-6))
    assert s[0].tolist() == g[0].tolist()
    assert 0.0 <= rate <= 1.0


def test_speculative_stochastic_matches_target_distribution():
    """Distribution-level exactness, end to end: the marginal of the 2nd
    generated token (the first token produced THROUGH a speculative
    round) over many seeded runs must match the analytic target-alone
    marginal sum_x p0(x)·p1(tok|x)."""
    from sageattention_tpu.models.speculative import (
        SpecSampler, speculative_generate)

    V, TEMP, N = 12, 1.0, 300
    cfg = LlamaConfig(hidden=64, heads=2, kv_heads=2, depth=1, vocab=V)
    target = LlamaLM(cfg)
    draft = LlamaLM(LlamaConfig(hidden=32, heads=2, kv_heads=2, depth=1,
                                vocab=V))
    prompt = jax.random.randint(jax.random.PRNGKey(40), (1, 32), 0, V)
    tp = target.init(jax.random.PRNGKey(41), prompt)
    dp = draft.init(jax.random.PRNGKey(42), prompt)

    # analytic target marginal of token index 1
    p0 = np.asarray(jax.nn.softmax(
        target.apply(tp, prompt)[0, -1].astype(jnp.float32) / TEMP))
    marg = np.zeros(V)
    for x in range(V):
        seq = jnp.concatenate(
            [prompt, jnp.asarray([[x]], prompt.dtype)], axis=1)
        p1 = np.asarray(jax.nn.softmax(
            target.apply(tp, seq)[0, -1].astype(jnp.float32) / TEMP))
        marg += p0[x] * p1

    counts = np.zeros(V)
    keys = jax.random.split(jax.random.PRNGKey(43), N)
    for i in range(N):
        toks, _ = speculative_generate(
            target, tp, draft, dp, prompt, 2, gamma=3, max_len=64,
            sampler=SpecSampler(key=keys[i], temperature=TEMP))
        counts[int(toks[0, prompt.shape[1] + 1])] += 1
    tv = 0.5 * np.abs(counts / N - marg).sum()
    assert tv < 0.15, (tv, counts / N, marg)


def test_llm_paged_ragged_decode():
    """Continuous-batching through the MODEL: ragged paged prefill (two
    sequences, different lengths, one page table for all layers), then
    per-sequence-position decode (pos=None) — each slot's logits must
    match its own single-sequence no-cache forward."""
    from sageattention_tpu.paged import PageAllocator, build_table

    PAGE = 256
    lengths = [256, 192]
    T = 2
    tokens = jax.random.randint(jax.random.PRNGKey(8), (2, PAGE + T), 0,
                                CFG.vocab)
    model = LlamaLM(CFG)
    params = model.init(jax.random.PRNGKey(9), tokens[:, :PAGE])

    alloc = PageAllocator(8, PAGE)
    table = build_table([alloc.reserve(2), alloc.reserve(2)], max_pages=2)
    spec = dict(num_pages=8, page_table=table,
                lengths=jnp.asarray(lengths, jnp.int32))
    logits, caches = model.apply(params, tokens[:, :PAGE], paged_spec=spec)

    cur = list(lengths)
    for t in range(T):
        step_tok = jnp.stack([tokens[b, cur[b]] for b in range(2)])[:, None]
        step, caches = model.apply(params, step_tok, caches=caches, pos=None)
        cur = [c + 1 for c in cur]
        for b in range(2):
            full = model.apply(params, tokens[b:b + 1, :cur[b]])
            assert calc_diff(step[b, 0], full[0, -1]) < 3e-3, (t, b)
    assert [int(x) for x in caches[0].lengths] == cur


def test_llm_sliding_window_paged_decode():
    """A sliding-window model (Mistral-style): paged prefill + windowed
    decode must match the no-cache forward, whose prefill attention uses
    jax.nn's local_window_size as the exact oracle."""
    from sageattention_tpu.paged import PageAllocator, build_table

    W, PAGE, T = 128, 256, 2
    cfg = LlamaConfig(hidden=256, heads=4, kv_heads=2, depth=2,
                      vocab=CFG.vocab, sliding_window=W)
    tokens = jax.random.randint(jax.random.PRNGKey(13), (1, PAGE + T), 0,
                                cfg.vocab)
    model = LlamaLM(cfg)
    params = model.init(jax.random.PRNGKey(14), tokens[:, :PAGE])

    alloc = PageAllocator(8, PAGE)
    table = build_table([alloc.reserve(2)], max_pages=2)
    spec = dict(num_pages=8, page_table=table,
                lengths=jnp.asarray([PAGE], jnp.int32))
    logits, caches = model.apply(params, tokens[:, :PAGE], paged_spec=spec)
    full = model.apply(params, tokens[:, :PAGE])
    assert calc_diff(logits, full) < 1e-6  # prefill math unchanged

    for t in range(T):
        cur = PAGE + t
        step, caches = model.apply(params, tokens[:, cur:cur + 1],
                                   caches=caches, pos=cur)
        oracle = model.apply(params, tokens[:, :cur + 1])
        assert calc_diff(step[:, 0], oracle[:, -1]) < 3e-3, t


def test_llm_cached_decode_multi_token():
    """A T>1 decode window (chunked prefill continuation) matches the full
    forward for every position in the window."""
    S0, T = 100, 4
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, S0 + T), 0,
                                CFG.vocab)
    model = LlamaLM(CFG)
    params = model.init(jax.random.PRNGKey(7), tokens[:, :S0])
    full = model.apply(params, tokens)
    _, caches = model.apply(params, tokens[:, :S0], max_len=256)
    step, caches = model.apply(params, tokens[:, S0:], caches=caches, pos=S0)
    assert calc_diff(step, full[:, S0:]) < 2e-3


def test_llm_attention_sinks_paged_decode():
    """StreamingLLM end-to-end: windowed model with sinks — paged decode
    (sink pages ride the shifted table) must match the no-cache forward
    whose prefill runs the sage band+sinks kernel.  Kernel-vs-oracle
    correctness is tests/test_sliding_window.py; this pins the MODEL
    wiring (config -> prefill kwarg -> decode page stream).  The decode
    oracle is an EXACT banded+sink attention (masked jax.nn) so the bar
    measures one quantized path, not two compounding ones."""
    import pytest
    from sageattention_tpu.paged import PageAllocator, build_table

    W, SINKS, PAGE, T = 128, 16, 256, 2
    cfg = LlamaConfig(hidden=256, heads=4, kv_heads=2, depth=2,
                      vocab=CFG.vocab, sliding_window=W,
                      attention_sinks=SINKS)
    tokens = jax.random.randint(jax.random.PRNGKey(21), (1, PAGE + T), 0,
                                cfg.vocab)
    model = LlamaLM(cfg, attn_fn=sage_dot_product_attention)
    params = model.init(jax.random.PRNGKey(22), tokens[:, :PAGE])

    def exact_sink_attn(q, k, v, is_causal=False, local_window_size=None,
                        attention_sinks=0, **kw):
        S = q.shape[1]
        rows = jnp.arange(S)[:, None]
        cols = jnp.arange(S)[None, :]
        Wn = local_window_size[0] + 1
        m = (cols <= rows) & ((cols >= rows - (Wn - 1))
                              | (cols < attention_sinks))
        return jax.nn.dot_product_attention(q, k, v, mask=m[None, None])

    oracle_model = LlamaLM(cfg, attn_fn=exact_sink_attn)

    # jax.nn's prefill cannot express sinks: loud, not silently un-sunk
    with pytest.raises(ValueError, match="attention_sinks"):
        LlamaLM(cfg).apply(params, tokens[:, :PAGE])

    alloc = PageAllocator(8, PAGE)
    table = build_table([alloc.reserve(2)], max_pages=2)
    spec = dict(num_pages=8, page_table=table,
                lengths=jnp.asarray([PAGE], jnp.int32))
    logits, caches = model.apply(params, tokens[:, :PAGE], paged_spec=spec)
    full = model.apply(params, tokens[:, :PAGE])
    assert calc_diff(logits, full) < 1e-6  # prefill math unchanged
    exact = oracle_model.apply(params, tokens[:, :PAGE])
    assert calc_diff(logits, exact) < 3e-3  # sage band+sinks vs exact

    for t in range(T):
        cur = PAGE + t
        step, caches = model.apply(params, tokens[:, cur:cur + 1],
                                   caches=caches, pos=cur)
        oracle = oracle_model.apply(params, tokens[:, :cur + 1])
        assert calc_diff(step[:, 0], oracle[:, -1]) < 3e-3, t
