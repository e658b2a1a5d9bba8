"""Greedy speculative decoding on the int8 KV cache.

A small draft model proposes ``gamma-1`` tokens autoregressively; the
target model scores the whole window in ONE ``T=gamma`` cached decode
(`decode.sageattn_decode` windows are exactly the verify kernel), accepts
the matching prefix, emits its own correction token, and rolls the caches
back over rejected tokens with the O(1) `kv_cache_trim`.

Greedy acceptance makes the output *bit-identical* to the target model
decoding alone (the classic speculative-decoding guarantee, Leviathan et
al. 2023 — deterministic case) — asserted by `tests/test_llm.py`.  Beyond
the reference's scope (prefill-only); this is where the decode stack's
pieces (windowed causal decode, append, trim) compose into a serving
feature.

Cache invariant between rounds: the target cache holds every generated
token EXCEPT the newest one; the next verify window leads with that token,
so appends stay contiguous and no logit is computed twice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import decode as dec


def speculative_generate(
    target_model,
    target_params,
    draft_model,
    draft_params,
    prompt,            # [1, S0] int32
    steps: int,
    *,
    gamma: int = 4,
    max_len: int = 0,
):
    """Greedy-generate ``steps`` tokens; returns ([1, S0+steps] tokens,
    acceptance_rate).  ``gamma``: verify-window size (gamma-1 draft
    proposals per round)."""
    assert prompt.shape[0] == 1, "speculative loop is per-sequence"
    S0 = prompt.shape[1]
    max_len = max_len or (S0 + steps + gamma + 8)

    t_logits, t_caches = target_model.apply(target_params, prompt,
                                            max_len=max_len)
    _, d_caches = draft_model.apply(draft_params, prompt, max_len=max_len)

    @jax.jit
    def draft_step(params, caches, tok, pos):
        logits, caches = draft_model.apply(params, tok, caches=caches,
                                           pos=pos)
        return jnp.argmax(logits[:, -1], axis=-1), caches

    @jax.jit
    def verify_step(params, caches, window, pos):
        logits, caches = target_model.apply(params, window, caches=caches,
                                            pos=pos)
        return jnp.argmax(logits[0], axis=-1), caches  # [gamma]

    out = [int(jnp.argmax(t_logits[0, -1]))]   # newest token: NOT in caches
    drafted = accepted = 0
    while len(out) < steps:
        n_ctx = S0 + len(out) - 1              # tokens the caches hold
        # --- draft proposes gamma-1 tokens, starting from the newest ---
        props = []
        tok = jnp.asarray([[out[-1]]], jnp.int32)
        for g in range(gamma - 1):
            nxt, d_caches = draft_step(draft_params, d_caches, tok,
                                       n_ctx + g)
            props.append(int(nxt[0]))
            tok = nxt[:, None].astype(jnp.int32)
        # --- one windowed target decode scores newest + proposals ---
        window = jnp.asarray([[out[-1]] + props], jnp.int32)
        greedy, t_caches = verify_step(target_params, t_caches, window,
                                       n_ctx)
        greedy = [int(x) for x in greedy]       # target's token after W[:i+1]
        n_acc = 0
        while n_acc < gamma - 1 and props[n_acc] == greedy[n_acc]:
            n_acc += 1
        drafted += gamma - 1
        accepted += n_acc
        # accepted drafts + the target's own next token (correction/bonus)
        out.extend(props[:n_acc] + [greedy[n_acc]])
        # roll back rejected tokens; restore the cache invariant (newest
        # generated token stays outside the caches)
        t_caches = tuple(dec.kv_cache_trim(c, gamma - 1 - n_acc)
                         for c in t_caches)
        d_over = max(0, int(d_caches[0].length) - (S0 + len(out) - 1))
        d_caches = tuple(dec.kv_cache_trim(c, d_over) for c in d_caches)
        # the draft cache may be SHORT of the invariant (rejection beyond
        # its proposals): catch it up token by token
        behind = (S0 + len(out) - 1) - int(d_caches[0].length)
        for i in range(behind):
            pos = int(d_caches[0].length)
            tok = jnp.asarray([[out[pos - S0]]], jnp.int32)
            _, d_caches = draft_step(draft_params, d_caches, tok, pos)

    tokens = jnp.concatenate(
        [prompt, jnp.asarray(out[:steps], jnp.int32)[None]], axis=1)
    return tokens, accepted / max(drafted, 1)
