"""Speculative decoding on the int8 KV cache — greedy and stochastic.

A small draft model proposes ``gamma-1`` tokens autoregressively; the
target model scores the whole window in ONE ``T=gamma`` cached decode
(`decode.sageattn_decode` windows are exactly the verify kernel), accepts
a prefix, emits its own correction/bonus token, and rolls the caches
back over rejected tokens with the O(1) `kv_cache_trim`.

Two acceptance rules (Leviathan et al. 2023):

- **greedy** (``sampler=None``): accept while the draft token equals the
  target argmax.  Output is the target model's own greedy continuation —
  bit-identical when the target's forwards are shape-stable (gamma=1,
  asserted exactly by `tests/test_llm.py`); at gamma>1 the T=gamma verify
  forward batches rows the plain decode computes one at a time, so
  activations can differ in the last bf16 ulp and near-tie argmaxes may
  flip (inherent to every speculative implementation; the test asserts
  exact-or-provable-tie).
- **stochastic** (``sampler=SpecSampler(...)``): accept draft token x_i
  with probability ``min(1, p_i(x_i)/q_i(x_i))`` (p = target, q = draft,
  both after temperature); on the first rejection sample the correction
  from the residual ``norm(max(p_i - q_i, 0))``; if every proposal is
  accepted sample the bonus token from ``p_gamma``.  The emitted sequence
  is distributed EXACTLY as target-alone sampling — the speculative
  sampling theorem, verified analytically (enumerated marginals of
  :func:`acceptance_distribution`) and statistically in
  `tests/test_llm.py`.

Beyond the reference's scope (prefill-only); this is where the decode
stack's pieces (windowed causal decode, append, trim) compose into a
serving feature.

Cache invariant between rounds: the target cache holds every generated
token EXCEPT the newest one; the next verify window leads with that token,
so appends stay contiguous and no logit is computed twice.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import decode as dec


@functools.cache
def _jitted_decode(model):
    """Cached-per-model jitted cached-decode step (flax Modules are frozen
    dataclasses, so they key an lru cache; re-creating the jit closure per
    generate call would recompile every time — the distribution property
    test runs hundreds of short generations)."""

    @jax.jit
    def step(params, caches, tok, pos):
        logits, caches = model.apply(params, tok, caches=caches, pos=pos)
        return logits, caches

    return step


@functools.cache
def _jitted_prefill(model, max_len):
    @jax.jit
    def prefill(params, prompt):
        return model.apply(params, prompt, max_len=max_len)

    return prefill


class SpecSampler(NamedTuple):
    """Stochastic acceptance config: temperature applies to BOTH models
    (exactness holds for any tempered pair)."""

    key: jax.Array
    temperature: float = 1.0


def _probs(logits, temperature):
    """Tempered softmax in float32 (host-visible numpy for the accept loop)."""
    t = max(float(temperature), 1e-6)
    return np.asarray(jax.nn.softmax(logits.astype(jnp.float32) / t, axis=-1))


def _sample(probs: np.ndarray, key) -> int:
    """Draw one token from a host probability vector with a jax key (keeps
    the whole generation stream reproducible from one PRNGKey)."""
    u = float(jax.random.uniform(key))
    return int(np.searchsorted(np.cumsum(probs), u * probs.sum()))


def residual_distribution(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """norm(max(p - q, 0)) — the rejection-correction distribution.  If the
    residual has no mass (p == q), fall back to p (accept prob was 1
    everywhere, so this branch is unreachable in exact arithmetic)."""
    r = np.maximum(p - q, 0.0)
    s = r.sum()
    return r / s if s > 0 else p / p.sum()


def acceptance_distribution(p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """The analytic single-step output marginal of accept/resample:
    ``P(y) = q(y)·min(1, p(y)/q(y)) + P(reject)·residual(y)``.
    The speculative-sampling theorem says this equals ``p`` — used by the
    exactness unit test to pin THIS implementation's accept rule."""
    accept = np.minimum(q, p)                     # q(y)·min(1, p(y)/q(y))
    p_rej = 1.0 - accept.sum()
    return accept + max(p_rej, 0.0) * residual_distribution(p, q)


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
    sampler: Optional[SpecSampler] = None,
):
    """Generate ``steps`` tokens; returns ([1, S0+steps] tokens,
    acceptance_rate).  ``gamma``: verify-window size (gamma-1 draft
    proposals per round).  ``sampler=None`` is greedy (the target's own
    argmax continuation, up to ulp-tie flips from the batched verify —
    module docstring); a :class:`SpecSampler` runs exact stochastic
    speculative sampling at its temperature."""
    assert prompt.shape[0] == 1, "speculative loop is per-sequence"
    S0 = prompt.shape[1]
    max_len = max_len or (S0 + steps + gamma + 8)
    greedy_mode = sampler is None
    key = None if greedy_mode else sampler.key
    temp = 1.0 if greedy_mode else sampler.temperature

    def next_key():
        nonlocal key
        key, k = jax.random.split(key)
        return k

    t_logits, t_caches = _jitted_prefill(target_model, max_len)(
        target_params, prompt)
    _, d_caches = _jitted_prefill(draft_model, max_len)(draft_params, prompt)

    _d_step = _jitted_decode(draft_model)
    _t_step = _jitted_decode(target_model)

    def draft_step(params, caches, tok, pos):
        logits, caches = _d_step(params, caches, tok, pos)
        return logits[:, -1], caches

    def verify_step(params, caches, window, pos):
        logits, caches = _t_step(params, caches, window, pos)
        return logits[0], caches       # [gamma, V]

    # newest token: NOT in caches
    if greedy_mode:
        out = [int(jnp.argmax(t_logits[0, -1]))]
    else:
        out = [_sample(_probs(t_logits[0, -1], temp), next_key())]
    drafted = accepted = 0
    while len(out) < steps:
        n_ctx = S0 + len(out) - 1              # tokens the caches hold
        # --- draft proposes gamma-1 tokens, starting from the newest ---
        props, q_dists = [], []
        tok = jnp.asarray([[out[-1]]], jnp.int32)
        for g in range(gamma - 1):
            logits, d_caches = draft_step(draft_params, d_caches, tok,
                                          n_ctx + g)
            if greedy_mode:
                nxt = int(jnp.argmax(logits[0]))
            else:
                qp = _probs(logits[0], temp)
                q_dists.append(qp)
                nxt = _sample(qp, next_key())
            props.append(nxt)
            tok = jnp.asarray([[nxt]], jnp.int32)
        # --- one windowed target decode scores newest + proposals ---
        window = jnp.asarray([[out[-1]] + props], jnp.int32)
        t_win, t_caches = verify_step(target_params, t_caches, window,
                                      n_ctx)
        if greedy_mode:
            greedy = [int(x) for x in jnp.argmax(t_win, axis=-1)]
            n_acc = 0
            while n_acc < gamma - 1 and props[n_acc] == greedy[n_acc]:
                n_acc += 1
            emitted = props[:n_acc] + [greedy[n_acc]]
        else:
            p_dists = _probs(t_win, temp)       # [gamma, V]
            n_acc = 0
            correction = None
            while n_acc < gamma - 1:
                x = props[n_acc]
                p_x = p_dists[n_acc][x]
                q_x = q_dists[n_acc][x]
                u = float(jax.random.uniform(next_key()))
                if q_x > 0 and u < min(1.0, p_x / q_x):
                    n_acc += 1
                    continue
                correction = _sample(
                    residual_distribution(p_dists[n_acc], q_dists[n_acc]),
                    next_key())
                break
            if correction is None:               # all accepted: bonus token
                correction = _sample(p_dists[gamma - 1], next_key())
            emitted = props[:n_acc] + [correction]
        drafted += gamma - 1
        accepted += n_acc
        out.extend(emitted)
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
