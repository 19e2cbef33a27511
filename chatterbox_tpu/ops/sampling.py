"""On-device batched token sampler.

TPU-native replacement for vLLM's CUDA sampling kernels (reference relies on
vLLM SamplingParams: tts.py:408-418 — temperature, top_p, min_p,
repetition_penalty, stop_token_ids).  Everything runs vectorized on device
inside the jitted decode chunk; no host round-trips per step.

Repetition penalty note: vLLM penalizes both prompt and output token ids; in
the reference's offset scheme the prompt ids are *text* tokens that alias
speech ids, so the penalty there leaks across vocabularies.  Here the penalty
is applied over generated speech tokens plus (optionally) the conditioning
prompt speech tokens — same intent, correct vocabulary.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    """Per-slot sampling parameters, all [B] float32 arrays."""
    temperature: jnp.ndarray
    top_p: jnp.ndarray
    min_p: jnp.ndarray
    repetition_penalty: jnp.ndarray

    @classmethod
    def full(cls, batch: int, temperature=0.8, top_p=1.0, min_p=0.05,
             repetition_penalty=2.0):
        f = lambda v: jnp.full((batch,), v, jnp.float32)
        return cls(f(temperature), f(top_p), f(min_p), f(repetition_penalty))


class SamplerState(NamedTuple):
    """Per-slot sampler state carried across decode steps."""
    seen: jnp.ndarray       # [B, V] bool — token ids already generated
    rng: jnp.ndarray        # jax PRNG key

    @classmethod
    def init(cls, batch: int, vocab: int, rng):
        return cls(seen=jnp.zeros((batch, vocab), jnp.bool_), rng=rng)


def apply_repetition_penalty(logits, seen, penalty):
    """HF/vLLM-style: seen tokens with positive logits are divided by the
    penalty, negative ones multiplied."""
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, penalized, logits)


def top_p_min_p_mask(logits, top_p, min_p, iters: int = 24):
    """Return -inf-masked logits implementing nucleus + min-p filtering.

    Keeps the smallest prefix of the descending-probability ordering whose
    cumulative mass reaches top_p, then drops tokens whose probability is
    below min_p * max_prob (vLLM semantics).

    Sort-free: the nucleus is {p >= tau} for the largest tau with
    mass({p >= tau}) >= top_p; tau is found by bisection (``iters`` halvings
    of [0, max_prob] -> tau resolved to max_prob / 2^24).  The full
    f32[B, 8194] sort this replaces measured ~0.5 ms/step at B=48 on v5e
    (~3% of decode); the bisection is ~30 us of compare+sum passes."""
    probs = jax.nn.softmax(logits, axis=-1)
    max_prob = jnp.max(probs, axis=-1, keepdims=True)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0), axis=-1,
                       keepdims=True)
        ok = mass >= top_p[:, None]
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros_like(max_prob), max_prob))
    keep = probs >= lo
    keep &= probs >= (min_p[:, None] * max_prob)
    return jnp.where(keep, logits, -jnp.inf)


def min_p_mask(logits, min_p):
    """min-p filtering only — no sort.  Used when every live request has
    top_p == 1 (the engine passes needs_top_p=False statically): the full
    8194-way sort is the single most expensive sampling op (~0.5 ms/step at
    B=48 on v5e)."""
    probs = jax.nn.softmax(logits, axis=-1)
    max_prob = jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= (min_p[:, None] * max_prob)
    return jnp.where(keep, logits, -jnp.inf)


def sample_step(logits, params: SamplingParams, state: SamplerState,
                needs_top_p: bool = True):
    """Sample one token per slot; returns (tokens [B] int32, new_state).

    temperature == 0 selects greedy argmax (reference deterministic mode,
    tts.py:358-362).  needs_top_p is static: False skips the nucleus sort.
    """
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, state.seen, params.repetition_penalty)

    greedy = params.temperature <= 0.0
    safe_temp = jnp.where(greedy, 1.0, params.temperature)
    scaled = logits / safe_temp[:, None]
    if needs_top_p:
        filtered = top_p_min_p_mask(scaled, params.top_p, params.min_p)
    else:
        filtered = min_p_mask(scaled, params.min_p)

    rng, sub = jax.random.split(state.rng)
    gumbel = jax.random.gumbel(sub, filtered.shape, jnp.float32)
    sampled = jnp.argmax(filtered + gumbel, axis=-1)
    argmax = jnp.argmax(logits, axis=-1)
    tokens = jnp.where(greedy, argmax, sampled).astype(jnp.int32)

    seen = state.seen.at[jnp.arange(tokens.shape[0]), tokens].set(True)
    return tokens, SamplerState(seen=seen, rng=rng)


def mark_seen(state: SamplerState, token_ids: jnp.ndarray, valid: jnp.ndarray) -> SamplerState:
    """Pre-mark tokens (e.g. conditioning prompt tokens) as seen for the
    repetition penalty.  token_ids: [B, T]; valid: [B, T] bool."""
    B, V = state.seen.shape
    one_hot = jax.nn.one_hot(token_ids, V, dtype=jnp.bool_) & valid[..., None]
    seen = state.seen | jnp.any(one_hot, axis=1)
    return state._replace(seen=seen)
