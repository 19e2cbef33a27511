"""Speculative multi-token decode: greedy equality with the plain path.

The commit rule makes the committed stream the *verify* sampler's stream
(draft quality only affects throughput), so greedy decoding must reproduce
the plain engine bit-for-bit at ANY draft depth — full-depth (alpha = 1,
every cycle commits M+1 tokens) and truncated (mismatches fall back to the
verify sample).  VERDICT r2 item 4.
"""
import dataclasses

import jax
import numpy as np
import pytest

from chatterbox_tpu.config import EngineConfig, T3ModelConfig
from chatterbox_tpu.models.t3.model import T3Model
from chatterbox_tpu.runtime.engine import Request, T3Engine

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup():
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tt = 2, 8
    spk = jax.random.normal(rng, (B, cfg.speaker_embed_size))
    ptoks = jax.random.randint(rng, (B, 6), 0, cfg.start_speech_token)
    emo = 0.5 * jnp.ones((B, 1))
    text = jax.random.randint(rng, (B, Tt), 0, cfg.text_vocab_size)
    tlen = jnp.array([5, 8], jnp.int32)
    params = jax.jit(lambda r: model.init(
        r, spk, ptoks, emo, text, tlen,
        method=lambda m, *a: m.init_all(*a)))(rng)
    eng = EngineConfig(max_batch_size=4, max_model_len=96, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=16,
                       kv_dtype="float32")
    return cfg, model, params, eng


def mk_req(cfg, rng, n_text, max_new=8, **kw):
    text = np.asarray(jax.random.randint(rng, (n_text,), 0,
                                         cfg.text_vocab_size))
    cond = np.asarray(jax.random.normal(rng, (cfg.cond_len, cfg.hidden_size)))
    return Request(text_ids=text.astype(np.int32), cond_emb=cond,
                   max_new_tokens=max_new, **kw)


def _greedy_reqs(cfg, n, seed=3):
    rngs = jax.random.split(jax.random.PRNGKey(seed), n)
    return [mk_req(cfg, rngs[i], n_text=4 + (i % 5), max_new=5 + (i % 7),
                   temperature=0.0, uid=i) for i in range(n)]


def _run(model, params, cfg, eng, reqs, seed=11):
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(seed))
    return [r.tokens for r in engine.generate(reqs)]


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_spec_full_depth_greedy_equals_plain(setup, kv_dtype):  # noqa: F811
    """alpha = 1: a full-depth self-draft always matches the verify argmax,
    so every cycle commits M+1 tokens and the stream is bit-identical."""
    cfg, model, params, eng = setup
    eng = dataclasses.replace(eng, kv_dtype=kv_dtype)
    reqs = _greedy_reqs(cfg, 6)
    plain = _run(model, params, cfg, eng, reqs)
    spec = _run(model, params, cfg,
                dataclasses.replace(eng, spec_decode=True,
                                    spec_draft_layers=cfg.n_layers,
                                    spec_tokens=2),
                reqs)
    for i, (a, b) in enumerate(zip(plain, spec)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")


def test_spec_truncated_draft_greedy_equals_plain(setup):  # noqa: F811
    """Truncated draft (k=1 of 2 layers): drafts mostly mismatch, but every
    committed token is still the verify sampler's greedy choice — stream
    identical, just fewer tokens per cycle."""
    cfg, model, params, eng = setup
    reqs = _greedy_reqs(cfg, 6, seed=4)
    plain = _run(model, params, cfg, eng, reqs)
    spec = _run(model, params, cfg,
                dataclasses.replace(eng, spec_decode=True,
                                    spec_draft_layers=1, spec_tokens=3),
                reqs)
    for i, (a, b) in enumerate(zip(plain, spec)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")


def test_spec_slot_churn_greedy_equals_plain(setup):  # noqa: F811
    """More requests than slots with varied caps: slot recycling under spec
    commits must stay consistent with the plain path."""
    cfg, model, params, eng = setup
    reqs = _greedy_reqs(cfg, 10, seed=6)
    plain = _run(model, params, cfg, eng, reqs)
    spec = _run(model, params, cfg,
                dataclasses.replace(eng, spec_decode=True,
                                    spec_draft_layers=cfg.n_layers,
                                    spec_tokens=2),
                reqs)
    for i, (a, b) in enumerate(zip(plain, spec)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")


def test_spec_sampled_valid_streams(setup):  # noqa: F811
    """temperature > 0: streams differ from plain (rng cadence) but must be
    valid ids, within caps, and deterministic given the engine seed."""
    cfg, model, params, eng = setup
    rngs = jax.random.split(jax.random.PRNGKey(8), 5)
    reqs = [mk_req(cfg, rngs[i], n_text=5, max_new=6 + i, temperature=0.8,
                   top_p=0.8, uid=i) for i in range(5)]
    eng_s = dataclasses.replace(eng, spec_decode=True, spec_draft_layers=1,
                                spec_tokens=2)
    out1 = _run(model, params, cfg, eng_s, reqs, seed=21)
    out2 = _run(model, params, cfg, eng_s, reqs, seed=21)
    for i, (a, b) in enumerate(zip(out1, out2)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")
        assert 1 <= len(a) <= reqs[i].max_new_tokens
        valid = (a < cfg.start_speech_token) | (a == cfg.stop_speech_token)
        assert valid.all()


@pytest.mark.parametrize("draft_layers", ["full", "truncated"])
def test_spec_composes_with_align_stop(draft_layers):
    """spec_decode x align_stop (VERDICT r3 item 8): the verify pass
    exposes per-fed-token alignment probabilities and the commit loop runs
    the same update/suppress/force logic per committed token, so the
    multilingual default (align_stop) composes with speculation — greedy
    streams bit-identical to the plain align_stop engine."""
    cfg = dataclasses.replace(T3ModelConfig.tiny(), align_enabled=True,
                              align_layer=1)
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.init(
        r, jax.random.normal(r, (1, cfg.speaker_embed_size)),
        jax.random.randint(r, (1, 6), 0, cfg.start_speech_token),
        0.5 * jnp.ones((1, 1)),
        jax.random.randint(r, (1, 8), 0, cfg.text_vocab_size),
        jnp.full((1,), 8, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    eng = EngineConfig(max_batch_size=4, max_model_len=96, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=24,
                       kv_dtype="int8", align_stop=True,
                       align_stall_patience=2, align_end_margin=100)
    reqs = _greedy_reqs(cfg, 5)
    plain = _run(model, params, cfg, eng, reqs)
    kd = cfg.n_layers if draft_layers == "full" else 1
    spec = _run(model, params, cfg,
                dataclasses.replace(eng, spec_decode=True,
                                    spec_draft_layers=kd, spec_tokens=2),
                reqs)
    for i, (a, b) in enumerate(zip(plain, spec)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")


def test_spec_int4_kv_valid_streams(setup):
    """int4 nibble-packed frozen cache through the verify path (unpack in
    _verify_packed): greedy spec streams must match the plain int4 engine
    bit-for-bit (same quantized cache, same verify-sampled commits)."""
    cfg, model, params, eng = setup
    eng4 = dataclasses.replace(eng, kv_dtype="int4")
    reqs = _greedy_reqs(cfg, 4, seed=9)
    plain = _run(model, params, cfg, eng4, reqs)
    spec = _run(model, params, cfg,
                dataclasses.replace(eng4, spec_decode=True,
                                    spec_draft_layers=cfg.n_layers,
                                    spec_tokens=2),
                reqs)
    for i, (a, b) in enumerate(zip(plain, spec)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")


def test_spec_with_compact_tail(setup):
    """spec_decode + compact_tail: the tail drain falls back to plain
    chunks on the compacted batch; greedy streams must still equal the
    plain+compact engine's."""
    cfg, model, params, eng = setup
    engc = dataclasses.replace(eng, compact_tail=True, compact_min=2)
    reqs = _greedy_reqs(cfg, 6, seed=12)
    plain = _run(model, params, cfg, engc, reqs)
    spec = _run(model, params, cfg,
                dataclasses.replace(engc, spec_decode=True,
                                    spec_draft_layers=cfg.n_layers,
                                    spec_tokens=2),
                reqs)
    for i, (a, b) in enumerate(zip(plain, spec)):
        np.testing.assert_array_equal(a, b, err_msg=f"request {i}")
