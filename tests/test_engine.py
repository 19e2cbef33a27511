"""Engine integration tests on a tiny T3: continuous batching, stop handling,
determinism, per-request cfg_scale."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.config import T3ModelConfig, EngineConfig
from chatterbox_tpu.models.t3.model import T3Model
from chatterbox_tpu.runtime.engine import Request, T3Engine


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
        r, spk, ptoks, emo, text, tlen, method=lambda m, *a: m.init_all(*a)))(rng)
    eng = EngineConfig(max_batch_size=4, max_model_len=96, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=16,
                       kv_dtype="float32")
    return cfg, model, params, eng


def mk_req(cfg, rng, n_text, max_new=8, **kw):
    text = np.asarray(jax.random.randint(rng, (n_text,), 0, cfg.text_vocab_size))
    cond = np.asarray(jax.random.normal(rng, (cfg.cond_len, cfg.hidden_size)))
    return Request(text_ids=text.astype(np.int32), cond_emb=cond,
                   max_new_tokens=max_new, **kw)


def test_generate_batch(setup):
    cfg, model, params, eng = setup
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(7))
    rngs = jax.random.split(jax.random.PRNGKey(1), 6)
    reqs = [mk_req(cfg, rngs[i], n_text=4 + i, max_new=6 + i) for i in range(6)]
    results = engine.generate(reqs)
    assert len(results) == 6
    for i, r in enumerate(results):
        assert 1 <= len(r.tokens) <= reqs[i].max_new_tokens
        valid = (r.tokens < cfg.start_speech_token) | \
                (r.tokens == cfg.stop_speech_token)
        assert valid.all(), r.tokens


def test_deterministic_greedy(setup):
    cfg, model, params, eng = setup
    out = []
    for trial in range(2):
        engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(trial))
        reqs = [mk_req(cfg, jax.random.PRNGKey(5), n_text=6, max_new=8,
                       temperature=0.0)]
        out.append(engine.generate(reqs)[0].tokens)
    np.testing.assert_array_equal(out[0], out[1])


def test_continuous_refill(setup):
    """More requests than slots: slots must be reused."""
    cfg, model, params, eng = setup
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(9))
    rngs = jax.random.split(jax.random.PRNGKey(2), 10)
    reqs = [mk_req(cfg, rngs[i], n_text=4, max_new=4 + (i % 5)) for i in range(10)]
    results = engine.generate(reqs)
    assert len(results) == 10
    assert all(len(r.tokens) >= 1 for r in results)


def test_per_request_cfg_scale(setup):
    """Different cfg_scale must change greedy outputs (given random weights)."""
    cfg, model, params, eng = setup
    outs = []
    for scale in (0.0, 5.0):
        engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(3))
        reqs = [mk_req(cfg, jax.random.PRNGKey(4), n_text=6, max_new=8,
                       temperature=0.0, cfg_scale=scale)]
        outs.append(engine.generate(reqs)[0].tokens)
    assert not np.array_equal(outs[0], outs[1])
