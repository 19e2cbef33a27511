"""INT8 weight-only quantization tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_tpu.config import T3ModelConfig
from chatterbox_tpu.models.t3.model import T3Model
from chatterbox_tpu.ops.quant import quantize_kernel, quantize_t3_params


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    w_q, scale = quantize_kernel(w)
    back = w_q.astype(np.float32) * scale[None, :]
    assert np.abs(back - w).max() < np.abs(w).max() / 100


def test_quantized_t3_matches_fp32_closely():
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tt = 2, 6
    init = lambda r: model.init(
        r, jnp.zeros((B, cfg.speaker_embed_size)),
        jnp.zeros((B, 4), jnp.int32), 0.5 * jnp.ones((B, 1)),
        jnp.zeros((B, Tt), jnp.int32), jnp.full((B,), Tt, jnp.int32),
        method=lambda m, *a: m.init_all(*a))
    params = jax.jit(init)(rng)

    qcfg = dataclasses.replace(cfg, quant_weights=True)
    qmodel = T3Model(qcfg)
    qparams = quantize_t3_params(params)

    cond = jax.random.normal(rng, (B, cfg.cond_len, cfg.hidden_size))
    text = jax.random.randint(rng, (B, Tt), 0, cfg.text_vocab_size)
    tlen = jnp.full((B,), Tt, jnp.int32)
    cfgs = jnp.full((B,), 0.5)

    def prefill(m, p):
        embeds, plen = m.build_prompt_embeds(cond, text, tlen)
        return m.prefill(embeds, plen, cfgs)[0]

    ref = jax.jit(lambda p: model.apply(p, method=lambda m: prefill(m, p)))(params)
    out = jax.jit(lambda p: qmodel.apply(p, method=lambda m: prefill(m, p)))(qparams)
    # int8 trunk: logits close but not identical
    corr = np.corrcoef(np.asarray(ref).ravel(), np.asarray(out).ravel())[0, 1]
    assert corr > 0.999, corr
    assert np.argmax(np.asarray(ref), -1).tolist() == \
        np.argmax(np.asarray(out), -1).tolist()


def test_int8_kv_engine_runs():
    from chatterbox_tpu.config import EngineConfig
    from chatterbox_tpu.runtime.engine import Request, T3Engine
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    eng = EngineConfig(max_batch_size=2, max_model_len=96, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=16,
                       kv_dtype="int8")
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(7))
    rs = np.random.default_rng(0)
    reqs = [Request(
        text_ids=rs.integers(0, cfg.text_vocab_size, size=6).astype(np.int32),
        cond_emb=rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size)).astype(np.float32),
        max_new_tokens=8, temperature=0.0, uid=i) for i in range(3)]
    results = engine.generate(reqs)
    assert len(results) == 3
    for r in results:
        assert 1 <= len(r.tokens) <= 8
        valid = (r.tokens < cfg.start_speech_token) | \
            (r.tokens == cfg.stop_speech_token)
        assert valid.all()
