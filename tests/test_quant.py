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


def test_int4_pack_roundtrip():
    from chatterbox_tpu.models.t3.backbone import (pack_int4, quantize_kv,
                                                   unpack_int4)
    rng = np.random.default_rng(1)
    q = rng.integers(-7, 8, size=(3, 5, 16)).astype(np.int8)
    back = np.asarray(unpack_int4(pack_int4(jnp.asarray(q))))
    assert (back == q).all()

    x = rng.standard_normal((2, 4, 7, 32)).astype(np.float32)
    p, scale = quantize_kv(jnp.asarray(x), bits=4)
    assert p.shape == (2, 4, 7, 16) and p.dtype == jnp.int8
    deq = np.asarray(unpack_int4(p)).astype(np.float32) * \
        np.asarray(scale)[..., None]
    # 4-bit: max relative error per position bounded by scale/2
    assert np.abs(deq - x).max() <= np.asarray(scale).max() * 0.5 + 1e-6


def test_int4_kv_decode_close_to_bf16():
    """Decode-mode attention over an int4 frozen cache tracks the float one."""
    import dataclasses as dc
    from chatterbox_tpu.models.t3.backbone import KVCache, quantize_kv
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tt = 2, 6
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((B, cfg.speaker_embed_size)),
        jnp.zeros((B, 4), jnp.int32), 0.5 * jnp.ones((B, 1)),
        jnp.zeros((B, Tt), jnp.int32), jnp.full((B,), Tt, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)

    cond = jax.random.normal(rng, (B, cfg.cond_len, cfg.hidden_size)) * 0.2
    text = jax.random.randint(rng, (B, Tt), 0, cfg.text_vocab_size)
    tlen = jnp.full((B,), Tt, jnp.int32)
    cfgs = jnp.full((B,), 0.5)

    def prefill(m):
        embeds, plen = m.build_prompt_embeds(cond, text, tlen)
        return m.prefill(embeds, plen, cfgs), plen

    (logits, fkv), plen = model.apply(
        params, method=lambda m: prefill(m))
    toks = jnp.argmax(logits, -1).astype(jnp.int32)
    S = fkv.k.shape[3]

    def decode(m, frozen):
        ring = KVCache.zeros(cfg, 2 * B, 4,
                             jnp.bfloat16 if frozen.quantized else frozen.k.dtype)
        return m.decode_step(toks, jnp.ones((B,), jnp.int32), plen,
                             frozen, plen, ring, jnp.int32(0), cfgs)[0]

    ref = model.apply(params, method=lambda m: decode(m, fkv))

    k4, ks = quantize_kv(fkv.k, bits=4)
    v4, vs = quantize_kv(fkv.v, bits=4)
    frozen4 = KVCache(k=k4, v=v4, k_scale=ks, v_scale=vs)
    out = model.apply(params, method=lambda m: decode(m, frozen4))

    corr = np.corrcoef(np.asarray(ref, np.float32).ravel(),
                       np.asarray(out, np.float32).ravel())[0, 1]
    assert corr > 0.99, corr


def test_int4_kv_engine_runs():
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
                       kv_dtype="int4")
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


def test_packed_heads_decode_matches_head_major():
    """Packed-heads frozen cache ([B, S, H*D] + block-diagonal q/output
    dots) gives the same decode logits as the head-major path, for both the
    float and int8-quantized cache."""
    from chatterbox_tpu.models.t3.backbone import (KVCache, pack_heads,
                                                   quantize_kv,
                                                   quantize_kv_packed)
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(3)
    B, Tt = 2, 6
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((B, cfg.speaker_embed_size)),
        jnp.zeros((B, 4), jnp.int32), 0.5 * jnp.ones((B, 1)),
        jnp.zeros((B, Tt), jnp.int32), jnp.full((B,), Tt, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)

    cond = jax.random.normal(rng, (B, cfg.cond_len, cfg.hidden_size)) * 0.2
    text = jax.random.randint(rng, (B, Tt), 0, cfg.text_vocab_size)
    tlen = jnp.full((B,), Tt, jnp.int32)
    cfgs = jnp.full((B,), 0.5)

    def prefill(m):
        embeds, plen = m.build_prompt_embeds(cond, text, tlen)
        return m.prefill(embeds, plen, cfgs), plen

    (logits, fkv), plen = model.apply(params, method=lambda m: prefill(m))
    toks = jnp.argmax(logits, -1).astype(jnp.int32)

    def decode(m, frozen):
        ring = KVCache.zeros(cfg, 2 * B, 4,
                             jnp.bfloat16 if frozen.quantized else frozen.k.dtype)
        return m.decode_step(toks, jnp.ones((B,), jnp.int32), plen,
                             frozen, plen, ring, jnp.int32(0), cfgs)[0]

    # float: packed vs head-major must agree to numerical noise
    ref = model.apply(params, method=lambda m: decode(m, fkv))
    packed = KVCache(k=pack_heads(fkv.k), v=pack_heads(fkv.v))
    out = model.apply(params, method=lambda m: decode(m, packed))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=2e-2)

    # int8: packed-quantized vs head-major-quantized
    k8, ks = quantize_kv(fkv.k)
    v8, vs = quantize_kv(fkv.v)
    ref8 = model.apply(params, method=lambda m: decode(
        m, KVCache(k=k8, v=v8, k_scale=ks, v_scale=vs)))
    kp, ksp = quantize_kv_packed(fkv.k)
    vp, vsp = quantize_kv_packed(fkv.v)
    out8 = model.apply(params, method=lambda m: decode(
        m, KVCache(k=kp, v=vp, k_scale=ksp, v_scale=vsp)))
    np.testing.assert_allclose(np.asarray(out8, np.float32),
                               np.asarray(ref8, np.float32),
                               rtol=0, atol=5e-2)
