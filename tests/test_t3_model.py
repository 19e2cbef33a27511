"""Unit tests for the T3 backbone + model: KV-cache decode consistency,
prompt assembly, CFG combine.  All applies are jitted — eager flax dispatch
is pathologically slow in this environment."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.config import T3ModelConfig
from chatterbox_tpu.models.t3.backbone import KVCache, llama3_rope_frequencies
from chatterbox_tpu.models.t3.model import T3Model


@pytest.fixture(scope="module")
def tiny():
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tt = 2, 8
    cond = jax.random.normal(rng, (B, cfg.cond_len, cfg.hidden_size))
    text = jax.random.randint(rng, (B, Tt), 0, cfg.text_vocab_size)
    tlen = jnp.array([5, 8], jnp.int32)
    spk = jax.random.normal(rng, (B, cfg.speaker_embed_size))
    ptoks = jax.random.randint(rng, (B, 6), 0, cfg.start_speech_token)
    emo = 0.5 * jnp.ones((B, 1))
    params = jax.jit(lambda r: model.init(
        r, spk, ptoks, emo, text, tlen, method=lambda m, *a: m.init_all(*a)))(rng)
    return cfg, model, params, cond, text, tlen


def test_prompt_assembly_layout(tiny):
    cfg, model, params, cond, text, tlen = tiny
    embeds, plen = jax.jit(lambda c, t, l: model.apply(
        params, c, t, l, method=lambda m, *a: m.build_prompt_embeds(*a)))(
        cond, text, tlen)
    B, lanes, P, H = embeds.shape
    assert lanes == 2 and P == cfg.cond_len + text.shape[1] + 1
    np.testing.assert_array_equal(np.asarray(plen), np.asarray(cfg.cond_len + tlen + 1))
    np.testing.assert_allclose(np.asarray(embeds[:, 0, :cfg.cond_len]),
                               np.asarray(cond), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(embeds[:, 1, :cfg.cond_len]),
                               np.asarray(cond), rtol=1e-5)
    b = 0
    text_rows = np.asarray(embeds[b, 1, cfg.cond_len:cfg.cond_len + int(tlen[b])])
    assert np.abs(text_rows).max() == 0.0
    sos0 = np.asarray(embeds[b, 0, cfg.cond_len + int(tlen[b])])
    sos1 = np.asarray(embeds[b, 1, cfg.cond_len + int(tlen[b])])
    np.testing.assert_allclose(sos0, sos1)
    assert np.abs(sos0).max() > 0


def test_decode_matches_full_forward(tiny):
    """Prefill + step-by-step cached decode must equal one full forward."""
    cfg, model, params, cond, text, tlen = tiny
    B = cond.shape[0]
    S = 64
    EXT = 3
    cfgs = jnp.full((B,), 0.5)

    @jax.jit
    def incremental(cond, text, tlen):
        def run(m):
            embeds, plen = m.build_prompt_embeds(cond, text, tlen)
            logits, frozen = m.prefill(embeds, plen, cfgs)
            ring = KVCache.zeros(cfg, 2 * B, EXT, jnp.float32)
            toks = jnp.argmax(logits, -1).astype(jnp.int32)
            outs, all_toks = [], [toks]
            pos = plen
            for i in range(EXT):
                logits, ring = m.decode_step(
                    toks, jnp.full((B,), i + 1, jnp.int32), pos, frozen,
                    plen, ring, jnp.int32(i), cfgs)
                outs.append(logits)
                toks = jnp.argmax(logits, -1).astype(jnp.int32)
                all_toks.append(toks)
                pos = pos + 1
            return outs, all_toks
        return model.apply(params, method=lambda m: run(m))

    step_logits, all_toks = incremental(cond, text, tlen)

    @jax.jit
    def full(cond, text, tlen, all_toks):
        def run(m):
            embeds, plen = m.build_prompt_embeds(cond, text, tlen)
            P = embeds.shape[2]
            H = cfg.hidden_size
            full_e = jnp.zeros((B, 2, P + EXT, H))
            full_e = full_e.at[:, :, :P].set(embeds)
            # place generated-token embeddings at per-request positions
            for i in range(EXT):
                e = m.speech_emb(all_toks[i]) + m.speech_pos_emb(
                    jnp.full((B,), i + 1, jnp.int32))           # [B, H]
                onehot = (jnp.arange(P + EXT)[None] == (plen + i)[:, None])
                full_e = full_e + onehot[:, None, :, None] * e[:, None, None, :]
            x = full_e.reshape(2 * B, P + EXT, H)
            positions = jnp.broadcast_to(jnp.arange(P + EXT)[None], (2 * B, P + EXT))
            lens2 = jnp.repeat(plen + EXT, 2)
            hidden, _ = m.backbone(x, positions, lens2, mode="block")
            hidden = hidden.reshape(B, 2, P + EXT, -1)
            outs = []
            for i in range(EXT):
                idx = (plen + i)[:, None, None, None]
                h = jnp.take_along_axis(
                    hidden, jnp.broadcast_to(idx, (B, 2, 1, hidden.shape[-1])),
                    axis=2)[:, :, 0]
                outs.append(m.cfg_logits(h, cfgs))
            return outs
        return model.apply(params, method=lambda m: run(m))

    ref_logits = full(cond, text, tlen, all_toks)
    for i in range(EXT):
        np.testing.assert_allclose(np.asarray(step_logits[i]),
                                   np.asarray(ref_logits[i]),
                                   rtol=2e-4, atol=2e-4)


def test_cfg_scale_zero_equals_cond_only(tiny):
    cfg, model, params, cond, text, tlen = tiny
    B = cond.shape[0]
    h = jax.random.normal(jax.random.PRNGKey(1), (B, 2, cfg.hidden_size))
    f = jax.jit(lambda x, s: model.apply(params, x, s,
                                         method=lambda m, *a: m.cfg_logits(*a)))
    l0 = f(h, jnp.zeros((B,)))
    l_cond = f(jnp.repeat(h[:, 0:1], 2, axis=1), jnp.zeros((B,)))
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l_cond), rtol=1e-5)


def test_cfg_scale_combine_math(tiny):
    cfg, model, params, cond, text, tlen = tiny
    B = cond.shape[0]
    h = jax.random.normal(jax.random.PRNGKey(2), (B, 2, cfg.hidden_size))
    f = jax.jit(lambda x, s: model.apply(params, x, s,
                                         method=lambda m, *a: m.cfg_logits(*a)))
    s = jnp.array([0.5, 2.0])
    out = np.asarray(f(h, s))
    l_cond = np.asarray(f(jnp.repeat(h[:, 0:1], 2, 1), jnp.zeros((B,))))
    l_unc = np.asarray(f(jnp.repeat(h[:, 1:2], 2, 1), jnp.zeros((B,))))
    expect = l_cond + np.asarray(s)[:, None] * (l_cond - l_unc)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_rope_llama3_scaling_monotonic():
    cfg = T3ModelConfig()
    f = np.asarray(llama3_rope_frequencies(cfg))
    assert f.shape == (cfg.head_dim // 2,)
    assert np.all(np.diff(f) < 0)
    base = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2) / cfg.head_dim))
    assert np.allclose(f[0], base[0])
    assert f[-1] <= base[-1]
