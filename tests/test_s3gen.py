"""S3Gen stack tests: shapes, masking/batch invariance, determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.config import S3GenConfig
from chatterbox_tpu.models.s3gen.flow import fixed_noise
from chatterbox_tpu.models.s3gen.s3gen import S3Gen


@pytest.fixture(scope="module")
def tiny_s3gen():
    cfg = S3GenConfig.tiny()
    model = S3Gen(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tp, Tg = 2, 4, 6
    T = Tp + Tg
    tokens = jax.random.randint(rng, (B, T), 0, cfg.speech_vocab_size)
    token_len = jnp.array([T, T - 2], jnp.int32)
    pfeat = jax.random.normal(rng, (B, 2 * Tp, cfg.n_mels))
    pflen = jnp.array([2 * Tp, 2 * Tp], jnp.int32)
    emb = jax.random.normal(rng, (B, cfg.spk_embed_dim))
    noise = jnp.broadcast_to(
        fixed_noise(cfg.n_mels)[:, : 2 * T], (B, 2 * T, cfg.n_mels))
    rngs = jax.random.split(jax.random.PRNGKey(42), B)
    params = jax.jit(lambda r: model.init(
        r, tokens, token_len, pfeat, pflen, emb, noise, rngs, n_timesteps=2))(rng)
    return cfg, model, params


def _run(model, params, tokens, token_len, pfeat, pflen, emb, noise, rngs):
    return jax.jit(
        lambda *a: model.apply(params, *a, n_timesteps=2))(
        tokens, token_len, pfeat, pflen, emb, noise, rngs)


def test_shapes_and_finite(tiny_s3gen):
    cfg, model, params = tiny_s3gen
    rng = jax.random.PRNGKey(5)
    B, Tp, T = 2, 4, 10
    tokens = jax.random.randint(rng, (B, T), 0, cfg.speech_vocab_size)
    token_len = jnp.array([T, T - 2], jnp.int32)
    pfeat = jax.random.normal(rng, (B, 2 * Tp, cfg.n_mels))
    pflen = jnp.array([2 * Tp, 2 * Tp], jnp.int32)
    emb = jax.random.normal(rng, (B, cfg.spk_embed_dim))
    noise = jnp.broadcast_to(fixed_noise(cfg.n_mels)[:, : 2 * T],
                             (B, 2 * T, cfg.n_mels))
    rngs = jax.random.split(jax.random.PRNGKey(42), B)
    wav, wav_len = _run(model, params, tokens, token_len, pfeat, pflen, emb,
                        noise, rngs)
    assert wav.shape[0] == B
    assert np.isfinite(np.asarray(wav)).all()
    # generated region: (token_len*2 - prompt_frames) * 480 samples
    expect = (np.asarray(token_len) * 2 - np.asarray(pflen)) * 480
    np.testing.assert_array_equal(np.asarray(wav_len), expect)
    # samples beyond wav_len are zeroed
    assert np.abs(np.asarray(wav[1, int(wav_len[1]):])).max() == 0.0


def test_batch_invariance(tiny_s3gen):
    """A request vocoded in a batch must match the same request vocoded solo
    (masking correctness — the reference cannot batch at all)."""
    cfg, model, params = tiny_s3gen
    rng = jax.random.PRNGKey(6)
    Tp, T = 3, 8
    tokens = jax.random.randint(rng, (2, T), 0, cfg.speech_vocab_size)
    token_len = jnp.array([T, T - 3], jnp.int32)
    pfeat = jax.random.normal(rng, (2, 2 * Tp, cfg.n_mels))
    pflen = jnp.array([2 * Tp, 2 * Tp], jnp.int32)
    emb = jax.random.normal(rng, (2, cfg.spk_embed_dim))
    noise = jnp.broadcast_to(fixed_noise(cfg.n_mels)[:, : 2 * T],
                             (2, 2 * T, cfg.n_mels))
    rngs = jax.random.split(jax.random.PRNGKey(42), 2)

    wav_b, len_b = _run(model, params, tokens, token_len, pfeat, pflen, emb,
                        noise, rngs)
    for b in range(2):
        wav_s, len_s = _run(model, params, tokens[b:b+1], token_len[b:b+1],
                            pfeat[b:b+1], pflen[b:b+1], emb[b:b+1],
                            noise[b:b+1], rngs[b:b+1])
        assert int(len_s[0]) == int(len_b[b])
        # exclude the <= n_fft-sample WOLA boundary at the very end
        n = int(len_s[0]) - 16
        np.testing.assert_allclose(np.asarray(wav_s[0, :n]),
                                   np.asarray(wav_b[b, :n]),
                                   rtol=2e-2, atol=2e-3)


def test_padding_invariance(tiny_s3gen):
    """Extra right-padding on the token axis must not change the output."""
    cfg, model, params = tiny_s3gen
    rng = jax.random.PRNGKey(7)
    Tp, T = 3, 8
    tokens = jax.random.randint(rng, (1, T), 0, cfg.speech_vocab_size)
    token_len = jnp.array([T], jnp.int32)
    pfeat = jax.random.normal(rng, (1, 2 * Tp, cfg.n_mels))
    pflen = jnp.array([2 * Tp], jnp.int32)
    emb = jax.random.normal(rng, (1, cfg.spk_embed_dim))
    rngs = jax.random.split(jax.random.PRNGKey(42), 1)

    noise_a = jnp.broadcast_to(fixed_noise(cfg.n_mels)[:, : 2 * T],
                               (1, 2 * T, cfg.n_mels))
    wav_a, len_a = _run(model, params, tokens, token_len, pfeat, pflen, emb,
                        noise_a, rngs)

    PAD = 4
    tokens_p = jnp.pad(tokens, ((0, 0), (0, PAD)))
    noise_b = jnp.broadcast_to(fixed_noise(cfg.n_mels)[:, : 2 * (T + PAD)],
                               (1, 2 * (T + PAD), cfg.n_mels))
    wav_b, len_b = _run(model, params, tokens_p, token_len, pfeat, pflen, emb,
                        noise_b, rngs)
    assert int(len_a[0]) == int(len_b[0])
    # exclude the <= n_fft-sample WOLA boundary at the very end
    n = int(len_a[0]) - 16
    np.testing.assert_allclose(np.asarray(wav_a[0, :n]),
                               np.asarray(wav_b[0, :n]),
                               rtol=2e-2, atol=2e-3)


def test_encoder_bf16_matches_f32():
    """Production-dtype coverage for the conformer encoder (ADVICE r4): the
    attention score einsums + rel-shift run in the INPUT dtype — bf16 on
    TPU — with only the softmax in f32, and every parity suite feeds f32.
    Run the same params on the same data in both dtypes and bound the
    drift, so a regression in the bf16 logits path (e.g. an overflow in the
    [B,H,T,2T-1] rel-position term) is caught on CPU."""
    import dataclasses
    from chatterbox_tpu.models.s3gen.encoder import UpsampleConformerEncoder

    cfg = dataclasses.replace(
        S3GenConfig.tiny(), enc_dim=64, enc_heads=4, enc_ffn_dim=128,
        enc_blocks=2, enc_up_blocks=1)
    enc = UpsampleConformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    B, T = 2, 48
    x = jax.random.normal(rng, (B, T, cfg.enc_dim), jnp.float32)
    lengths = jnp.array([T, T - 9], jnp.int32)
    params = enc.init(jax.random.PRNGKey(1), x, lengths)

    y32, l32 = enc.apply(params, x, lengths)
    # production configuration: params cast to bf16 (bench.py/api do the
    # same tree-cast), input bf16 — every score einsum then runs bf16
    params16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    y16, l16 = enc.apply(params16, x.astype(jnp.bfloat16), lengths)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))
    a = np.asarray(y32, np.float32)
    b = np.asarray(y16, np.float32)
    assert np.isfinite(b).all()
    # bf16 carries ~8 mantissa bits; across 2 conformer blocks + upsample
    # the accumulated relative error stays well under 5% of the output scale
    denom = max(np.abs(a).max(), 1e-6)
    rel = np.abs(a - b).max() / denom
    assert rel < 5e-2, f"bf16 encoder drifted {rel:.3f} from f32"
