"""End-to-end smoke: text -> speech tokens -> waveform on tiny random models
(the CPU-runnable BASELINE config-1 path, mirroring example-tts.py)."""
import json

import jax
import numpy as np
import pytest

from chatterbox_tpu.config import (ChatterboxConfig, EngineConfig,
                                   S3GenConfig, T3ModelConfig)
import dataclasses


def make_tiny_tokenizer(tmp_path, vocab_size=32):
    """Minimal char-level BPE json with the reference's special tokens."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE

    chars = list("abcdefghijklmnopqrstuvwxyz.,!?'\"-")
    special = ["[UNK]", "[START]", "[STOP]", "[SPACE]"]
    vocab = {t: i for i, t in enumerate(special + chars)}
    tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    from tokenizers.pre_tokenizers import Split
    tok.pre_tokenizer = Split("", "isolated")
    p = tmp_path / "tokenizer.json"
    tok.save(str(p))
    return str(p), len(vocab)


@pytest.fixture(scope="module")
def tts(tmp_path_factory):
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.audio.tokenizer import EnTokenizer

    tmp = tmp_path_factory.mktemp("tok")
    tok_path, vocab_n = make_tiny_tokenizer(tmp)

    t3 = dataclasses.replace(T3ModelConfig.tiny(), text_vocab_size=64)
    cfg = ChatterboxConfig(
        t3=t3,
        s3gen=S3GenConfig.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            decode_chunk=4, prefill_buckets=(32, 96),
                            tokens_max=32, tokens_min=4, tokens_per_char=0.5),
    )
    from chatterbox_tpu.models.s3tokenizer.model import S3TokenizerConfig
    tokenizer = EnTokenizer(tok_path)
    return ChatterboxTTS.from_random(cfg=cfg, tokenizer=tokenizer,
                                     s3tok_cfg=S3TokenizerConfig.tiny())


def test_text_to_wav(tts):
    wavs = tts.generate(["hello world.", "a much longer sentence to speak!"],
                        max_tokens=16, diffusion_steps=2)
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1
        assert np.isfinite(w).all()
        # 24 kHz out; at least a frame of audio unless everything trimmed
        assert len(w) >= 0


def test_exaggeration_changes_cond(tts):
    conds = tts.get_audio_conditionals(None)
    c2 = tts.update_exaggeration(conds, 0.9)
    assert not np.allclose(conds.cond_emb[-1], c2.cond_emb[-1])
    np.testing.assert_allclose(conds.cond_emb[:-1], c2.cond_emb[:-1])


def test_conditionals_from_wav(tts):
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(24000 * 2)).astype(np.float32)
    conds = tts.conditionals_from_wav(wav)
    t3c = tts.cfg.t3
    assert conds.cond_emb.shape == (t3c.cond_len, t3c.hidden_size)
    assert conds.prompt_feat.shape[1] == tts.cfg.s3gen.n_mels
    assert conds.prompt_feat.shape[0] == 2 * len(conds.prompt_token)
    assert np.isfinite(conds.embedding).all()


def test_vocode_stream_matches_total_length(tts):
    """vocode_stream (flow_only + segmented HiFT, VERDICT r4 item 4) must
    yield exactly gen_frames*480 samples, finite, deterministic — and the
    first piece must arrive from a single small HiFT call."""
    conds = tts.get_audio_conditionals(None)
    tokens = np.arange(24) % tts.cfg.s3gen.speech_vocab_size
    runs = []
    for _ in range(2):
        pieces = list(tts.vocode_stream(tokens, conds, diffusion_steps=2,
                                        seg_frames=8, ctx_frames=2))
        assert len(pieces) >= 2              # actually segmented
        wav = np.concatenate(pieces)
        assert np.isfinite(wav).all()
        # flow upsamples tokens 2x to mel frames; 480 samples/frame
        assert len(wav) == 2 * len(tokens) * 480
        runs.append(wav)
    np.testing.assert_array_equal(runs[0], runs[1])
    # 20 ms fade-in: very first 480 samples are zeroed
    assert np.abs(runs[0][:480]).max() == 0.0


def test_stream_pcm_frames_segmented_vocode(tts):
    """The server streaming path drives the segmented vocode end-to-end
    with a real (tiny) session: frames concatenate to a coherent stream and
    the tokens-only service path is exercised."""
    from chatterbox_tpu.api.server import TTSService
    service = TTSService(tts)
    frames = list(service.stream_pcm_frames(
        "hello there world. this is a second phrase to stream!",
        first_chunk_chars=12, chunk_chars=30, seg_frames=8,
        diffusion_steps=2, first_chunk_diff_steps=2))
    assert frames
    pcm = b"".join(frames)
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    wav = np.frombuffer(pcm, np.int16)
    assert np.isfinite(wav.astype(np.float32)).all()
    assert np.abs(wav).max() > 0


def test_vocode_stream_single_segment_equals_batch_vocode(tts):
    """With one segment covering the whole utterance, vocode_stream's
    split flow_only + HiFT pipeline must reproduce the fused
    S3Gen.__call__ path exactly (same fixed noise, same per-request rng
    row, same bucketing) — pinning the stage-split plumbing."""
    conds = tts.get_audio_conditionals(None)
    tokens = (np.arange(20) * 3) % tts.cfg.s3gen.speech_vocab_size
    pieces = list(tts.vocode_stream(tokens, conds, diffusion_steps=2,
                                    seg_frames=4096))
    assert len(pieces) == 1
    streamed = pieces[0]
    full = tts.vocode_batch([tokens.astype(np.int32)], [conds],
                            diffusion_steps=2, batch_bucket=1)[0]
    assert len(streamed) == len(full)
    np.testing.assert_allclose(streamed, full, atol=1e-4)


def test_vocode_stream_degenerate_seg_frames(tts):
    """seg_frames <= 1 is clamped instead of crashing (code-review r5:
    a request-supplied seg_frames=1 made segment 0 hold its entire output
    and the next segment dereference a None crossfade tail)."""
    conds = tts.get_audio_conditionals(None)
    tokens = np.arange(10) % tts.cfg.s3gen.speech_vocab_size
    for seg in (0, 1):
        wav = np.concatenate(list(tts.vocode_stream(
            tokens, conds, diffusion_steps=2, seg_frames=seg)))
        assert len(wav) == 2 * len(tokens) * 480
        assert np.isfinite(wav).all()
