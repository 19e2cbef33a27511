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
                            decode_chunk=4, prefill_buckets=(32, 64),
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
