"""Multilingual variant: tokenizer language routing + e2e generate with a
tiny MTL model."""
import dataclasses
import json

import jax
import numpy as np
import pytest

from chatterbox_tpu.config import (ChatterboxConfig, EngineConfig,
                                   S3GenConfig, T3ModelConfig)


def make_tiny_mtl_tokenizer(tmp_path):
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Split

    chars = list("abcdefghijklmnopqrstuvwxyz.,!?'\"- ")
    special = ["[UNK]", "[START]", "[STOP]", "[SPACE]"] + \
        [f"[{c}]" for c in ("en", "fr", "zh", "ko", "ja")]
    vocab = {t: i for i, t in enumerate(special + chars)}
    tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    tok.pre_tokenizer = Split("", "isolated")
    p = tmp_path / "mtl_tokenizer.json"
    tok.save(str(p))
    return str(p)


def test_mtl_tokenizer_language_tag(tmp_path):
    from chatterbox_tpu.audio.tokenizer import MTLTokenizer
    path = make_tiny_mtl_tokenizer(tmp_path)
    tok = MTLTokenizer(path)
    ids = tok.text_to_tokens("<fr>bonjour.", language_id=None)
    assert len(ids) > 0
    # korean path decomposes jamo and prepends the tag
    ids_ko = tok.text_to_tokens("hi", language_id="ko")
    assert len(ids_ko) > 0


def test_mtl_e2e_generate(tmp_path):
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.audio.tokenizer import MTLTokenizer
    from chatterbox_tpu.models.s3tokenizer.model import S3TokenizerConfig

    path = make_tiny_mtl_tokenizer(tmp_path)
    t3 = dataclasses.replace(T3ModelConfig.tiny(), text_vocab_size=64)
    assert not t3.is_multilingual  # tiny: vocab differs, variant drives routing
    cfg = ChatterboxConfig(
        t3=t3, s3gen=S3GenConfig.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            decode_chunk=4, prefill_buckets=(32, 64),
                            tokens_max=16, tokens_min=4, tokens_per_char=0.5))
    tts = ChatterboxTTS.from_random(cfg=cfg, tokenizer=MTLTokenizer(path),
                                    variant="multilingual",
                                    s3tok_cfg=S3TokenizerConfig.tiny())
    assert len(tts.get_supported_languages()) == 23
    wavs = tts.generate(["bonjour le monde."], language_id="fr",
                        max_tokens=8, diffusion_steps=2)
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all()
    with pytest.raises(ValueError):
        tts.generate(["hi"], language_id="xx")
