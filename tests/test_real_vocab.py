"""Real-vocab BPE path end-to-end (VERDICT r3 missing #6; r4 item 2).

The repo now VENDORS the reference's vocab assets (chatterbox_tpu/assets/:
704-entry EN ``tokenizer.json``, 2453-entry MTL grapheme vocab) so
``from_pretrained()`` with no arguments resolves a real trained vocab.
These tests cover both the vendored assets and a synthetic 704-entry BPE
with genuine merge rules driving the full text->wav pipeline.
"""
import dataclasses
import json
import string

import numpy as np
import pytest

from chatterbox_tpu.audio.tokenizer import EnTokenizer


def build_704_bpe(tmp_path):
    """A tokenizer.json with the reference vocab's SHAPE: 704 entries =
    specials + printable chars + merged units with real BPE merge rules."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE

    special = ["[UNK]", "[START]", "[STOP]", "[SPACE]"]
    chars = list(string.ascii_lowercase + string.ascii_uppercase
                 + string.digits) + list(".,!?;:'\"-()")
    vocab = {t: i for i, t in enumerate(special + chars)}
    merges = []
    # frequent English bigrams first, then systematic pairs, up to 704
    bigrams = ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
               "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
               "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le"]
    pool = bigrams + [a + b for a in string.ascii_lowercase
                      for b in string.ascii_lowercase]
    for m in pool:
        if len(vocab) >= 704:
            break
        if m in vocab:
            continue
        vocab[m] = len(vocab)
        merges.append((m[0], m[1]))
    assert len(vocab) == 704, len(vocab)

    # NO pre-tokenizer: like the reference asset, segments between special
    # tokens are single BPE words, so merge rules actually apply (a
    # char-isolating pre-tokenizer would make every char its own word)
    tok = Tokenizer(BPE(vocab=vocab, merges=merges, unk_token="[UNK]"))
    tok.add_special_tokens(special)
    p = tmp_path / "tokenizer.json"
    tok.save(str(p))
    return str(p)


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vocab704")
    build_704_bpe(tmp)
    return tmp


def test_vendored_en_asset_default_resolution():
    """No-argument from_pretrained resolves the bundled 704-entry EN vocab
    (reference models/t3/tokenizer.json data, vendored per VERDICT r4)."""
    tok = EnTokenizer.from_pretrained()
    assert tok.vocab_size == 704
    ids = tok.text_to_tokens("[START]Hello world, this is a test.[STOP]")
    assert (ids >= 0).all() and (ids < 704).all()
    assert "Hello world, this is a test." in tok.decode(ids)
    # BPE merges fire on the real vocab: fewer ids than characters
    assert len(ids) < len("Hello world, this is a test.")


def test_vendored_mtl_asset_vocab():
    """The vendored 2453-entry grapheme MTL vocab loads by default and
    carries the language tags + Cangjie bracket tokens the multilingual
    checkpoint was trained on (reference t3-multilingual-model/)."""
    from chatterbox_tpu.audio.text import SUPPORTED_LANGUAGES
    from chatterbox_tpu.audio.tokenizer import MTLTokenizer
    tok = MTLTokenizer.from_pretrained()
    assert tok.vocab_size == 2453
    voc = tok.tokenizer.get_vocab()
    for lang in SUPPORTED_LANGUAGES:
        assert f"[{lang}]" in voc, lang
    for c in "abcdefghijklmnopqrstuvwxyz0123456789.":
        assert f"[cj_{c}]" in voc, c
    # per-language routing injects the tag as a single id
    ids = tok.text_to_tokens("Bonjour le monde.", language_id="fr")
    assert ids[0] == voc["[fr]"]
    assert (ids >= 0).all() and (ids < 2453).all()
    # Korean Jamo decomposition emits in-vocab Jamo ids (no [UNK] storm)
    ids_ko = tok.text_to_tokens("안녕하세요", language_id="ko")
    unk = voc.get("[UNK]", -1)
    assert (ids_ko != unk).sum() > len(ids_ko) // 2


def test_from_random_full_size_uses_real_vocab():
    """from_random on a full-size config must pick the bundled real vocab,
    not the char fallback (VERDICT r4 item 2 'done' criterion)."""
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.config import ChatterboxConfig
    tok = ChatterboxTTS._default_tokenizer_for(ChatterboxConfig(), "english")
    assert tok is not None and tok.vocab_size == 704


def test_from_pretrained_resolution_and_merges(vocab_dir):
    tok = EnTokenizer.from_pretrained(str(vocab_dir))
    assert tok.vocab_size == 704
    ids = tok.text_to_tokens("[START]the cat sat on the mat.[STOP]")
    assert ids.dtype == np.int32
    assert (ids >= 0).all() and (ids < 704).all()
    # merges must actually fire: "th"/"he"/"at"/"on" collapse pairs, so the
    # id count is well below the character count
    n_chars = len("[START]") * 0 + len("the cat sat on the mat.") + 2
    assert len(ids) < n_chars
    # specials survive as single ids
    voc = tok.tokenizer.get_vocab()
    assert ids[0] == voc["[START]"]
    assert ids[-1] == voc["[STOP]"]
    assert voc["[SPACE]"] in ids.tolist()
    # decode round-trips the text (specials stripped, spaces restored)
    assert "the cat sat on the mat." in tok.decode(ids)


def test_full_pipeline_on_real_vocab(vocab_dir):
    """text -> T3 engine -> S3Gen wav with the 704-entry BPE: the engine's
    prompt assembly and cap estimation run on genuine merged token ids."""
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.config import (ChatterboxConfig, EngineConfig,
                                       S3GenConfig, T3ModelConfig)
    from chatterbox_tpu.models.s3tokenizer.model import S3TokenizerConfig

    t3 = dataclasses.replace(T3ModelConfig.tiny(), text_vocab_size=704)
    cfg = ChatterboxConfig(
        t3=t3, s3gen=S3GenConfig.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            decode_chunk=4, prefill_buckets=(32, 64),
                            tokens_max=24, tokens_per_char=0.5))
    tok = EnTokenizer.from_pretrained(str(vocab_dir))
    tts = ChatterboxTTS.from_random(cfg=cfg, tokenizer=tok,
                                    s3tok_cfg=S3TokenizerConfig.tiny())
    wavs = tts.generate(["The quick brown fox.", "On the mat."],
                        max_tokens=12, diffusion_steps=2)
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and np.isfinite(w).all()
