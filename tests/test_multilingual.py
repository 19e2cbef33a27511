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


def test_mtl_per_prompt_language_list(tmp_path):
    """Per-prompt language_id lists (reference mtl_tts.py:405-435): one call,
    mixed languages, each prompt tagged/tokenized with its own language."""
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.audio.tokenizer import MTLTokenizer
    from chatterbox_tpu.models.s3tokenizer.model import S3TokenizerConfig

    path = make_tiny_mtl_tokenizer(tmp_path)
    t3 = dataclasses.replace(T3ModelConfig.tiny(), text_vocab_size=64)
    cfg = ChatterboxConfig(
        t3=t3, s3gen=S3GenConfig.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            decode_chunk=4, prefill_buckets=(32, 64),
                            tokens_max=16, tokens_min=4, tokens_per_char=0.5))
    tts = ChatterboxTTS.from_random(cfg=cfg, tokenizer=MTLTokenizer(path),
                                    variant="multilingual",
                                    s3tok_cfg=S3TokenizerConfig.tiny())
    wavs = tts.generate(["bonjour.", "hello.", "hi again."],
                        language_id=["fr", "en", "en"],
                        max_tokens=8, diffusion_steps=2)
    assert len(wavs) == 3
    assert all(np.isfinite(w).all() and len(w) % 960 == 0 for w in wavs)
    # wrong-length list rejected
    with pytest.raises(ValueError):
        tts.generate(["a.", "b."], language_id=["fr"], max_tokens=4)
    # one bad language in the list rejected
    with pytest.raises(ValueError):
        tts.generate(["a.", "b."], language_id=["fr", "xx"], max_tokens=4)


def test_per_prompt_params_and_mixed_voice_vocode(tmp_path):
    """Scalar vs per-prompt-list parameters produce identical audio when the
    list is uniform (greedy/deterministic), and vocode_batch accepts
    per-request Conditionals (mixed voices in one batch)."""
    import dataclasses as dc
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.audio.tokenizer import MTLTokenizer
    from chatterbox_tpu.models.s3tokenizer.model import S3TokenizerConfig

    path = make_tiny_mtl_tokenizer(tmp_path)
    t3 = dataclasses.replace(T3ModelConfig.tiny(), text_vocab_size=64)
    cfg = ChatterboxConfig(
        t3=t3, s3gen=S3GenConfig.tiny(),
        engine=EngineConfig(max_batch_size=2, max_model_len=128,
                            decode_chunk=4, prefill_buckets=(32, 64),
                            tokens_max=16, tokens_min=4, tokens_per_char=0.5,
                            deterministic=True))
    tts = ChatterboxTTS.from_random(cfg=cfg, tokenizer=MTLTokenizer(path),
                                    variant="multilingual",
                                    s3tok_cfg=S3TokenizerConfig.tiny())
    prompts = ["one two.", "three four five."]
    a = tts.generate(prompts, language_id="en", max_tokens=8,
                     diffusion_steps=2)
    b = tts.generate(prompts, language_id=["en", "en"],
                     temperature=[0.8, 0.8], exaggeration=[0.5, 0.5],
                     max_tokens=8, diffusion_steps=2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # mixed voices: same default conds object twice vs two distinct conds
    # with different prompt lengths must still vocode in one batch
    c0 = tts.default_conds
    c1 = dc.replace(
        c0, prompt_token=c0.prompt_token[: max(1, len(c0.prompt_token) // 2)],
        prompt_feat=c0.prompt_feat[: max(2, 2 * (len(c0.prompt_token) // 2))])
    toks = [np.arange(5, dtype=np.int32) % 16,
            np.arange(8, dtype=np.int32) % 16]
    wavs = tts.vocode_batch(toks, [c0, c1], diffusion_steps=2)
    assert len(wavs) == 2
    assert all(np.isfinite(w).all() and len(w) > 0 for w in wavs)


def test_language_normalizers_success_paths(monkeypatch):
    """he/ru/ja normalizers with their optional deps PRESENT (stubbed):
    the dependency-call branches previously only ever ran their except
    fallbacks in CI (VERDICT r4 weak #7).  Stubs stand in for dicta-onnx /
    russian_text_stresser / pykakasi and prove the call-through wiring,
    argument passing, and result use."""
    import sys
    import types
    import chatterbox_tpu.audio.tokenizer as tok_mod

    # --- Hebrew: dicta_onnx.Dicta().add_diacritics(text) ---
    calls = {}

    class FakeDicta:
        def add_diacritics(self, text):
            calls["he"] = text
            return "נִקּוּד:" + text

    dicta_mod = types.ModuleType("dicta_onnx")
    dicta_mod.Dicta = FakeDicta
    monkeypatch.setitem(sys.modules, "dicta_onnx", dicta_mod)
    monkeypatch.setattr(tok_mod, "_dicta", None)
    out = tok_mod.add_hebrew_diacritics("שלום")
    assert calls["he"] == "שלום" and out.startswith("נִקּוּד:")

    # --- Russian: russian_text_stresser ... stress_text(text) ---
    class FakeStresser:
        def stress_text(self, text):
            calls["ru"] = text
            return text.replace("привет", "приве́т")

    ru_pkg = types.ModuleType("russian_text_stresser")
    ru_sub = types.ModuleType("russian_text_stresser.text_stresser")
    ru_sub.RussianTextStresser = FakeStresser
    ru_pkg.text_stresser = ru_sub
    monkeypatch.setitem(sys.modules, "russian_text_stresser", ru_pkg)
    monkeypatch.setitem(sys.modules, "russian_text_stresser.text_stresser",
                        ru_sub)
    monkeypatch.setattr(tok_mod, "_ru_stresser", None)
    out = tok_mod.add_russian_stress("привет мир")
    assert calls["ru"] == "привет мир" and "приве́т" in out

    # --- Japanese: pykakasi kanji -> hiragana with the particle-space
    # heuristic (は/へ after kanji get a leading space) ---
    class FakeKakasi:
        def convert(self, text):
            return [{"orig": "漢字", "hira": "かんじ"},
                    {"orig": "です", "hira": "です"}]

    kakasi_mod = types.ModuleType("pykakasi")
    kakasi_mod.kakasi = lambda: FakeKakasi()
    monkeypatch.setitem(sys.modules, "pykakasi", kakasi_mod)
    monkeypatch.setattr(tok_mod, "_kakasi", None)
    out = tok_mod.hiragana_normalize("漢字です")
    assert out == "かんじです"

    # reset the module-level caches so later tests see a clean state
    monkeypatch.setattr(tok_mod, "_dicta", None)
    monkeypatch.setattr(tok_mod, "_ru_stresser", None)
    monkeypatch.setattr(tok_mod, "_kakasi", None)


def test_mtl_routing_uses_normalizers(monkeypatch):
    """MTLTokenizer.apply_language_processing must route he/ru through the
    normalizers (not just zh/ja/ko)."""
    import chatterbox_tpu.audio.tokenizer as tok_mod
    from chatterbox_tpu.audio.tokenizer import MTLTokenizer

    seen = []
    monkeypatch.setattr(tok_mod, "add_hebrew_diacritics",
                        lambda t: seen.append(("he", t)) or t)
    monkeypatch.setattr(tok_mod, "add_russian_stress",
                        lambda t: seen.append(("ru", t)) or t)
    tok = MTLTokenizer.from_pretrained()
    out_he = tok.apply_language_processing("שלום", "he")
    out_ru = tok.apply_language_processing("привет", "ru")
    assert ("he", "שלום") in seen and ("ru", "привет") in seen
    assert out_he.startswith("[he]") and out_ru.startswith("[ru]")
