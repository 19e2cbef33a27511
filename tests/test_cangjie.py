"""zh Cangjie conversion parity vs the reference converter.

The reference (`/root/reference/src/chatterbox_vllm/models/t3/mtl_tokenizer.py`
:126-201) parses Cangjie5_TC.json as a **list** of ``"word\tcode"`` strings
and emits ``[cj_X]...[cj_.]`` bracket tokens per glyph, with a homophone
disambiguation index appended as decimal digits — the token space the
multilingual checkpoint was trained on.  These tests run the reference's own
converter code via importlib on a synthetic table fixture and require
token-for-token equality with ours, plus check the ``[cj_*]`` ids exist in
the real MTL vocab asset.
"""
import importlib.util
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_TOK = Path("/root/reference/src/chatterbox_vllm/models/t3/mtl_tokenizer.py")

# Synthetic Cangjie table in the REAL asset format: a list of "word\tcode"
# entries.  水/冰 share code "e" (homophone indices 0 and 1); 12 glyphs share
# "zz" so the last one exercises a multi-digit index ([cj_1][cj_1]).
ZZ_GLYPHS = list("一丁七万丈三上下丌不与丐")
FIXTURE = (
    ["水\te", "冰\te", "火\tf", "山\tu", "中\tl", "国\twmgi"]
    + [f"{g}\tzz" for g in ZZ_GLYPHS]
)


def _our_converter(tmp_path):
    from chatterbox_tpu.audio.tokenizer import ChineseCangjieConverter
    p = tmp_path / "Cangjie5_TC.json"
    p.write_text(json.dumps(FIXTURE, ensure_ascii=False), encoding="utf-8")
    conv = ChineseCangjieConverter(str(p))
    conv.seg = None  # deterministic: no pkuseg segmentation in either side
    return conv


def _ref_converter(monkeypatch, tmp_path):
    """Load the reference module and build its converter on the fixture."""
    if not REF_TOK.is_file():
        pytest.skip("reference tree not available")
    # stub the one intra-package import the module needs
    tu = types.ModuleType("chatterbox_vllm.text_utils")
    tu.SUPPORTED_LANGUAGES = {"en": "English", "zh": "Chinese"}
    pkg = types.ModuleType("chatterbox_vllm")
    monkeypatch.setitem(sys.modules, "chatterbox_vllm", pkg)
    monkeypatch.setitem(sys.modules, "chatterbox_vllm.text_utils", tu)
    spec = importlib.util.spec_from_file_location("ref_mtl_tok", REF_TOK)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    p = tmp_path / "ref_cangjie.json"
    p.write_text(json.dumps(FIXTURE, ensure_ascii=False), encoding="utf-8")
    monkeypatch.setattr(mod, "hf_hub_download",
                        lambda repo_id, filename, cache_dir=None: str(p))
    conv = mod.ChineseCangjieConverter()
    conv.segmenter = None
    assert conv.word2cj, "reference converter failed to parse the fixture"
    return conv


TEXTS = [
    "水火山",                       # plain glyphs, index 0
    "冰水",                         # homophone pair: 冰 -> [cj_e][cj_1][cj_.]
    "中国 great wall, 山!",         # mixed zh/latin/punct/space
    "こんにちは水",                  # hiragana (Lo category, not in table)
    "".join(ZZ_GLYPHS),            # homophone indices 0..11 (multi-digit)
    "",
]


@pytest.mark.parametrize("text", TEXTS)
def test_cangjie_matches_reference(monkeypatch, tmp_path, text):
    ours = _our_converter(tmp_path)
    ref = _ref_converter(monkeypatch, tmp_path)
    assert ours(text) == ref(text)


def test_cangjie_emission_format(tmp_path):
    conv = _our_converter(tmp_path)
    assert conv("水") == "[cj_e][cj_.]"
    assert conv("冰") == "[cj_e][cj_1][cj_.]"          # homophone index 1
    assert conv("国") == "[cj_w][cj_m][cj_g][cj_i][cj_.]"
    assert conv(ZZ_GLYPHS[11]) == "[cj_z][cj_z][cj_1][cj_1][cj_.]"
    assert conv("abc, def") == "abc, def"              # non-Lo untouched


def test_cangjie_identity_without_asset(tmp_path):
    from chatterbox_tpu.audio.tokenizer import ChineseCangjieConverter
    conv = ChineseCangjieConverter(str(tmp_path / "missing.json"))
    conv.seg = None
    assert conv("水火") == "水火"


def test_cj_tokens_exist_in_real_mtl_vocab():
    """The emitted token inventory must be representable by the shipped
    multilingual vocab (reference grapheme_mtl_merged_expanded_v1.json)."""
    asset = Path("/root/reference/t3-multilingual-model/"
                 "grapheme_mtl_merged_expanded_v1.json")
    if not asset.is_file():
        pytest.skip("reference vocab asset not available")
    from tokenizers import Tokenizer
    tok = Tokenizer.from_file(str(asset))
    voc = tok.get_vocab()
    needed = ([f"[cj_{c}]" for c in "abcdefghijklmnopqrstuvwxyz"]
              + [f"[cj_{d}]" for d in "0123456789"] + ["[cj_."+"]"])
    missing = [t for t in needed if t not in voc]
    assert not missing, f"MTL vocab lacks {missing}"


def test_cangjie_through_mtl_tokenizer(tmp_path):
    """End-to-end: zh text routed through MTLTokenizer yields the bracket
    token ids (added tokens survive encoding as single ids)."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import Split

    from chatterbox_tpu.audio.tokenizer import MTLTokenizer

    chars = list("abcdefghijklmnopqrstuvwxyz.,!? ")
    special = ["[UNK]", "[START]", "[STOP]", "[SPACE]", "[zh]"]
    vocab = {t: i for i, t in enumerate(special + chars)}
    tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token="[UNK]"))
    tok.pre_tokenizer = Split("", "isolated")
    cj_tokens = ([f"[cj_{c}]" for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
                 + ["[cj_.]", "[zh]"])
    tok.add_special_tokens(cj_tokens)
    p = tmp_path / "mtl_tokenizer.json"
    tok.save(str(p))

    asset = tmp_path / "Cangjie5_TC.json"
    asset.write_text(json.dumps(FIXTURE, ensure_ascii=False), encoding="utf-8")
    mtl = MTLTokenizer(str(p), cangjie_path=str(asset))
    mtl.cangjie.seg = None

    ids = mtl.text_to_tokens("冰", language_id="zh")
    toks = [mtl.tokenizer.id_to_token(int(i)) for i in ids]
    assert toks[0] == "[zh]"
    assert toks[1:] == ["[cj_e]", "[cj_1]", "[cj_.]"]
    assert "[UNK]" not in toks
    assert ids.dtype == np.int32
