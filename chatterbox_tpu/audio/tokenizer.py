"""Text tokenizers: English BPE + multilingual grapheme tokenizer.

Parity targets: reference t3/entokenizer.py (EnTokenizer :46-117) and
t3/mtl_tokenizer.py (MTLTokenizer :270-420 + per-language normalizers).
Both wrap a HF ``tokenizers`` BPE json; spaces map to the ``[SPACE]`` token.

Optional language deps (pykakasi for ja, dicta-onnx for he, pkuseg for zh
segmentation, russian_text_stresser for ru) degrade gracefully to identity,
exactly like the reference's try/except fallbacks (mtl_tokenizer.py:44-220).
"""
from __future__ import annotations

import json
import logging
import os
import re
import unicodedata
from pathlib import Path
from typing import List, Optional
from unicodedata import normalize

import numpy as np

logger = logging.getLogger(__name__)

SOT, EOT = "[START]", "[STOP]"
SPACE = "[SPACE]"
UNK_TOKEN = "[UNK]"

# Vendored vocab assets (MIT-licensed data bundled like the reference bundles
# models/t3/tokenizer.json + mtl_tokenizer.json + the grapheme MTL vocab) —
# make the real-vocab path the default even without a checkpoint dir.
ASSETS_DIR = Path(__file__).resolve().parent.parent / "assets"


def _resolve(candidates: List[str], what: str) -> str:
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    raise FileNotFoundError(
        f"{what}: no tokenizer json found; looked at {candidates}")


class EnTokenizer:
    """English BPE tokenizer (reference entokenizer.py).

    Resolution order mirrors the reference (entokenizer.py:46-83): explicit
    path -> ./t3-model/tokenizer.json -> $CHATTERBOX_TOKENIZER_JSON.
    """

    def __init__(self, vocab_file: str):
        from tokenizers import Tokenizer
        self.tokenizer = Tokenizer.from_file(vocab_file)
        voc = self.tokenizer.get_vocab()
        assert SOT in voc and EOT in voc

    @classmethod
    def from_pretrained(cls, path: Optional[str] = None) -> "EnTokenizer":
        cands = []
        if path:
            p = Path(path)
            cands += [str(p), str(p / "tokenizer.json")]
        cands += [os.path.join(os.getcwd(), "t3-model", "tokenizer.json"),
                  os.environ.get("CHATTERBOX_TOKENIZER_JSON", ""),
                  str(ASSETS_DIR / "tokenizer.json")]
        return cls(_resolve(cands, "EnTokenizer"))

    @classmethod
    def char_fallback(cls, extra_specials: tuple = ()) -> "EnTokenizer":
        """In-memory char-level tokenizer for random-weight dev instances
        (this repo ships no vocab asset — the reference bundles
        tokenizer.json).  Ids are stable but arbitrary; use ONLY with
        random weights (a real checkpoint needs its real vocab)."""
        import string
        from tokenizers import Tokenizer
        from tokenizers.models import BPE
        from tokenizers.pre_tokenizers import Split
        chars = list(string.ascii_letters + string.digits
                     + string.punctuation + " ")
        special = [UNK_TOKEN, SOT, EOT, SPACE, *extra_specials]
        vocab = {t: i for i, t in enumerate(special + chars)}
        tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token=UNK_TOKEN))
        tok.pre_tokenizer = Split("", "isolated")
        tok.add_special_tokens(special)
        obj = cls.__new__(cls)
        obj.tokenizer = tok
        return obj

    def text_to_tokens(self, text: str) -> np.ndarray:
        text = text.replace(" ", SPACE)
        ids = self.tokenizer.encode(text).ids
        return np.asarray(ids, np.int32)

    def decode(self, ids) -> str:
        toks = [self.tokenizer.id_to_token(int(i)) for i in ids]
        text = "".join(t for t in toks if t is not None)
        return (text.replace(SPACE, " ")
                    .replace(EOT, "").replace("[UNK]", ""))

    @property
    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size()


# ---------------------------------------------------------------------------
# Language-specific normalizers (mtl_tokenizer.py:44-220; optional deps
# degrade to identity)
# ---------------------------------------------------------------------------
_kakasi = None
_dicta = None
_ru_stresser = None


def _is_kanji(c: str) -> bool:
    return "一" <= c <= "鿿"


def hiragana_normalize(text: str) -> str:
    global _kakasi
    try:
        if _kakasi is None:
            import pykakasi
            _kakasi = pykakasi.kakasi()
        out = []
        for r in _kakasi.convert(text):
            inp, hira = r["orig"], r["hira"]
            if any(_is_kanji(c) for c in inp):
                if hira and hira[0] in ("は", "へ"):
                    hira = " " + hira
                out.append(hira)
            else:
                out.append(inp)
        return "".join(out)
    except Exception:
        return text


def korean_normalize(text: str) -> str:
    """Decompose Hangul syllables into Jamo (mtl_tokenizer.py:105-123)."""
    def decomp(ch):
        if not ("가" <= ch <= "힯"):
            return ch
        base = ord(ch) - 0xAC00
        initial = chr(0x1100 + base // (21 * 28))
        medial = chr(0x1161 + (base % (21 * 28)) // 28)
        final = chr(0x11A7 + base % 28) if base % 28 > 0 else ""
        return initial + medial + final
    return "".join(decomp(c) for c in text).strip()


def add_hebrew_diacritics(text: str) -> str:
    global _dicta
    try:
        if _dicta is None:
            from dicta_onnx import Dicta
            _dicta = Dicta()
        return _dicta.add_diacritics(text)
    except Exception:
        return text


def add_russian_stress(text: str) -> str:
    global _ru_stresser
    try:
        if _ru_stresser is None:
            from russian_text_stresser.text_stresser import RussianTextStresser
            _ru_stresser = RussianTextStresser()
        return _ru_stresser.stress_text(text)
    except Exception:
        return text


class ChineseCangjieConverter:
    """zh text -> ``[cj_X]...[cj_.]`` Cangjie bracket tokens (reference
    mtl_tokenizer.py:126-201 ChineseCangjieConverter).

    The Cangjie5_TC.json asset is a JSON **list** of ``"word\\tcode"``
    strings (the reference splits each entry on tab,
    mtl_tokenizer.py:138-147).  Each Lo-category glyph maps to its code,
    plus a homophone disambiguation index — the position of the glyph among
    all glyphs sharing that code, appended as decimal digits when > 0
    (mtl_tokenizer.py:169-176).  Every character of ``code + index`` is
    emitted as a ``[cj_c]`` token, terminated by ``[cj_.]``
    (mtl_tokenizer.py:186-195) — this is the token space the multilingual
    checkpoint was trained on (the MTL vocab carries exactly
    [cj_a..z], [cj_0..9], [cj_.]).  Identity if the asset is unavailable.
    """

    def __init__(self, asset_path: Optional[str] = None):
        self.word2cj = {}
        self.cj2word = {}
        self.seg = None
        cands = [asset_path,
                 os.environ.get("CHATTERBOX_CANGJIE_JSON", ""),
                 os.path.join(os.getcwd(), "Cangjie5_TC.json")]
        for c in cands:
            if c and os.path.isfile(c):
                with open(c, encoding="utf-8") as f:
                    data = json.load(f)
                self._load_entries(data)
                break
        try:
            import spacy_pkuseg
            self.seg = spacy_pkuseg.pkuseg()
        except Exception:
            self.seg = None

    def _load_entries(self, data) -> None:
        for entry in data:
            word, code = entry.split("\t")[:2]
            self.word2cj[word] = code
            self.cj2word.setdefault(code, []).append(word)

    def _encode(self, glyph: str) -> Optional[str]:
        code = self.word2cj.get(glyph)
        if code is None:  # e.g. Japanese hiragana mixed into zh text
            return None
        index = self.cj2word[code].index(glyph)
        return code + (str(index) if index > 0 else "")

    def __call__(self, text: str) -> str:
        if not self.word2cj:
            return text
        full_text = " ".join(self.seg.cut(text)) if self.seg else text
        out = []
        for t in full_text:
            if unicodedata.category(t) == "Lo":
                cj = self._encode(t)
                if cj is None:
                    out.append(t)
                    continue
                out.append("".join(f"[cj_{c}]" for c in cj) + "[cj_.]")
            else:
                out.append(t)
        return "".join(out)


class MTLTokenizer(EnTokenizer):
    """Multilingual grapheme tokenizer with per-language preprocessing."""

    def __init__(self, vocab_file: str, cangjie_path: Optional[str] = None):
        super().__init__(vocab_file)
        self.cangjie = ChineseCangjieConverter(cangjie_path)

    @classmethod
    def from_pretrained(cls, path: Optional[str] = None, **kw) -> "MTLTokenizer":
        cands = []
        if path:
            p = Path(path)
            cands += [str(p),
                      str(p / "grapheme_mtl_merged_expanded_v1.json"),
                      str(p / "mtl_tokenizer.json")]
        cwd = os.path.join(os.getcwd(), "t3-multilingual-model")
        cands += [os.path.join(cwd, "grapheme_mtl_merged_expanded_v1.json"),
                  os.path.join(cwd, "mtl_tokenizer.json"),
                  os.environ.get("CHATTERBOX_MTL_TOKENIZER_JSON", ""),
                  # the grapheme vocab is the 2454-id space the MTL
                  # checkpoint trains against (reference t3-multilingual-
                  # model/); mtl_tokenizer.json is the smaller package-local
                  # variant kept as a fallback
                  str(ASSETS_DIR / "grapheme_mtl_merged_expanded_v1.json"),
                  str(ASSETS_DIR / "mtl_tokenizer.json")]
        return cls(_resolve(cands, "MTLTokenizer"), **kw)

    @classmethod
    def char_fallback(cls, extra_specials: tuple = ()) -> "MTLTokenizer":
        from .text import SUPPORTED_LANGUAGES
        tags = tuple(f"[{c}]" for c in SUPPORTED_LANGUAGES)
        obj = super().char_fallback(extra_specials=tags + extra_specials)
        obj.cangjie = ChineseCangjieConverter(None)
        return obj

    def preprocess(self, text: str) -> str:
        """Lowercase + NFKD, restoring canonical [START]/[STOP]
        (mtl_tokenizer.py:307-324)."""
        t = normalize("NFKD", text.lower())
        t = re.sub(r"\[start\]", SOT, t)
        t = re.sub(r"\[stop\]", EOT, t)
        return t

    def apply_language_processing(self, text: str, language_id: Optional[str]):
        if language_id == "zh":
            text = self.cangjie(text)
        elif language_id == "ja":
            text = hiragana_normalize(text)
        elif language_id == "he":
            text = add_hebrew_diacritics(text)
        elif language_id == "ko":
            text = korean_normalize(text)
        elif language_id == "ru":
            text = add_russian_stress(text)
        if language_id:
            tag = f"[{language_id.lower()}]"
            if not text.startswith(tag):
                text = tag + text
        return text

    def text_to_tokens(self, text: str,
                       language_id: Optional[str] = None) -> np.ndarray:
        # detect a leading <lang> tag (reference uses angle brackets at the
        # orchestrator layer, tts.py:333, square ones internally)
        m = re.match(r"^<([a-z]{2})>", text)
        if m and m.group(1) in __import__(
                "chatterbox_tpu.audio.text", fromlist=["SUPPORTED_LANGUAGES"]
                ).SUPPORTED_LANGUAGES:
            language_id = language_id or m.group(1)
            text = text[m.end():]
        text = self.preprocess(text)
        text = self.apply_language_processing(text, language_id)
        text = text.replace(" ", SPACE)
        return np.asarray(self.tokenizer.encode(text).ids, np.int32)
