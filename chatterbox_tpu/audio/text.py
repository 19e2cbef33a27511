"""Text normalization, language table and chunking.

Parity targets: reference text_utils.py (punc_norm :2-41, SUPPORTED_LANGUAGES
:44-68) and the sentence chunker used by the benchmark/server pipelines
(benchmark.py:26-53, openai_tts_server.py:144-217).
"""
from __future__ import annotations

import re
from typing import List

SUPPORTED_LANGUAGES = {
    "ar": "Arabic", "da": "Danish", "de": "German", "el": "Greek",
    "en": "English", "es": "Spanish", "fi": "Finnish", "fr": "French",
    "he": "Hebrew", "hi": "Hindi", "it": "Italian", "ja": "Japanese",
    "ko": "Korean", "ms": "Malay", "nl": "Dutch", "no": "Norwegian",
    "pl": "Polish", "pt": "Portuguese", "ru": "Russian", "sv": "Swedish",
    "sw": "Swahili", "tr": "Turkish", "zh": "Chinese",
}

_PUNC_REPLACEMENTS = [
    ("...", ", "), ("…", ", "), (":", ","), (" - ", ", "), (";", ", "),
    ("—", "-"), ("–", "-"), (" ,", ","), ("“", '"'), ("”", '"'),
    ("‘", "'"), ("’", "'"),
]
_SENTENCE_ENDERS = {".", "!", "?", "-", ",", "、", "，", "。", "？", "！"}


def punc_norm(text: str) -> str:
    """Punctuation/casing cleanup (reference text_utils.py:2-41)."""
    if len(text) == 0:
        return "You need to add some text for me to talk."
    if text[0].islower():
        text = text[0].upper() + text[1:]
    text = " ".join(text.split())
    for old, new in _PUNC_REPLACEMENTS:
        text = text.replace(old, new)
    text = text.rstrip(" ")
    if not any(text.endswith(p) for p in _SENTENCE_ENDERS):
        text += "."
    return text


_SENT_SPLIT = re.compile(r"(?<=[.!?。？！])\s+")


def split_text_by_sentence(text: str, max_chars: int = 400) -> List[str]:
    """Greedy sentence-boundary chunking (benchmark.py:26-53): accumulate
    sentences up to max_chars per chunk; overly long sentences are split on
    commas / hard cut."""
    sentences = [s for s in _SENT_SPLIT.split(text.strip()) if s]
    chunks: List[str] = []
    cur = ""
    for s in sentences:
        if len(s) > max_chars:
            if cur:
                chunks.append(cur)
                cur = ""
            parts = re.split(r"(?<=[,，])\s*", s)
            for p in parts:
                while len(p) > max_chars:
                    chunks.append(p[:max_chars])
                    p = p[max_chars:]
                if len(cur) + len(p) + 1 > max_chars and cur:
                    chunks.append(cur)
                    cur = p
                else:
                    cur = (cur + " " + p).strip()
            continue
        if len(cur) + len(s) + 1 > max_chars and cur:
            chunks.append(cur)
            cur = s
        else:
            cur = (cur + " " + s).strip()
    if cur:
        chunks.append(cur)
    return chunks


def estimate_token_cap(text: str, tokens_per_char: float = 2.2,
                       tokens_min: int = 64, tokens_max: int = 1200,
                       guard_mult: float = 1.6) -> int:
    """Character-count based max-token estimate (reference tts.py:372-399):
    non-space chars (bracket tags stripped) x tokens_per_char, clamped, then
    a guard multiplier."""
    clean = re.sub(r"\[[^\]]+\]", "", text)
    clean = re.sub(r"<[^>]+>", "", clean)
    n = sum(1 for c in clean if not c.isspace())
    est = max(tokens_min, min(tokens_max, int(-(-n * tokens_per_char // 1))))
    return int(-(-est * guard_mult // 1))


# Unicode script ranges -> language id, checked in priority order (scripts
# that embed CJK ideographs — Japanese kana, Korean hangul — outrank the
# CJK block itself; mirrors the reference server's fallback detector,
# openai_tts_server.py:355-381).
_SCRIPT_RANGES = (
    ("he", ((0x0590, 0x05FF),)),                      # Hebrew
    ("ar", ((0x0600, 0x06FF),)),                      # Arabic
    ("ru", ((0x0400, 0x04FF),)),                      # Cyrillic
    ("ko", ((0xAC00, 0xD7AF),)),                      # Hangul syllables
    ("ja", ((0x3040, 0x309F), (0x30A0, 0x30FF))),     # hiragana + katakana
    ("zh", ((0x4E00, 0x9FFF),)),                      # CJK ideographs
)


def detect_language(text: str):
    """Best-effort language id from Unicode script ranges; None when the
    text is Latin-script/ambiguous (caller falls back to its default)."""
    if not text:
        return None
    cps = {ord(c) for c in text}
    for lang, ranges in _SCRIPT_RANGES:
        for lo, hi in ranges:
            if any(lo <= cp <= hi for cp in cps):
                return lang
    return None
