"""High-level inference wrapper with conditional caching.

Parity target: reference ‎vllm_inference.py (ChatterboxVLLMWrapper :1-312):
a convenience facade over the session API that caches per-voice conditionals
and returns ``{"wav": ..., "sr": ...}`` dicts.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import numpy as np

from .tts import ChatterboxTTS, Conditionals


class ChatterboxTPUWrapper:
    def __init__(self, tts: Optional[ChatterboxTTS] = None,
                 ckpt_dir: Optional[str] = None, variant: str = "english",
                 **kwargs):
        if tts is not None:
            self.tts = tts
        elif ckpt_dir is not None:
            self.tts = ChatterboxTTS.from_local(ckpt_dir, variant=variant,
                                                **kwargs)
        else:
            self.tts = ChatterboxTTS.from_random(variant=variant)
        self._cond_cache: Dict[Any, Conditionals] = {}

    # ------------------------------------------------------------------
    def get_conditionals(self, voice: Optional[str] = None) -> Conditionals:
        """Compute-and-cache per-voice conditionals (reference
        ‎vllm_inference.py caching at :51,72-77)."""
        key = voice or "__default__"
        if key not in self._cond_cache:
            self._cond_cache[key] = self.tts.get_audio_conditionals(voice)
        return self._cond_cache[key]

    def clear_cache(self):
        self._cond_cache.clear()

    # ------------------------------------------------------------------
    def inference(self, text: Union[str, List[str]],
                  voice: Optional[str] = None, language_id: str = "en",
                  **kwargs) -> List[dict]:
        conds = self.get_conditionals(voice)
        return self.inference_with_conds(text, conds, language_id=language_id,
                                         **kwargs)

    def inference_with_conds(self, text: Union[str, List[str]],
                             conds: Conditionals, **kwargs) -> List[dict]:
        prompts = [text] if isinstance(text, str) else list(text)
        wavs = self.tts.generate_with_conds(prompts, conds, **kwargs)
        return [{"wav": np.asarray(w), "sr": self.tts.sr} for w in wavs]

    def shutdown(self):
        self.tts.shutdown()


class ChatterboxMultilingualTTS(ChatterboxTTS):
    """Multilingual session class (reference mtl_tts.py
    ChatterboxMultilingualTTS): same engine, 2454-token grapheme tokenizer,
    23 languages with per-prompt language ids."""

    @classmethod
    def from_local(cls, ckpt_dir, **kwargs):
        kwargs.setdefault("variant", "multilingual")
        return super().from_local(ckpt_dir, **kwargs)

    def generate(self, prompts, audio_prompt_path=None, language_id="en",
                 language_ids: Optional[List[str]] = None, **kwargs):
        """Supports a per-prompt ``language_ids`` list (reference
        mtl_tts.py:405-435); falls back to a single language_id."""
        if language_ids is None:
            return super().generate(prompts, audio_prompt_path=audio_prompt_path,
                                    language_id=language_id, **kwargs)
        if isinstance(prompts, str):
            prompts = [prompts]
        assert len(language_ids) == len(prompts)
        out = []
        for p, lang in zip(prompts, language_ids):
            out.extend(super().generate([p], audio_prompt_path=audio_prompt_path,
                                        language_id=lang, **kwargs))
        return out
