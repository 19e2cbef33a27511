"""Output-audio post-processing: hard alignment, RMS tail trim, VAD trim.

Parity target: reference tts.py:495-556 ([Align] hard length alignment,
[Tail] RMS energy trim, [VAD] optional end trim) with the same knob semantics
(PostProcessConfig mirrors the CHATTERBOX_* env family)."""
from __future__ import annotations

import numpy as np

from ..config import PostProcessConfig, S3GEN_SR, S3_TOKEN_RATE


def align_hard(wav: np.ndarray, n_tokens: int, cfg: PostProcessConfig,
               sr: int = S3GEN_SR) -> np.ndarray:
    """Cap audio length to the token-derived expectation
    (tts.py:495-508: n_tokens * sr / 25 samples + safety)."""
    if not cfg.align_hard or wav.size == 0:
        return wav
    expected = int(round(n_tokens * (sr / S3_TOKEN_RATE)))
    safety = max(0, int(sr * cfg.align_safety_ms / 1000))
    return wav[: min(len(wav), expected + safety)]


def rms_tail_trim(wav: np.ndarray, cfg: PostProcessConfig,
                  sr: int = S3GEN_SR, peak: float = 0.0) -> np.ndarray:
    """Energy-based tail trim (tts.py:510-541): windowed RMS, threshold
    relative to peak (or absolute fallback), cut after last active frame
    plus a safety margin.  ``peak``: externally-tracked peak frame RMS to
    combine with this window's own (the streaming path trims only a held
    tail but must threshold relative to the WHOLE chunk's peak)."""
    if not cfg.tail_trim or wav.size == 0:
        return wav
    frame = max(1, int(sr * cfg.rms_window_ms / 1000))
    hop = max(1, int(sr * cfg.rms_hop_ms / 1000))
    if len(wav) < frame:
        return wav
    n = 1 + (len(wav) - frame) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(wav[idx] ** 2, axis=1))
    own_peak = float(rms.max()) if rms.size else 0.0
    combined = max(own_peak, float(peak))
    if combined > 0:
        thr = combined * (10.0 ** (cfg.tail_trim_db_rel / 20.0))
    else:
        thr = 10.0 ** (cfg.tail_trim_db / 20.0)
    active = np.where(rms > thr)[0]
    safety = int(sr * cfg.tail_trim_safety_ms / 1000)
    if active.size == 0:
        # window fully below threshold: with an externally-tracked peak
        # (streaming held tail) the whole window IS the dead tail — keep
        # only the safety margin; without one, preserve legacy behavior
        return wav[:safety] if peak > 0 else wav
    cut = min(len(wav), (int(active[-1]) + 1) * hop + safety)
    return wav[:cut]


def vad_tail_trim(wav: np.ndarray, cfg: PostProcessConfig,
                  sr: int = S3GEN_SR) -> np.ndarray:
    """Optional energy-gate VAD end trim (tts.py:544-555; the reference uses
    torchaudio.functional.vad — here a simple dual-threshold energy gate)."""
    if not cfg.vad_trim or wav.size == 0:
        return wav
    frame = int(sr * 0.01)
    n = len(wav) // frame
    if n == 0:
        return wav
    e = np.sqrt(np.mean(wav[: n * frame].reshape(n, frame) ** 2, axis=1))
    thr = max(1e-4, 0.05 * float(e.max()))
    active = np.where(e > thr)[0]
    if active.size == 0:
        return wav
    return wav[: min(len(wav), (int(active[-1]) + 1) * frame)]


def postprocess_wav(wav: np.ndarray, n_tokens: int,
                    cfg: PostProcessConfig) -> np.ndarray:
    """Full chain in reference order (tts.py:495-556)."""
    wav = align_hard(wav, n_tokens, cfg)
    wav = rms_tail_trim(wav, cfg)
    wav = vad_tail_trim(wav, cfg)
    return wav
