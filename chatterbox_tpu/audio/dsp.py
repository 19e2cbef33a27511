"""Host-side DSP for the conditioning path (numpy — amortized per voice).

Replaces the reference's librosa/torchaudio dependency calls (SURVEY §2.12:
"librosa/scipy CPU DSP ... host-side preprocessing kept on CPU"):
  * slaney mel filterbank == librosa.filters.mel defaults (used by the 24 kHz
    S3Gen mel at s3gen/utils/mel.py:33, the 16 kHz tokenizer mel at
    s3tokenizer.py:128-168, and the 40-mel voice-encoder spectrogram at
    voice_encoder/melspec.py)
  * STFT magnitude spectrogram (librosa.stft center/reflect semantics)
  * Kaldi-style fbank for CAMPPlus (torchaudio Kaldi.fbank equivalent,
    xvector.py:45-58)
  * polyphase resampling via scipy.signal.resample_poly
"""
from __future__ import annotations

import functools

import numpy as np
from scipy import signal as sps


# ---------------------------------------------------------------------------
# Mel filterbanks
# ---------------------------------------------------------------------------
def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=16)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """librosa.filters.mel equivalent (slaney scale + slaney norm).
    Returns [n_mels, n_fft//2 + 1] float32."""
    if fmax is None:
        fmax = sr / 2
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    # slaney area normalization
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=16)
def mel_filterbank_htk(sr: int, n_fft: int, n_mels: int, fmin: float = 20.0,
                       fmax: float | None = None) -> np.ndarray:
    """Kaldi/HTK-style mel bank (no area norm), for the CAMPPlus fbank."""
    if fmax is None:
        fmax = sr / 2
    hz2mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    mel2hz = lambda m: 700.0 * (np.exp(np.asarray(m, np.float64) / 1127.0) - 1.0)
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)
    mel_pts = np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2)
    bin_mels = hz2mel(fft_freqs)
    weights = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        left, center, right = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        weights[i] = np.maximum(0, np.minimum(up, down))
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / mel spectrograms
# ---------------------------------------------------------------------------
def hann(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def stft_mag(y: np.ndarray, n_fft: int, hop: int, win: int,
             center: bool = True, pad_lr: int | None = None) -> np.ndarray:
    """Magnitude STFT.  center=True: reflect pad n_fft//2 (librosa);
    pad_lr: explicit symmetric reflect pad (matcha mel uses (n_fft-hop)/2)."""
    y = np.asarray(y, np.float32)
    if pad_lr is not None:
        y = np.pad(y, (pad_lr, pad_lr), mode="reflect")
    elif center:
        y = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    w = hann(win)
    if win < n_fft:
        w = np.pad(w, ((n_fft - win) // 2, (n_fft - win) // 2))
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * w[None, :]
    spec = np.fft.rfft(frames, axis=-1)
    return np.abs(spec).T.astype(np.float32)  # [n_bins, n_frames]


def s3gen_mel(y: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """24 kHz mel log spectrogram at 50 fps (s3gen/utils/mel.py:33-81).
    y: [T] float in [-1, 1].  Returns [F, n_mels] (frames-major)."""
    n_fft, hop, win = 1920, 480, 1920
    mag = stft_mag(y, n_fft, hop, win, pad_lr=(n_fft - hop) // 2)
    mag = np.sqrt(mag ** 2 + 1e-9)
    mel = mel_filterbank(24_000, n_fft, n_mels, 0, 8000) @ mag
    return np.log(np.maximum(mel, 1e-5)).T.astype(np.float32)


def voice_encoder_mel(y: np.ndarray) -> np.ndarray:
    """16 kHz 40-mel power spectrogram (voice_encoder/melspec.py + config.py:
    n_fft 400, hop 160, power 2, amp scale, no normalization).
    Returns [T, 40] frames-major."""
    mag = stft_mag(y, 400, 160, 400, center=True)
    mel = mel_filterbank(16_000, 400, 40, 0, 8000) @ (mag ** 2)
    return mel.T.astype(np.float32)


def s3_tokenizer_mel(y: np.ndarray, n_mels: int = 128) -> np.ndarray:
    """16 kHz log-mel for the speech tokenizer (s3tokenizer.py:128-168:
    n_fft 400, hop 160, whisper-style log10 + dynamic-range compression).
    Returns [F, n_mels]."""
    mag = stft_mag(y, 400, 160, 400, center=True)
    power = (mag ** 2)[:, :-1]  # whisper drops the last frame
    mel = mel_filterbank(16_000, 400, n_mels, 0, 8000) @ power
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T.astype(np.float32)


def kaldi_fbank(y: np.ndarray, sr: int = 16_000, n_mels: int = 80) -> np.ndarray:
    """torchaudio Kaldi.fbank equivalent (defaults: 25 ms frame, 10 ms shift,
    snip_edges, remove_dc, preemph 0.97, povey window, log mel, no dither).
    Used for CAMPPlus features (xvector.py:50).  Returns [F, n_mels]."""
    frame_len = int(sr * 0.025)
    shift = int(sr * 0.010)
    n_fft = 1 << (frame_len - 1).bit_length()  # 512 for 400
    y = np.asarray(y, np.float64) * 32768.0    # kaldi operates on int16 scale
    n_frames = 1 + (len(y) - frame_len) // shift
    idx = np.arange(n_frames)[:, None] * shift + np.arange(frame_len)[None, :]
    frames = y[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)          # remove DC
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)  # kaldi edge
    frames = frames - 0.97 * pre
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_len)
                                / (frame_len - 1))) ** 0.85
    frames = frames * povey[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    power = np.abs(spec) ** 2
    fb = mel_filterbank_htk(sr, n_fft, n_mels, 20.0, sr / 2.0)
    mel = power @ fb.T
    return np.log(np.maximum(mel, 1.1921e-07)).astype(np.float32)


def resample(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (replaces librosa.resample / torchaudio
    Resample in the conditioning path, tts.py:223-224)."""
    if orig_sr == target_sr:
        return np.asarray(y, np.float32)
    g = np.gcd(int(orig_sr), int(target_sr))
    return sps.resample_poly(np.asarray(y, np.float64),
                             target_sr // g, orig_sr // g).astype(np.float32)


def trim_silence(y: np.ndarray, top_db: float = 20.0, frame: int = 2048,
                 hop: int = 512) -> np.ndarray:
    """librosa.effects.trim equivalent (voice_encoder.py:267)."""
    if len(y) < frame:
        return y
    n = 1 + (len(y) - frame) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    rms = np.sqrt(np.mean(y[idx] ** 2, axis=1))
    ref = rms.max()
    if ref <= 0:
        return y
    db = 20 * np.log10(np.maximum(rms, 1e-10) / ref)
    keep = np.where(db > -top_db)[0]
    if len(keep) == 0:
        return y
    start = keep[0] * hop
    end = min(len(y), (keep[-1] + 1) * hop + frame)
    return y[start:end]
