"""Host DSP tests: mel filterbanks, spectrograms, resampling, postprocess."""
import numpy as np
import pytest

from chatterbox_tpu.audio import dsp
from chatterbox_tpu.audio.postprocess import (align_hard, postprocess_wav,
                                              rms_tail_trim)
from chatterbox_tpu.config import PostProcessConfig


def test_mel_filterbank_shape_and_coverage():
    fb = dsp.mel_filterbank(24_000, 1920, 80, 0, 8000)
    assert fb.shape == (80, 961)
    assert (fb >= 0).all()
    # every mel band has some support; bands tile the 0-8k range
    assert (fb.sum(axis=1) > 0).all()
    peak_bins = fb.argmax(axis=1)
    assert (np.diff(peak_bins) >= 0).all()


def test_mel_filterbank_slaney_norm():
    """Slaney norm: each filter integrates to ~2/bandwidth."""
    fb = dsp.mel_filterbank(16_000, 400, 40, 0, 8000)
    assert fb.shape == (40, 201)
    assert fb.max() < 0.1  # normalized, not unit-peak


def test_s3gen_mel_rate():
    sr, secs = 24_000, 2.0
    t = np.arange(int(sr * secs)) / sr
    y = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mel = dsp.s3gen_mel(y)
    assert mel.shape[1] == 80
    assert abs(mel.shape[0] - secs * 50) <= 2  # 50 fps
    assert np.isfinite(mel).all()


def test_kaldi_fbank_rate_and_tone():
    sr = 16_000
    t = np.arange(sr) / sr
    y = 0.3 * np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    fb = dsp.kaldi_fbank(y)
    assert fb.shape[1] == 80
    assert abs(fb.shape[0] - 98) <= 2  # snip_edges: (16000-400)/160 + 1
    # the band containing 1 kHz should dominate
    peak_band = fb.mean(axis=0).argmax()
    fbank = dsp.mel_filterbank_htk(sr, 512, 80, 20, 8000)
    band_freqs = np.linspace(0, sr / 2, 257)[fbank.argmax(axis=1)]
    assert 800 < band_freqs[peak_band] < 1300


def test_resample_tone_preserved():
    sr1, sr2 = 24_000, 16_000
    t = np.arange(sr1) / sr1
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    z = dsp.resample(y, sr1, sr2)
    assert abs(len(z) - sr2) <= 2
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(z))
    peak_hz = spec.argmax() * sr2 / len(z)
    assert abs(peak_hz - 440) < 5


def test_voice_encoder_mel_shape():
    y = np.random.default_rng(0).standard_normal(16_000).astype(np.float32)
    mel = dsp.voice_encoder_mel(y)
    assert mel.shape[1] == 40
    assert (mel >= 0).all()


def test_align_hard_caps_length():
    cfg = PostProcessConfig()
    wav = np.ones(24_000, np.float32)
    out = align_hard(wav, n_tokens=10, cfg=cfg)  # 10 tokens = 0.4 s = 9600
    assert len(out) == 9600


def test_rms_tail_trim_removes_silence():
    cfg = PostProcessConfig()
    sr = 24_000
    wav = np.concatenate([
        0.5 * np.sin(np.linspace(0, 800 * np.pi, sr)).astype(np.float32),
        np.zeros(sr, np.float32)])
    out = rms_tail_trim(wav, cfg)
    assert sr * 0.9 < len(out) < sr * 1.2


def test_postprocess_chain_runs():
    cfg = PostProcessConfig(vad_trim=True)
    wav = 0.1 * np.random.default_rng(1).standard_normal(48_000).astype(np.float32)
    out = postprocess_wav(wav, n_tokens=50, cfg=cfg)
    assert len(out) <= 50 * 960  # 50 tokens at 960 samples/token
