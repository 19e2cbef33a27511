"""Voice encoder: 256-d speaker embedding for T3 conditioning.

Parity target: reference models/voice_encoder/voice_encoder.py (VoiceEncoder
:119-274): 3-layer LSTM(40 -> 256) + Linear(256 -> 256) + ReLU + L2 norm over
windowed 160-frame "partials" with overlap, mean-pooled and re-normalized.

TPU-native notes: the LSTM is a jax.lax.scan over time (SURVEY §2.12 "LSTM as
jax.lax.scan"); partial windowing/striding is host-side numpy
(audio/dsp.py feeds the 40-mel spectrogram).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LSTMLayer(nn.Module):
    """Single LSTM layer (torch gate order i, f, g, o) via lax.scan."""
    hidden: int

    @nn.compact
    def __call__(self, x):
        """x: [B, T, D] -> outputs [B, T, H], final h [B, H]."""
        B, T, D = x.shape
        H = self.hidden
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (D, 4 * H))
        w_hh = self.param("w_hh", nn.initializers.lecun_normal(), (H, 4 * H))
        b = self.param("bias", nn.initializers.zeros, (4 * H,))

        # Precompute input contributions in one big matmul (MXU-friendly).
        xw = jnp.einsum("btd,dh->bth", x, w_ih) + b

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
        (h_last, _), out = jax.lax.scan(step, init, xw.transpose(1, 0, 2))
        return out.transpose(1, 0, 2), h_last


class VoiceEncoder(nn.Module):
    num_mels: int = 40
    hidden: int = 256
    embed_size: int = 256

    @nn.compact
    def __call__(self, mels):
        """mels: [B, T, 40] partial windows.  Returns L2-normed [B, 256]."""
        x = mels
        h_last = None
        for i in range(3):
            x, h_last = LSTMLayer(self.hidden, name=f"lstm_{i}")(x)
        e = nn.Dense(self.embed_size, name="proj")(h_last)
        e = jax.nn.relu(e)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Host-side partials windowing (voice_encoder.py:54-116, 162-199)
# ---------------------------------------------------------------------------
VE_PARTIAL_FRAMES = 160


def get_num_wins(n_frames: int, step: int, min_coverage: float = 0.8):
    win = VE_PARTIAL_FRAMES
    n_wins, rem = divmod(max(n_frames - win + step, 0), step)
    if n_wins == 0 or (rem + (win - step)) / win >= min_coverage:
        n_wins += 1
    return n_wins, win + step * (n_wins - 1)


def get_frame_step(rate: float = 1.3, overlap: float = 0.5,
                   sample_rate: int = 16_000):
    if rate is None:
        return int(round(VE_PARTIAL_FRAMES * (1 - overlap)))
    return int(round((sample_rate / rate) / VE_PARTIAL_FRAMES))


def mel_to_partials(mel: np.ndarray, rate: float = 1.3) -> np.ndarray:
    """[T, 40] -> [n_partials, 160, 40] overlapping windows."""
    step = get_frame_step(rate)
    n_wins, target = get_num_wins(len(mel), step)
    if target > len(mel):
        mel = np.concatenate(
            [mel, np.zeros((target - len(mel), mel.shape[1]), mel.dtype)])
    return np.stack([mel[i * step: i * step + VE_PARTIAL_FRAMES]
                     for i in range(n_wins)])


def pool_partial_embeds(partial_embeds: np.ndarray) -> np.ndarray:
    """Mean-pool partial embeddings -> utterance embedding, L2-normed
    (voice_encoder.py:193-199)."""
    e = partial_embeds.mean(axis=0)
    return e / np.linalg.norm(e)
