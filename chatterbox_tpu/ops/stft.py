"""STFT / iSTFT primitives for TPU (no cuFFT: framing gathers + FFT matmuls).

Replaces the reference's torch.stft/istft uses (SURVEY §2.12): the HiFTNet
iSTFT head (n_fft=16 — tiny, done as DFT matmuls that land on the MXU), the
24 kHz mel extractor (n_fft=1920) and the 16 kHz tokenizer mel (n_fft=400).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window / scipy get_window('hann', fftbins=True) equivalent."""
    m = n if periodic else n - 1
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / m)).astype(np.float32)


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[B, T] -> [B, n_frames, frame_len] strided frames.

    When hop divides both frame_len and T, framing is a pure relayout:
    reshape to hop-blocks and concatenate k = frame_len/hop shifted block
    slices — XLA lowers this near memcpy speed.  The general gather path
    (irregular index matrix) measured 10.75 ms/call on the HiFTNet source
    STFT ([8, 480016] @ n_fft 16 / hop 4); identical values either way.
    """
    T = x.shape[-1]
    n_frames = 1 + (T - frame_len) // hop
    if frame_len % hop == 0 and T % hop == 0:
        k = frame_len // hop
        b = x.reshape(x.shape[0], T // hop, hop)
        return jnp.concatenate(
            [b[:, i:i + n_frames] for i in range(k)], axis=-1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[:, idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def stft_realimag(x: jnp.ndarray, window: jnp.ndarray, n_fft: int, hop: int,
                  center: bool = True):
    """torch.stft equivalent returning (real, imag) of shape [B, F, n_frames].

    center=True reflect-pads n_fft//2 on both sides (torch default).
    """
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    frames = frame_signal(x, n_fft, hop) * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)          # [B, n_frames, n_fft//2+1]
    return (jnp.real(spec).transpose(0, 2, 1),
            jnp.imag(spec).transpose(0, 2, 1))


def _ola_kernel(frame_len: int) -> np.ndarray:
    """Flipped-identity kernel so conv_transpose scatters channel i to output
    offset i: K[L-1-i, i, 0] = 1 (jax conv_transpose does not flip)."""
    k = np.zeros((frame_len, frame_len, 1), np.float32)
    for i in range(frame_len):
        k[frame_len - 1 - i, i, 0] = 1.0
    return k


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[B, N, L] frames -> [B, (N-1)*hop + L] overlap-added signal via a
    fixed identity conv_transpose (XLA-friendly scatter-free OLA)."""
    L = frames.shape[-1]
    kernel = jnp.asarray(_ola_kernel(L))
    y = jax.lax.conv_transpose(
        frames, kernel, strides=(hop,), padding=[(L - 1, L - 1)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y[..., 0]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def istft(real: jnp.ndarray, imag: jnp.ndarray, window: jnp.ndarray,
          n_fft: int, hop: int) -> jnp.ndarray:
    """torch.istft equivalent (center=True semantics): WOLA with window^2
    normalization, trims n_fft//2 from both ends.

    real/imag: [B, n_fft//2+1, N].  Returns [B, (N-1)*hop] samples.
    """
    spec = real + 1j * imag
    frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=n_fft, axis=-1)
    frames = frames * window[None, None, :]
    y = overlap_add(frames, hop)

    n = frames.shape[1]
    wsq = jnp.broadcast_to((window * window)[None, None, :], (1, n, n_fft))
    denom = overlap_add(wsq, hop)
    y = y / jnp.maximum(denom, 1e-11)
    half = n_fft // 2
    return y[:, half:-half] if half else y


def rfft_matrices(n_fft: int) -> tuple:
    """Real/imag DFT matrices [n_fft, n_fft//2+1] for matmul-based tiny FFTs
    (the HiFT head's n_fft=16 maps better to the MXU than an FFT op)."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)
