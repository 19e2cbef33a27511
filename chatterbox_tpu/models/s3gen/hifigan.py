"""HiFTNet vocoder: NSF harmonic source + iSTFTNet head, batched for TPU.

Parity target: reference s3gen/hifigan.py (HiFTGenerator :286-474, SineGen
:169-231, SourceModuleHnNSF :234-283, ResBlock :106-166, Snake :34-84) and
s3gen/f0_predictor.py (ConvRNNF0Predictor).  Wiring from s3gen.py:237-245:
upsample rates (8,5,3) kernel (16,11,7), source resblocks k (7,7,11),
istft n_fft 16 hop 4, 8 harmonics, 24 kHz.

TPU-native notes: channels-last everywhere; the iSTFT head runs as framing +
DFT matmul + identity-kernel conv-transpose overlap-add (ops/stft.py) instead
of cuFFT; SineGen's phase integral is frame-decomposed — f0 is piecewise-
constant over each 480-sample upsample frame, so the sample-rate cumsum
factors exactly into a frame-level f32 cumsum plus an intra-frame ramp
(F serial adds instead of F*480), and the post-sin tensors drop to the
compute dtype.  Weight-norm convs are folded into plain convs at load time.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import S3GenConfig
from ...ops.stft import hann_window, istft, stft_realimag
from ...utils.layers import Conv1d, ConvTranspose1d, snake


class ConvRNNF0Predictor(nn.Module):
    """mel -> f0 (Hz): 5 x (conv k3 + ELU) + linear classifier + abs
    (f0_predictor.py:19-55)."""
    cfg: S3GenConfig

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        x = mel
        for i in range(5):
            x = Conv1d(c.f0_cond_channels, 3, padding=1, name=f"condnet_{i}")(x)
            x = jax.nn.elu(x)
        f0 = nn.Dense(1, name="classifier")(x)[..., 0]
        return jnp.abs(f0)


class ResBlock(nn.Module):
    """BigVGAN-style residual block with Snake activations
    (hifigan.py:106-166)."""
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x, mask=None):
        """mask: optional [B, T, 1] validity mask applied after each conv so
        conv biases can't leak pad-region context into valid frames."""
        m = (lambda t: t if mask is None else t * mask)
        for i, d in enumerate(self.dilations):
            a1 = self.param(f"alpha1_{i}", nn.initializers.ones, (self.channels,))
            a2 = self.param(f"alpha2_{i}", nn.initializers.ones, (self.channels,))
            pad1 = (self.kernel_size * d - d) // 2
            pad2 = (self.kernel_size - 1) // 2
            h = snake(x, a1)
            h = m(Conv1d(self.channels, self.kernel_size, padding=pad1,
                         dilation=d, name=f"convs1_{i}")(h))
            h = snake(h, a2)
            h = m(Conv1d(self.channels, self.kernel_size, padding=pad2,
                         name=f"convs2_{i}")(h))
            x = x + h
        return x


def sine_source(f0, rngs, sample_rate: float, n_harmonics: int,
                sine_amp: float, noise_std: float, voiced_threshold: float,
                frame: int = 480, dtype=jnp.float32):
    """SineGen + harmonic merge input (hifigan.py:169-231).

    f0: [B, F] per-FRAME f0 in Hz (the reference upsamples to sample rate
    before integrating; since f0 is piecewise-constant over ``frame``
    samples, the sample-rate cumsum decomposes exactly into a frame-level
    cumsum plus an intra-frame ramp — F serial adds instead of F*480, and
    the [B, F*480] f32 repeat buffer never materializes).  rngs: [B]
    per-request PRNG keys.  Returns sine waves [B, T, H+1] and uv [B, T, 1]
    in ``dtype`` (phase math stays f32; post-``sin`` values are O(1) so the
    cast costs no audible precision at bf16).

    Noise is drawn per (request-key, frame-index) with fixed-size frame
    chunks, so a request's source noise is identical whether it is vocoded
    solo, in a batch, or with extra right-padding (length-invariance the
    reference doesn't need at batch 1).

    Phase = 2*pi * frac(cumsum(f0 * (h+1) / sr)); all harmonics share the
    fundamental's integral (scaled), so we integrate f0 once and scale
    per-harmonic — fewer cumsums, identical math.
    """
    harmonics = jnp.arange(1, n_harmonics + 2, dtype=jnp.float32)  # [H+1]
    f32 = f0.astype(jnp.float32)
    # exclusive frame-level integral + per-sample ramp within each frame
    prev = jnp.cumsum(f32, axis=-1) - f32                      # [B, F]
    ramp = jnp.arange(1, frame + 1, dtype=jnp.float32)         # [frame]
    base = (prev[..., None] * frame + f32[..., None] * ramp) / sample_rate
    theta = 2.0 * jnp.pi * jnp.mod(base[..., None] * harmonics, 1.0)
    B, n_frames = f0.shape
    T = n_frames * frame
    theta = theta.reshape(B, T, -1)

    def draw(key):
        kp, kn = jax.random.split(key)
        ph = jax.random.uniform(kp, (1, n_harmonics + 1),
                                minval=-np.pi, maxval=np.pi)
        ph = ph.at[:, 0].set(0.0)  # fundamental keeps zero phase
        nz = jax.vmap(lambda f: jax.random.normal(
            jax.random.fold_in(kn, f), (frame, n_harmonics + 1)))(
            jnp.arange(n_frames))
        return ph, nz.reshape(T, n_harmonics + 1)

    phase, noise_unit = jax.vmap(draw)(rngs)

    sines = (sine_amp * jnp.sin(theta + phase)).astype(dtype)
    uv_f = (f0 > voiced_threshold).astype(dtype)[..., None]     # [B, F, 1]
    noise_amp = uv_f * noise_std + (1.0 - uv_f) * (sine_amp / 3.0)
    # frame-constant factors broadcast over the intra-frame axis
    uv = jnp.repeat(uv_f, frame, axis=1)                        # [B, T, 1]
    namp = jnp.repeat(noise_amp, frame, axis=1)
    return sines * uv + namp * noise_unit.astype(dtype), uv


class HiFTGenerator(nn.Module):
    """NSF + iSTFTNet generator (hifigan.py:286-474)."""
    cfg: S3GenConfig

    @nn.compact
    def __call__(self, mel, rngs, valid_frames=None):
        """mel: [B, F, n_mels] channels-last; rngs: [B] per-request PRNG keys
        for the NSF source noise; valid_frames: optional [B] valid mel-frame
        counts — activations beyond a request's valid region are re-zeroed at
        every stage so batched/padded vocoding is bit-identical to exact-size
        runs (conv biases would otherwise turn pad frames into nonzero
        context; the batch-1 reference never pads).
        Returns ([B, F*480] wav, [B, F*480] source)."""
        c = self.cfg
        base = c.hift_base_channels
        F = mel.shape[1]
        up_prod = int(np.prod(c.upsample_rates)) * c.istft_hop  # 480

        def keep_mask(n, rate, off=0, dtype=mel.dtype):
            if valid_frames is None:
                return None
            keep = jnp.arange(n)[None, :] < valid_frames[:, None] * rate + off
            return keep[..., None].astype(dtype)

        def vmask(t, rate, off=0):
            km = keep_mask(t.shape[1], rate, off, t.dtype)
            return t if km is None else t * km

        # mel -> f0 -> per-sample source signal (sine_source integrates the
        # frame-constant f0 itself; no [B, F*480] upsampled f0 buffer)
        f0 = ConvRNNF0Predictor(c, name="f0_predictor")(mel)        # [B, F]
        sines, _uv = sine_source(
            f0, rngs, 24_000.0, c.hift_nb_harmonics, c.nsf_alpha,
            c.nsf_sigma, c.nsf_voiced_threshold, frame=up_prod,
            dtype=mel.dtype)
        s = jnp.tanh(nn.Dense(1, name="m_source_linear")(sines))[..., 0]
        if valid_frames is not None:
            s = s * (jnp.arange(s.shape[1])[None, :]
                     < valid_frames[:, None] * up_prod).astype(s.dtype)

        # source STFT (torch.stft center=True): [B, n_fft+2, T/4+1] channels
        window = jnp.asarray(hann_window(c.istft_n_fft))
        s_real, s_imag = stft_realimag(s, window, c.istft_n_fft, c.istft_hop)
        s_stft = jnp.concatenate([s_real, s_imag], axis=1).transpose(0, 2, 1)
        # [B, T/4 + 1, n_fft + 2].  rfft always yields f32; without this
        # cast the f32 source promotes every sample-rate resblock after the
        # x + si injection to f32 (~10% of vocode time at bf16 params).
        s_stft = s_stft.astype(mel.dtype)

        x = vmask(Conv1d(base, 7, padding=3, name="conv_pre")(mel), 1)
        down_cum = np.cumprod([1] + list(c.upsample_rates[::-1][:-1]))[::-1]
        n_up = len(c.upsample_rates)
        rate = 1
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = base // (2 ** (i + 1))
            rate *= u
            off = 0
            x = jax.nn.leaky_relu(x, negative_slope=c.lrelu_slope)
            x = ConvTranspose1d(ch, k, u, padding=(k - u) // 2,
                                name=f"ups_{i}")(x)
            if i == n_up - 1:
                x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="reflect")
                off = 1   # the left reflect pad shifts the valid window by 1
            x = vmask(x, rate, off)

            du = int(down_cum[i])
            if du == 1:
                si = Conv1d(ch, 1, name=f"source_downs_{i}")(s_stft)
            else:
                si = Conv1d(ch, du * 2, stride=du, padding=du // 2,
                            name=f"source_downs_{i}")(s_stft)
            si = si[:, : x.shape[1]]
            km = keep_mask(x.shape[1], rate, off, x.dtype)
            si = ResBlock(ch, c.source_resblock_kernel_sizes[i],
                          c.source_resblock_dilations[i],
                          name=f"source_resblocks_{i}")(si if km is None else si * km, km)
            x = vmask(x + si, rate, off)

            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilations)):
                r = ResBlock(ch, rk, rd, name=f"resblocks_{i}_{j}")(x, km)
                acc = r if acc is None else acc + r
            x = vmask(acc / len(c.resblock_kernel_sizes), rate, off)

        x = jax.nn.leaky_relu(x)
        x = Conv1d(c.istft_n_fft + 2, 7, padding=3, name="conv_post")(x)
        n_bins = c.istft_n_fft // 2 + 1
        magnitude = jnp.exp(jnp.minimum(x[..., :n_bins], np.log(1e2)))
        phase = jnp.sin(x[..., n_bins:])

        real = (magnitude * jnp.cos(phase)).transpose(0, 2, 1)
        imag = (magnitude * jnp.sin(phase)).transpose(0, 2, 1)
        if valid_frames is not None:
            # Zero pad-region spectra so the overlap-add only sees valid
            # frames.  (The WOLA denominator still differs from an exact-size
            # run in the last n_fft - hop samples — a <=0.5 ms boundary
            # region that downstream tail-trimming removes.)
            km = keep_mask(real.shape[2], int(np.prod(c.upsample_rates)), 1,
                           real.dtype)[..., 0]
            real = real * km[:, None, :]
            imag = imag * km[:, None, :]
        wav = istft(real, imag, window, c.istft_n_fft, c.istft_hop)
        wav = jnp.clip(wav, -c.audio_limit, c.audio_limit)
        return wav, s
