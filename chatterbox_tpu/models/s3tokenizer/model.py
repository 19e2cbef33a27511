"""S3 speech tokenizer (speech_tokenizer_v2_25hz): 16 kHz wav -> 25 Hz
discrete speech tokens, vocab 6561 = 3^8 (FSQ over 8 dims x 3 levels).

The reference wraps the external `s3tokenizer` pip package
(models/s3tokenizer/s3tokenizer.py:22-126): a quantizing Whisper-style speech
encoder.  That package is not vendored here; this module implements the same
contract natively in JAX:

  * input: 128-bin log-mel at 100 fps (audio/dsp.py:s3_tokenizer_mel, matching
    the package's whisper-style mel: n_fft 400, hop 160, log10 + dynamic-range
    compression),
  * conv downsample x4 (100 fps -> 25 Hz) + transformer encoder,
  * finite-scalar quantization to 8 base-3 digits -> token id in [0, 6561).

Layer dims are configurable so the loader can adapt when real checkpoint
shapes are available; the token-rate / vocab contract (SPEECH_VOCAB_SIZE 6561,
25 tok/s — s3tokenizer.py:14-19) is what the rest of the pipeline depends on.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    dim: int = 1280
    n_heads: int = 20
    n_layers: int = 6
    fsq_dims: int = 8
    fsq_levels: int = 3

    @classmethod
    def tiny(cls):
        return cls(n_mels=16, dim=32, n_heads=2, n_layers=1)


def sinusoids(length: int, channels: int) -> jnp.ndarray:
    """Whisper-style fixed positional embedding."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(np.concatenate([np.sin(scaled), np.cos(scaled)],
                                      axis=1).astype(np.float32))


class EncoderBlock(nn.Module):
    dim: int
    n_heads: int

    @nn.compact
    def __call__(self, x, key_mask):
        d = self.dim // self.n_heads
        h = nn.LayerNorm(name="attn_ln")(x)
        B, T, _ = h.shape
        q = nn.Dense(self.dim, name="q")(h).reshape(B, T, self.n_heads, d)
        k = nn.Dense(self.dim, use_bias=False, name="k")(h).reshape(B, T, self.n_heads, d)
        v = nn.Dense(self.dim, name="v")(h).reshape(B, T, self.n_heads, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(d))
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, self.dim)
        x = x + nn.Dense(self.dim, name="out")(o)
        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(self.dim * 4, name="mlp_in")(h)
        h = jax.nn.gelu(h)
        return x + nn.Dense(self.dim, name="mlp_out")(h)


class S3TokenizerV2(nn.Module):
    cfg: S3TokenizerConfig = S3TokenizerConfig()

    @nn.compact
    def __call__(self, mel, mel_len):
        """mel: [B, F, n_mels] at 100 fps; mel_len: [B].
        Returns (tokens [B, F//4], token_len [B])."""
        c = self.cfg
        x = nn.Conv(c.dim, (3,), padding=1, name="conv1")(mel)
        x = jax.nn.gelu(x)
        x = nn.Conv(c.dim, (3,), strides=(2,), padding=1, name="conv2")(x)
        x = jax.nn.gelu(x)
        x = nn.Conv(c.dim, (3,), strides=(2,), padding=1, name="conv3")(x)
        x = jax.nn.gelu(x)
        T = x.shape[1]
        x = x + sinusoids(T, c.dim).astype(x.dtype)[None]

        token_len = mel_len // 4
        mask = jnp.arange(T)[None, :] < token_len[:, None]
        for i in range(c.n_layers):
            x = EncoderBlock(c.dim, c.n_heads, name=f"blocks_{i}")(x, mask)
        x = nn.LayerNorm(name="ln_post")(x)

        # FSQ: project to 8 dims, bound to [-1, 1], round to 3 levels
        z = nn.Dense(c.fsq_dims, name="fsq_proj")(x)
        L = c.fsq_levels
        half = (L - 1) / 2.0
        bounded = jnp.tanh(z) * half                 # [-1, 1] scaled
        digits = jnp.round(bounded + half).astype(jnp.int32)  # {0..L-1}
        weights = (L ** jnp.arange(c.fsq_dims)).astype(jnp.int32)
        tokens = jnp.sum(digits * weights[None, None, :], axis=-1)
        tokens = jnp.where(mask, tokens, 0)
        return tokens, token_len
