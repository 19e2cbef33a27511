"""S3 speech tokenizer (speech_tokenizer_v2_25hz): 16 kHz wav -> 25 Hz
discrete speech tokens, vocab 6561 = 3^8 (FSQ over 8 dims x 3 levels).

The reference wraps the external ``s3tokenizer`` pip package's
``S3TokenizerV2`` (reference models/s3tokenizer/s3tokenizer.py:22-126 builds
``S3TokenizerV2("speech_tokenizer_v2_25hz")`` and feeds it whisper-style
128-bin log-mels).  Its pretrained weights ship inside the reference's
``s3gen.safetensors`` under ``tokenizer.*`` (the reference's S3Token2Wav owns
``self.tokenizer``, s3gen.py:55, and loads the full state dict with the mel
filter/window buffers excused via ``ignore_state_dict_missing``,
s3tokenizer.py:29).  This module is that model natively in JAX:

  * ``conv1`` (stride 2) + ``conv2`` (stride 2): 100 fps mel -> 25 Hz frames,
    GELU after each, padded region zeroed before each conv;
  * fixed sinusoidal positional embedding (whisper style);
  * N residual attention blocks whose attention carries an FSMN memory
    branch: a depthwise conv (kernel 31, no bias) over the value stream,
    added to the attention output;
  * FSQ quantizer: ``project_down`` Linear(dim -> 8), tanh, scale 0.999,
    round to {-1,0,1}, shift to {0,1,2}, base-3 positional encode -> token
    id in [0, 6561).

Layer count / widths are **derived from the checkpoint shapes** by
``weights.convert_s3tokenizer_params`` (defaults below match the published
speech_tokenizer_v2_25hz: dim 1280, 20 heads, 6 layers); the token-rate /
vocab contract (SPEECH_VOCAB_SIZE 6561, 25 tok/s — s3tokenizer.py:14-19) is
what the rest of the pipeline depends on.
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
    fsmn_kernel: int = 31
    fsq_dims: int = 8
    fsq_levels: int = 3
    ln_post: bool = False      # set by the loader if the checkpoint has one

    @classmethod
    def tiny(cls):
        return cls(n_mels=16, dim=32, n_heads=2, n_layers=1, fsmn_kernel=7)


def sinusoids(length: int, channels: int) -> jnp.ndarray:
    """Whisper-style fixed positional embedding."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(np.concatenate([np.sin(scaled), np.cos(scaled)],
                                      axis=1).astype(np.float32))


class FSMNAttention(nn.Module):
    """Whisper-style MHA + FSMN memory branch over the value stream.

    Matches the package's FSMNMultiHeadAttention: q/k both scaled by
    d_head**-0.25, key projection bias-free, depthwise conv memory (kernel
    ``fsmn_kernel``, symmetric pad, no bias) computed on masked V and added
    to the attention output AFTER the out projection.
    """
    dim: int
    n_heads: int
    fsmn_kernel: int = 31

    @nn.compact
    def __call__(self, x, key_mask):
        B, T, _ = x.shape
        d = self.dim // self.n_heads
        q = nn.Dense(self.dim, name="query")(x)
        k = nn.Dense(self.dim, use_bias=False, name="key")(x)
        v = nn.Dense(self.dim, name="value")(x)

        # FSMN memory: depthwise conv over masked V, residual, re-masked
        m = key_mask[..., None].astype(v.dtype)
        vm = v * m
        pad = self.fsmn_kernel - 1
        mem = nn.Conv(self.dim, (self.fsmn_kernel,),
                      padding=[(pad - pad // 2, pad // 2)],
                      feature_group_count=self.dim, use_bias=False,
                      name="fsmn_block")(vm)
        mem = (mem + vm) * m

        scale = jnp.asarray(d, jnp.float32) ** -0.25
        qh = (q.reshape(B, T, self.n_heads, d) * scale).astype(x.dtype)
        kh = (k.reshape(B, T, self.n_heads, d) * scale).astype(x.dtype)
        vh = v.reshape(B, T, self.n_heads, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e10)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, T, self.dim)
        return nn.Dense(self.dim, name="out")(o) + mem


class ResidualAttentionBlock(nn.Module):
    dim: int
    n_heads: int
    fsmn_kernel: int = 31

    @nn.compact
    def __call__(self, x, key_mask):
        h = nn.LayerNorm(epsilon=1e-5, name="attn_ln")(x)
        x = x + FSMNAttention(self.dim, self.n_heads, self.fsmn_kernel,
                              name="attn")(h, key_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="mlp_ln")(x)
        h = nn.Dense(self.dim * 4, name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, name="mlp_2")(h)


class S3TokenizerV2(nn.Module):
    cfg: S3TokenizerConfig = S3TokenizerConfig()

    @nn.compact
    def __call__(self, mel, mel_len):
        """mel: [B, F, n_mels] at 100 fps; mel_len: [B].
        Returns (tokens [B, ceil(F/4)], token_len [B])."""
        c = self.cfg
        F = mel.shape[1]
        m0 = (jnp.arange(F)[None, :] < mel_len[:, None])[..., None]
        x = nn.Conv(c.dim, (3,), strides=(2,), padding=[(1, 1)],
                    name="conv1")(mel * m0.astype(mel.dtype))
        x = jax.nn.gelu(x, approximate=False)
        len1 = (mel_len + 1) // 2
        m1 = (jnp.arange(x.shape[1])[None, :] < len1[:, None])[..., None]
        x = nn.Conv(c.dim, (3,), strides=(2,), padding=[(1, 1)],
                    name="conv2")(x * m1.astype(x.dtype))
        x = jax.nn.gelu(x, approximate=False)
        token_len = (len1 + 1) // 2

        T = x.shape[1]
        x = x + sinusoids(T, c.dim).astype(x.dtype)[None]
        mask = jnp.arange(T)[None, :] < token_len[:, None]
        for i in range(c.n_layers):
            x = ResidualAttentionBlock(
                c.dim, c.n_heads, c.fsmn_kernel, name=f"blocks_{i}")(x, mask)
        if c.ln_post:
            x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)

        # FSQ encode (package FSQCodebook.encode): project to 8 dims,
        # tanh * 0.999 -> round to {-1,0,1} -> {0,1,2}, base-3 combine
        z = nn.Dense(c.fsq_dims, name="project_down")(x)
        h = jnp.tanh(z.astype(jnp.float32)) * 0.9990000128746033
        digits = jnp.round(h).astype(jnp.int32) + (c.fsq_levels - 1) // 2
        weights = (c.fsq_levels ** jnp.arange(c.fsq_dims)).astype(jnp.int32)
        tokens = jnp.sum(digits * weights[None, None, :], axis=-1)
        tokens = jnp.where(mask, tokens, 0)
        return tokens, token_len
