"""Shared TPU-friendly layer primitives for the S3Gen / vocoder stacks.

Everything operates channels-last ([B, T, C]) — the layout XLA prefers on TPU
(lane dimension = channels).  The reference's torch modules are channels-first
([B, C, T]); weight loaders transpose accordingly.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def snake(x, alpha):
    """Snake activation x + sin^2(alpha x)/alpha (reference hifigan.py:34-84).
    alpha: [C] broadcast over [B, T, C]."""
    a = alpha[None, None, :]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


class Conv1d(nn.Module):
    """1D conv over [B, T, C] with torch-compatible 'same'-style integer
    padding (torch Conv1d padding=p pads both sides by p)."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            name="conv",
        )(x)


class CausalConv1d(nn.Module):
    """Left-padded causal conv (reference decoder.py CausalConv1d:71-97)."""
    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        # asymmetric left pad expressed inside the conv op — an explicit
        # jnp.pad materializes a shifted copy of the activation per call
        # (measured ~280 ms of pad HLOs per batch-16 vocode)
        pad = (self.kernel_size - 1) * self.dilation
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            padding=[(pad, 0)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            name="conv",
        )(x)


class ConvTranspose1d(nn.Module):
    """Transposed conv matching torch ConvTranspose1d(kernel, stride, padding)
    semantics: out_len = (in_len - 1) * stride - 2 * padding + kernel."""
    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        # transpose_kernel=True: kernel laid out as the forward conv being
        # transposed -> [k, features_out, features_in] (matches torch
        # ConvTranspose1d weight [in, out, k] transposed (2,1,0))
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, self.features, x.shape[-1]))
        y = jax.lax.conv_transpose(
            x, kernel.astype(x.dtype), strides=(s,),
            padding=[(k - 1 - p, k - 1 - p)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def nearest_upsample(x, factor: int):
    """Nearest-neighbour upsample along time: [B, T, C] -> [B, T*factor, C]
    (reference F.interpolate mode='nearest')."""
    return jnp.repeat(x, factor, axis=1)


def make_length_mask(lengths, max_len: int):
    """[B] lengths -> [B, max_len] bool validity mask."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def masked_softmax_attention(q, k, v, mask, extra_scores=None):
    """Plain MHA core: q [B,H,Tq,D], k/v [B,H,Tk,D], mask [B,1|H,Tq,Tk] bool.
    Returns [B,H,Tq,D]."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if extra_scores is not None:
        scores = scores + extra_scores
    scores = scores / jnp.sqrt(jnp.float32(d))
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(mask, probs, 0.0).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
