"""CAMPPlus x-vector speaker encoder (192-d embedding for S3Gen).

Parity target: reference s3gen/xvector.py (CAMPPlus :340-428, FCM :94-127,
CAMDenseTDNN* :234-310, CAMLayer :195-231, StatsPool :146-157).  Runs on
80-bin Kaldi fbank features with per-utterance mean subtraction
(extract_feature :45-58).

TPU-native notes: channels-last; BatchNorm layers are inference-only and
stored pre-folded as (scale, bias) pairs (the loader folds running stats —
there is no training path here, conditioning is amortized per voice).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.layers import Conv1d


class FoldedBN(nn.Module):
    """Inference BatchNorm folded to y = x * scale + bias (per channel)."""
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


def bn_relu(x, name_prefix, parent):
    x = FoldedBN(name=f"{name_prefix}_bn")(x)
    return jax.nn.relu(x)


class BasicResBlock2D(nn.Module):
    """2D residual block over (freq, time) maps [B, F, T, C]
    (xvector.py:61-91)."""
    planes: int
    stride: int = 1
    in_planes: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1),
                    padding=1, use_bias=False, name="conv1")(x)
        h = jax.nn.relu(FoldedBN(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = FoldedBN(name="bn2")(h)
        if self.stride != 1 or self.in_planes != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1),
                         use_bias=False, name="shortcut_conv")(x)
            sc = FoldedBN(name="shortcut_bn")(sc)
        else:
            sc = x
        return jax.nn.relu(h + sc)


class FCM(nn.Module):
    """2D conv head: [B, T, 80] -> [B, T, 32 * 10] (xvector.py:94-127)."""
    m_channels: int = 32

    @nn.compact
    def __call__(self, x):
        # [B, T, F] -> [B, F, T, 1] (freq as H, time as W)
        h = x.transpose(0, 2, 1)[..., None]
        h = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False,
                    name="conv1")(h)
        h = jax.nn.relu(FoldedBN(name="bn1")(h))
        for li, stride_first in ((1, True), (2, True)):
            for bi in range(2):
                h = BasicResBlock2D(self.m_channels,
                                    stride=2 if bi == 0 else 1,
                                    in_planes=self.m_channels,
                                    name=f"layer{li}_{bi}")(h)
        h = nn.Conv(self.m_channels, (3, 3), strides=(2, 1), padding=1,
                    use_bias=False, name="conv2")(h)
        h = jax.nn.relu(FoldedBN(name="bn2")(h))
        # [B, F/8, T, C] -> [B, T, C * F/8]
        B, F8, T, C = h.shape
        return h.transpose(0, 2, 3, 1).reshape(B, T, C * F8)


class CAMLayer(nn.Module):
    """Context-aware mask conv (xvector.py:195-231)."""
    out_channels: int
    kernel_size: int
    dilation: int
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = Conv1d(self.out_channels, self.kernel_size, padding=pad,
                   dilation=self.dilation, use_bias=False,
                   name="linear_local")(x)
        # global + segment average context
        gctx = jnp.mean(x, axis=1, keepdims=True)
        T = x.shape[1]
        n_seg = -(-T // self.seg_len)
        pad_t = n_seg * self.seg_len - T
        xp = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        seg = xp.reshape(x.shape[0], n_seg, self.seg_len, x.shape[2])
        # ceil-mode avg pool: last segment averages only its valid frames
        counts = jnp.full((n_seg,), self.seg_len, jnp.float32)
        counts = counts.at[-1].set(self.seg_len - pad_t if pad_t else self.seg_len)
        seg = jnp.sum(seg, axis=2) / counts[None, :, None]
        seg = jnp.repeat(seg, self.seg_len, axis=1)[:, :T]
        ctx = gctx + seg
        m = jax.nn.relu(nn.Dense(x.shape[-1] // 2, name="linear1")(ctx))
        m = jax.nn.sigmoid(nn.Dense(self.out_channels, name="linear2")(m))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(FoldedBN(name="nonlinear1_bn")(x))
        h = nn.Dense(self.bn_channels, use_bias=False, name="linear1")(h)
        h = jax.nn.relu(FoldedBN(name="nonlinear2_bn")(h))
        return CAMLayer(self.out_channels, self.kernel_size, self.dilation,
                        name="cam_layer")(h)


class CAMPPlus(nn.Module):
    """[B, T, 80] mean-normalized fbank -> [B, 192] x-vector."""
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128

    @nn.compact
    def __call__(self, feats):
        h = FCM(name="head")(feats)
        # TDNN stem: conv k=5 stride=2, pad 2
        h = Conv1d(self.init_channels, 5, stride=2, padding=2, use_bias=False,
                   name="tdnn_linear")(h)
        h = jax.nn.relu(FoldedBN(name="tdnn_bn")(h))

        channels = self.init_channels
        for bi, (num_layers, k, d) in enumerate(
                zip((12, 24, 16), (3, 3, 3), (1, 2, 2)), start=1):
            for li in range(num_layers):
                out = CAMDenseTDNNLayer(
                    self.growth_rate, self.bn_size * self.growth_rate, k, d,
                    name=f"block{bi}_tdnnd{li + 1}")(h)
                h = jnp.concatenate([h, out], axis=-1)
            channels += num_layers * self.growth_rate
            h = jax.nn.relu(FoldedBN(name=f"transit{bi}_bn")(h))
            h = nn.Dense(channels // 2, use_bias=False,
                         name=f"transit{bi}_linear")(h)
            channels //= 2

        h = jax.nn.relu(FoldedBN(name="out_bn")(h))
        # stats pooling over time (unbiased std, xvector.py:146-152)
        mean = jnp.mean(h, axis=1)
        var = jnp.sum((h - mean[:, None]) ** 2, axis=1) / (h.shape[1] - 1)
        stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
        emb = nn.Dense(self.embedding_size, use_bias=False,
                       name="dense_linear")(stats)
        return FoldedBN(name="dense_bn")(emb)
