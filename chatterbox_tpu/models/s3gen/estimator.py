"""CFM velocity-field estimator (causal conv/transformer hybrid U-Net).

Parity target: reference s3gen/decoder.py (ConditionalDecoder :100-317) with
matcha building blocks (matcha/decoder.py: SinusoidalPosEmb, Block1D,
ResnetBlock1D, TimestepEmbedding) and matcha/transformer.py
(BasicTransformerBlock — plain LayerNorm + self-attention + gelu FF variant).

Configured as in s3gen.py:76-87: in 320ch = pack(x 80, mu 80, spks 80, cond
80), channels=[256] (a single stage, so the 'down/up sample' convs are
stride-1 causal convs — time resolution never changes), 12 mid blocks, 4
transformer blocks per stage, 8 heads x 64 head-dim.

TPU-native: channels-last, fully batched + length-masked (reference estimator
runs batch-2 only for its internal CFG doubling).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import S3GenConfig
from ...utils.layers import CausalConv1d, Conv1d, masked_softmax_attention, mish


def sinusoidal_time_emb(t, dim: int, scale: float = 1000.0):
    """matcha SinusoidalPosEmb (matcha/decoder.py:14-29); t: [B]."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * -(jnp.log(10000.0) / (half - 1)))
    ang = scale * t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimestepEmbedding(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.dim_out, name="linear_1")(t_emb)
        x = jax.nn.silu(x)
        return nn.Dense(self.dim_out, name="linear_2")(x)


class CausalBlock1D(nn.Module):
    """CausalConv1d(k=3) -> LayerNorm -> Mish, with mask in/out
    (decoder.py:48-61)."""
    dim_out: int

    @nn.compact
    def __call__(self, x, mask):
        y = CausalConv1d(self.dim_out, 3, name="conv")(x * mask)
        y = nn.LayerNorm(name="norm")(y)
        return mish(y) * mask


class CausalResnetBlock1D(nn.Module):
    """Two causal blocks with a time-embedding shift and 1x1 residual
    (decoder.py:64-68, matcha/decoder.py:46-61)."""
    dim_out: int

    @nn.compact
    def __call__(self, x, mask, t):
        h = CausalBlock1D(self.dim_out, name="block1")(x, mask)
        h = h + nn.Dense(self.dim_out, name="mlp")(mish(t))[:, None, :]
        h = CausalBlock1D(self.dim_out, name="block2")(h, mask)
        return h + Conv1d(self.dim_out, 1, name="res_conv")(x * mask)


class TransformerBlock(nn.Module):
    """Self-attention + gelu-FF block (matcha/transformer.py
    BasicTransformerBlock with norm_type='layer_norm', no cross-attn).

    Attention runs through the Pallas flash kernel by default
    (ops/flash_attention.py; S3GenConfig.use_flash_attention=True) — with
    bq=256+/whole-T k blocks it measures ~6x faster than XLA's
    materialized [B,H,T,T] scores at vocoder shapes (docs/PERF.md,
    "S3Gen fixed this round").  Set use_flash_attention=False to fall
    back to plain XLA attention (e.g. for CPU parity debugging)."""
    dim: int
    n_heads: int
    head_dim: int
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, key_mask, lengths=None):
        B, T, _ = x.shape
        inner = self.n_heads * self.head_dim
        h = nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, name="to_v")(h)
        q = q.reshape(B, T, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        if (self.use_flash and lengths is not None
                and jax.default_backend() == "tpu"):
            from ...ops.flash_attention import flash_self_attention
            attn = flash_self_attention(q, k, v, lengths)
        else:
            attn = masked_softmax_attention(q, k, v, key_mask[:, None, None, :])
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, inner)
        x = x + nn.Dense(self.dim, name="to_out")(attn)

        h = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(self.dim * 4, name="ff_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="ff_out")(h)
        return x + h


class ConditionalDecoder(nn.Module):
    """The velocity estimator v(x_t, t | mu, spks, cond)."""
    cfg: S3GenConfig

    @nn.compact
    def __call__(self, x, mask, mu, t, spks, cond, lengths=None):
        """
        x, mu, cond: [B, T, n_mels]; spks: [B, n_mels]; t: [B];
        mask: [B, T] bool (contiguous prefix); lengths: optional [B] valid
        frame counts (enables the flash-attention path).
        Returns [B, T, n_mels].
        """
        c = self.cfg
        ch = c.est_channels
        time_dim = ch * 4

        # Pad the time axis ONCE to the flash kernel's 128-frame grid: the
        # per-block flash wrapper otherwise pads q/k/v and slices the
        # output on EVERY invocation — 48 blocks x 10 Euler steps x 3 pads
        # measured ~120 ms/call of pure pad/slice/copy traffic at
        # T=1000->1024 (tools/profile_s3gen.py, round 4).  Everything in
        # the trunk is mask-gated, so the tail frames are inert.
        T0 = x.shape[1]
        Tp = -(-T0 // 128) * 128
        if Tp != T0:
            pad3 = ((0, 0), (0, Tp - T0), (0, 0))
            x = jnp.pad(x, pad3)
            mu = jnp.pad(mu, pad3)
            cond = jnp.pad(cond, pad3)
            mask = jnp.pad(mask, ((0, 0), (0, Tp - T0)))
        m = mask[..., None].astype(x.dtype)

        t_emb = sinusoidal_time_emb(t, c.est_in_channels).astype(x.dtype)
        t_emb = TimestepEmbedding(time_dim, name="time_mlp")(t_emb)

        spks_t = jnp.broadcast_to(spks[:, None, :], x.shape)
        h = jnp.concatenate([x, mu, spks_t, cond], axis=-1)

        def stage(h, name, dim_out):
            h = CausalResnetBlock1D(dim_out, name=f"{name}_resnet")(h, m, t_emb)
            for j in range(c.est_n_blocks):
                h = TransformerBlock(dim_out, c.est_heads, c.est_head_dim,
                                     c.use_flash_attention,
                                     name=f"{name}_tfmr_{j}")(h, mask, lengths)
            return h

        # down stage (single channel stage: 'downsample' is a stride-1 conv)
        h = stage(h, "down_0", ch)
        skip = h
        h = CausalConv1d(ch, 3, name="down_0_conv")(h * m)

        for i in range(c.est_mid_blocks):
            h = stage(h, f"mid_{i}", ch)

        # up stage with skip connection
        h = jnp.concatenate([h, skip], axis=-1)
        h = stage(h, "up_0", ch)
        h = CausalConv1d(ch, 3, name="up_0_conv")(h * m)

        h = CausalBlock1D(ch, name="final_block")(h, m)
        out = Conv1d(c.n_mels, 1, name="final_proj")(h * m)
        return (out * m)[:, :T0]
