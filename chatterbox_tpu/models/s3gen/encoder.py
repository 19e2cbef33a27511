"""Upsample conformer encoder for S3Gen (token -> pre-mel features).

Parity target: reference s3gen/transformer/upsample_encoder.py
(UpsampleConformerEncoder :99-318) with its sub-modules:
  * LinearNoSubsampling embed (subsampling.py:69-110): Dense + LayerNorm(1e-5)
  * EspnetRelPositionalEncoding (embedding.py:201-294): x *= sqrt(d); the
    relative table covers offsets +/-(T-1)
  * RelPositionMultiHeadedAttention (attention.py:200-330): Transformer-XL
    style content/position terms with learned pos_bias_u/v
  * ConformerEncoderLayer (encoder_layer.py:109-236) configured with no
    macaron FFN and no conv module (s3gen.py:59-74) -> plain pre-norm
    attn+FFN block with eps 1e-12 norms, swish FFN
  * PreLookaheadLayer (lookahead 3) and nearest+conv Upsample1D (x2)

TPU-native notes: the rel-position term is computed as a dense
[B, H, T, 2T-1] einsum + take_along_axis gather (the same memory profile as
the reference's matmul + rel_shift, but with no reshape trickery), batched and
masked so multiple utterances encode together — the reference asserts B==1
(flow.py:256)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import S3GenConfig
from ...utils.layers import Conv1d, make_length_mask


def rel_positional_encoding(T: int, d: int, dtype=jnp.float32):
    """Espnet relative PE table: out[m] = PE(T-1-m), m in [0, 2T-1)."""
    rel = jnp.arange(T - 1, -T, -1, dtype=jnp.float32)  # T-1 .. -(T-1)
    inv = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * -(jnp.log(10000.0) / d))
    ang = rel[:, None] * inv[None, :]
    pe = jnp.zeros((2 * T - 1, d), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe.astype(dtype)


class RelPositionMHA(nn.Module):
    """Transformer-XL relative-position attention (attention.py:200-330)."""
    n_heads: int
    dim: int

    @nn.compact
    def __call__(self, x, pos_emb, key_mask):
        """x: [B, T, D]; pos_emb: [2T-1, D]; key_mask: [B, T] bool."""
        H, D = self.n_heads, self.dim // self.n_heads
        B, T, _ = x.shape
        q = nn.Dense(self.dim, name="linear_q")(x).reshape(B, T, H, D)
        k = nn.Dense(self.dim, name="linear_k")(x).reshape(B, T, H, D)
        v = nn.Dense(self.dim, name="linear_v")(x).reshape(B, T, H, D)
        p = nn.Dense(self.dim, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(-1, H, D)  # [2T-1, H, D]

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (H, D))
        w = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (H, D))

        # score terms stay in the compute dtype (bf16 on TPU): the
        # [B, H, T, 2T-1] position tensor and its rel-shift copies were
        # ~20 ms/vocode-call of f32 transpose traffic at f32; only the
        # softmax itself runs f32 (tests run f32 throughout, so parity
        # numerics are unchanged there)
        ac = jnp.einsum("bthd,bshd->bhts", q + u[None, None].astype(x.dtype),
                        k, preferred_element_type=x.dtype)
        bd_full = jnp.einsum("bthd,mhd->bhtm",
                             q + w[None, None].astype(x.dtype), p,
                             preferred_element_type=x.dtype)
        # rel-shift: bd[t, s] = bd_full[t, s - t + T - 1], done with the
        # Transformer-XL pad+reshape trick (attention.py:225-247) — a gather
        # here measured ~20x slower on TPU.
        B_, H_ = bd_full.shape[:2]
        padded = jnp.pad(bd_full, ((0, 0), (0, 0), (0, 0), (1, 0)))
        padded = padded.reshape(B_, H_, 2 * T, T)
        bd = padded[:, :, 1:, :].reshape(B_, H_, T, 2 * T - 1)[..., :T]
        scores = (ac + bd).astype(jnp.float32) / jnp.sqrt(jnp.float32(D))

        mask = key_mask[:, None, None, :]
        scores = jnp.where(mask, scores, jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(mask, probs, 0.0).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, self.dim)
        return nn.Dense(self.dim, name="linear_out")(out)


class ConformerLayer(nn.Module):
    """Pre-norm attention + FFN block (no macaron / conv variant)."""
    cfg: S3GenConfig

    @nn.compact
    def __call__(self, x, pos_emb, key_mask):
        c = self.cfg
        h = RelPositionMHA(c.enc_heads, c.enc_dim, name="self_attn")(
            nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x), pos_emb, key_mask)
        x = x + h
        y = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        y = nn.Dense(c.enc_ffn_dim, name="w_1")(y)
        y = jax.nn.silu(y)  # swish activation (class_utils.py registry)
        y = nn.Dense(c.enc_dim, name="w_2")(y)
        return x + y


class PreLookaheadLayer(nn.Module):
    """3-frame lookahead conv block (upsample_encoder.py:66-96)."""
    channels: int
    lookahead: int = 3

    @nn.compact
    def __call__(self, x):
        y = jnp.pad(x, ((0, 0), (0, self.lookahead), (0, 0)))
        y = Conv1d(self.channels, self.lookahead + 1, name="conv1")(y)
        y = jax.nn.leaky_relu(y, negative_slope=0.01)
        y = jnp.pad(y, ((0, 0), (2, 0), (0, 0)))
        y = Conv1d(self.channels, 3, name="conv2")(y)
        return y + x


class UpsampleLayer(nn.Module):
    """Nearest x2 upsample + left-padded conv (upsample_encoder.py:37-63)."""
    channels: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        y = jnp.repeat(x, self.stride, axis=1)
        y = jnp.pad(y, ((0, 0), (self.stride * 2, 0), (0, 0)))
        return Conv1d(self.channels, self.stride * 2 + 1, name="conv")(y)


class UpsampleConformerEncoder(nn.Module):
    cfg: S3GenConfig

    @nn.compact
    def __call__(self, x, lengths):
        """x: [B, T, enc_dim] token embeddings; lengths: [B].
        Returns ([B, 2T, enc_dim], new_lengths)."""
        c = self.cfg
        d = c.enc_dim

        # embed stage.  Padded rows are re-zeroed after every bias/LayerNorm
        # stage: the reference never pads (batch 1), but here a nonzero pad
        # row would leak into the lookahead/upsample convs and break
        # batch-size invariance.
        T = x.shape[1]
        mask = make_length_mask(lengths, T)
        mcol = mask[..., None].astype(x.dtype)
        x = nn.Dense(d, name="embed_linear")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="embed_norm")(x)
        x = x * jnp.sqrt(jnp.float32(d)).astype(x.dtype) * mcol
        pos = rel_positional_encoding(T, d, x.dtype)

        x = PreLookaheadLayer(d, c.pre_lookahead_len, name="pre_lookahead_layer")(x)
        x = x * mcol
        for i in range(c.enc_blocks):
            x = ConformerLayer(c, name=f"encoders_{i}")(x, pos, mask) * mcol

        # upsample stage
        x = UpsampleLayer(d, name="up_layer")(x)
        lengths = lengths * 2
        T2 = x.shape[1]
        mask2 = make_length_mask(lengths, T2)
        mcol2 = mask2[..., None].astype(x.dtype)
        x = nn.Dense(d, name="up_embed_linear")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="up_embed_norm")(x)
        x = x * jnp.sqrt(jnp.float32(d)).astype(x.dtype) * mcol2
        pos2 = rel_positional_encoding(T2, d, x.dtype)
        for i in range(c.enc_up_blocks):
            x = ConformerLayer(c, name=f"up_encoders_{i}")(x, pos2, mask2) * mcol2

        x = nn.LayerNorm(epsilon=1e-5, name="after_norm")(x) * mcol2
        return x, lengths
