"""T3 conditioning encoder: speaker projection + perceiver resampler + emotion.

Parity target: reference t3/modules/cond_enc.py (T3CondEnc.forward :80-123)
and t3/modules/perceiver.py (Perceiver :176-215, AttentionBlock2 :116-173,
AttentionQKV :55-113).  Output is the (34, n_channels) conditioning block:
[1 speaker token | 32 perceiver-resampled speech-prompt tokens | 1 emotion
token] (t3.py:42).

TPU-native notes: written batched ([B, T, D]) and jittable; the reference runs
unbatched eager torch.  The attention is a single fused softmax(QK^T)V — tiny
shapes (32x150), so XLA handles it without a custom kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import T3ModelConfig


class PerceiverAttention(nn.Module):
    """One shared attention block applied as cross- then self-attention
    (reference AttentionBlock2: shared LayerNorm for both operands, separate
    q/k/v projections, residual on the query stream)."""
    n_heads: int
    channels: int

    @nn.compact
    def __call__(self, x_q, x_kv):
        d = self.channels // self.n_heads
        norm = nn.LayerNorm(name="norm")
        qn = norm(x_q)
        kn = norm(x_kv)
        q = nn.Dense(self.channels, name="to_q")(qn)
        k = nn.Dense(self.channels, name="to_k")(kn)
        v = nn.Dense(self.channels, name="to_v")(kn)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, self.n_heads, d)
        k = k.reshape(B, Tk, self.n_heads, d)
        v = v.reshape(B, Tk, self.n_heads, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(d))
        probs = jax.nn.softmax(scores, axis=-1).astype(x_q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, self.channels)
        out = nn.Dense(self.channels, name="proj_out")(out)
        return x_q + out


class Perceiver(nn.Module):
    """32-query perceiver resampler (reference perceiver.py:176-215): the same
    attention block is applied twice — queries attend to the speech-prompt
    embeddings, then the result self-attends."""
    cfg: T3ModelConfig

    @nn.compact
    def __call__(self, h):
        # h: [B, T_prompt, n_channels]
        cfg = self.cfg
        query = self.param(
            "pre_attention_query",
            nn.initializers.uniform(scale=2 * (2.0 / (2 * cfg.perceiver_n_queries)) ** 0.5),
            (cfg.perceiver_n_queries, cfg.hidden_size),
        )
        q = jnp.broadcast_to(query[None], (h.shape[0],) + query.shape).astype(h.dtype)
        attn = PerceiverAttention(cfg.perceiver_n_heads, cfg.hidden_size, name="attn")
        pre = attn(q, h)
        return attn(pre, pre)


class T3CondEnc(nn.Module):
    """Builds the 34-token conditioning block from (speaker_emb,
    cond_prompt_speech_emb, emotion_adv)."""
    cfg: T3ModelConfig

    @nn.compact
    def __call__(self, speaker_emb, cond_prompt_speech_emb, emotion_adv):
        """
        speaker_emb: [B, speaker_embed_size] (L2-normed voice-encoder output)
        cond_prompt_speech_emb: [B, prompt_len, hidden] (speech_emb + pos_emb
            of the 150 prompt tokens, computed by the caller as in tts.py:238)
        emotion_adv: [B, 1] scalar exaggeration in [0, 1]
        returns [B, 34, hidden]
        """
        cfg = self.cfg
        spkr = nn.Dense(cfg.hidden_size, name="spkr_enc")(speaker_emb)[:, None, :]
        prompt = Perceiver(cfg, name="perceiver")(cond_prompt_speech_emb)
        emotion = nn.Dense(cfg.hidden_size, use_bias=False,
                           name="emotion_adv_fc")(emotion_adv)[:, None, :]
        return jnp.concatenate([spkr, prompt, emotion], axis=1)
