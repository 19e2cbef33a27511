"""Llama-520M backbone for the T3 speech-token LM, TPU-native.

Architecture parity target: the reference's vLLM ``LlamaModel`` instantiated
from ``t3-model/config.json`` (30 layers, hidden 1024 per CFG stream, 16
heads, head_dim 64, MLP 4096, SwiGLU, RMSNorm eps 1e-5, llama3-scaled RoPE
theta 5e5).  Reference wiring: src/chatterbox_vllm/models/t3/t3.py:305-344.

Design differences from the reference (TPU-first, not a port):
  * Functional flax.linen modules over explicit KV-cache pytrees — no paged
    CUDA kernels; the cache is a dense [L, B, S, H, D] slot cache written via
    per-slot dynamic slices, attended with length masking (XLA fuses the
    masked softmax-matmul chain onto the MXU).
  * One ``__call__`` serves chunked prefill (T>1, writes at a given offset)
    and batched decode (T=1) — no separate code paths per engine state.
  * CFG cond/uncond run as two *batch lanes* of the same call, not as a
    doubled hidden dim (reference t3.py:742-778 doubles hidden_size to smuggle
    the second stream through vLLM).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import T3ModelConfig


def llama3_rope_frequencies(cfg: T3ModelConfig) -> jnp.ndarray:
    """Per-pair inverse frequencies with llama3 long-context scaling
    (t3-model/config.json rope_scaling block)."""
    d = cfg.head_dim
    exponents = jnp.arange(0, d, 2, dtype=jnp.float32) / d
    inv_freq = 1.0 / (cfg.rope_theta ** exponents)

    low_wavelen = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
    high_wavelen = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
    wavelen = 2.0 * jnp.pi / inv_freq
    # smooth interpolation between scaled and unscaled bands
    smooth = (cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
    )
    smooth = jnp.clip(smooth, 0.0, 1.0)
    scaled = inv_freq / cfg.rope_scaling_factor
    blended = (1.0 - smooth) * scaled + smooth * inv_freq
    out = jnp.where(wavelen < high_wavelen, inv_freq,
                    jnp.where(wavelen > low_wavelen, scaled, blended))
    return out  # [head_dim // 2]


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE (HF/vLLM neox convention).

    x: [B, T, H, D]; positions: [B, T] int32.
    """
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B, T, D/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, T, 1, D/2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(x.dtype)


@dataclasses.dataclass
class KVCache:
    """Dense slot KV cache: k/v are [n_layers, B, max_len, n_kv, head_dim]."""
    k: jnp.ndarray
    v: jnp.ndarray

    @classmethod
    def zeros(cls, cfg: T3ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


jax.tree_util.register_pytree_node(
    KVCache,
    lambda c: ((c.k, c.v), None),
    lambda _, kv: KVCache(k=kv[0], v=kv[1]),
)


def _write_cache(cache_layer: jnp.ndarray, new: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Write [B, T, H, D] block into [B, S, H, D] cache at per-batch offsets."""
    def write_one(buf, blk, s):
        return jax.lax.dynamic_update_slice(buf, blk.astype(buf.dtype), (s, 0, 0))
    return jax.vmap(write_one)(cache_layer, new, start)


class Attention(nn.Module):
    cfg: T3ModelConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, positions, kv_k, kv_v, write_start, kv_len, inv_freq):
        """
        x: [B, T, hidden]; positions: [B, T] absolute positions (RoPE + causal);
        kv_k / kv_v: [B, S, n_kv, D] this layer's cache slices;
        write_start: [B] index where this block's K/V get written;
        kv_len: [B] total valid cache length *after* the write.
        Returns (out [B, T, hidden], new_kv_k, new_kv_v).
        """
        cfg = self.cfg
        B, T, _ = x.shape
        S = kv_k.shape[1]
        h, kvh, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

        dense = lambda f, name: nn.Dense(f, use_bias=False, name=name,
                                         dtype=x.dtype, param_dtype=jnp.float32)
        q = dense(h * d, "q_proj")(x).reshape(B, T, h, d)
        k = dense(kvh * d, "k_proj")(x).reshape(B, T, kvh, d)
        v = dense(kvh * d, "v_proj")(x).reshape(B, T, kvh, d)

        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        new_k = _write_cache(kv_k, k, write_start)
        new_v = _write_cache(kv_v, v, write_start)

        # Attend over the full cache with causal + length masking.  With MHA
        # (n_kv == n_heads) this is a plain batched matmul chain XLA maps to
        # the MXU; GQA would add a repeat.
        kq = new_k
        vq = new_v
        if kvh != h:
            rep = h // kvh
            kq = jnp.repeat(kq, rep, axis=2)
            vq = jnp.repeat(vq, rep, axis=2)

        scores = jnp.einsum("bthd,bshd->bhts", q, kq,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(d))

        key_pos = jnp.arange(S)[None, None, :]                  # [1,1,S]
        q_pos = positions[:, :, None]                           # [B,T,1]
        causal = key_pos <= q_pos                               # [B,T,S] keys at or before query pos
        valid = key_pos < kv_len[:, None, None]                 # [B,T,S]
        mask = (causal & valid)[:, None, :, :]                  # [B,1,T,S]
        scores = jnp.where(mask, scores, jnp.float32(-1e30))

        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, vq)
        out = out.reshape(B, T, h * d)
        out = dense(cfg.hidden_size, "o_proj")(out)
        return out, new_k, new_v


class MLP(nn.Module):
    cfg: T3ModelConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dense = lambda f, name: nn.Dense(f, use_bias=False, name=name,
                                         dtype=x.dtype, param_dtype=jnp.float32)
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(jax.nn.silu(gate) * up)


class LlamaBlock(nn.Module):
    cfg: T3ModelConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, kv, positions, write_start, kv_len, inv_freq):
        kv_k, kv_v = kv
        attn_out, nk, nv = Attention(self.cfg, self.layer_idx, name="self_attn")(
            RMSNorm(self.cfg.rms_norm_eps, name="input_layernorm")(x),
            positions, kv_k, kv_v, write_start, kv_len, inv_freq)
        x = x + attn_out
        x = x + MLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.rms_norm_eps, name="post_attention_layernorm")(x))
        return x, (nk, nv)


class LlamaBackbone(nn.Module):
    """30-layer Llama trunk operating on pre-computed input embeddings.

    The T3 model feeds it mixed cond/text/speech embeddings (there is no
    token-embedding table at this level; reference t3.py routes embeddings the
    same way via ``inputs_embeds``).  Layers are folded with ``nn.scan`` —
    params are stacked on a leading layer axis, the KV cache's layer axis is
    the scan axis — which keeps compile time flat in depth and lets XLA keep
    one resident program for all 30 layers.
    """
    cfg: T3ModelConfig

    @nn.compact
    def __call__(self, embeds, positions, cache: KVCache, write_start, kv_len
                 ) -> Tuple[jnp.ndarray, KVCache]:
        cfg = self.cfg
        inv_freq = llama3_rope_frequencies(cfg)

        ScannedBlock = nn.scan(
            LlamaBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=cfg.n_layers,
        )
        x, (new_k, new_v) = ScannedBlock(cfg, name="layers")(
            embeds, (cache.k, cache.v), positions, write_start, kv_len, inv_freq)
        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
        return x, KVCache(k=new_k, v=new_v)
