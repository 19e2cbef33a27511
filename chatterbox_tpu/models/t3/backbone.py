"""Llama-520M backbone for the T3 speech-token LM, TPU-native.

Architecture parity target: the reference's vLLM ``LlamaModel`` instantiated
from ``t3-model/config.json`` (30 layers, hidden 1024 per CFG stream, 16
heads, head_dim 64, MLP 4096, SwiGLU, RMSNorm eps 1e-5, llama3-scaled RoPE
theta 5e5).  Reference wiring: src/chatterbox_vllm/models/t3/t3.py:305-344.

Design (TPU-first, not a port):
  * CFG cond/uncond run as two *batch lanes*, not a doubled hidden dim
    (reference t3.py:742-778 doubles hidden_size to smuggle the second
    stream through vLLM).
  * KV caching uses a **frozen-prefix + hot-ring** layout: XLA on TPU does
    not reliably update a multi-GB cache in place (a single
    dynamic-update-slice measured as a full-buffer copy, ~5 ms; a vmapped
    per-slot scatter ~20 ms).  So inside a decode chunk the big cache is
    READ-ONLY; each step's K/V goes into a small [L, B, H, C, D] ring at a
    chunk-local scalar index (cheap), and the engine merges ring -> frozen
    once per chunk.  Attention = softmax over the concatenated
    (frozen-window, ring-prefix) score blocks.
  * Prefill computes block K/V with no cache writes at all — the stacked
    [L, B, H, P, D] output *becomes* the frozen cache for those slots.
  * Layers are folded with nn.scan (stacked params, flat compile time).
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
    smooth = (cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor) / (
        cfg.rope_high_freq_factor - cfg.rope_low_freq_factor
    )
    smooth = jnp.clip(smooth, 0.0, 1.0)
    scaled = inv_freq / cfg.rope_scaling_factor
    blended = (1.0 - smooth) * scaled + smooth * inv_freq
    return jnp.where(wavelen < high_wavelen, inv_freq,
                     jnp.where(wavelen > low_wavelen, scaled, blended))


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE (HF/vLLM neox convention).
    x: [B, T, H, D]; positions: [B, T] int32."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B, T, D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


@dataclasses.dataclass
class KVCache:
    """Stacked KV buffers in one of two layouts:

    * head-major (rings, prefill block output): k/v
      ``[n_layers, B, n_kv, T, head_dim]``.
    * packed-heads (the engine's frozen cache): k/v
      ``[n_layers, B, T, n_kv * head_dim]``.  Folding heads into the minor
      dim makes it 1024 = 8 x (8, 128) tiles, so the layout XLA's decode
      dots prefer IS the compact storage layout.  With the head-major cache
      XLA materialized a D-minor (8,128)-tiled copy of the whole cache per
      decode chunk — head_dim 64 padded to 128 lanes, 2x HBM and 2x the
      bytes/VPU-converts of every decode step's dominant read (the copies
      are visible in the compiled HLO, tools/dump_decode_hlo.py, and were
      the direct cause of a B=96 OOM).  The packed QK/PV dots use a
      block-diagonal q/output trick (M = n_heads MXU matmuls; the n_heads x
      MAC waste is free next to the saved bytes — tools/ubench_attn.py v9).

    Optional int8 mode: k/v stored int8 with per-(layer, lane, head, pos)
    scales — halves the dominant decode HBM read; dequant folds into the
    attention einsums (scale is per key position, so it factors out).

    Optional int4 mode (bits=4): two 4-bit codes nibble-packed into one int8
    along the minor dim — quarters the decode HBM read; unpacking is two
    shifts fused into the attention read.  ``jnp.int4`` is avoided on
    purpose: the dtype is not reliably lowered on all backends in this tree,
    packed-int8 is."""
    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None   # [L, B, H, T] when int8/int4
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def zeros(cls, cfg: T3ModelConfig, batch: int, length: int,
              dtype=jnp.bfloat16, bits: int = 8, packed: bool = False):
        d = cfg.head_dim // 2 if (dtype == jnp.int8 and bits == 4) \
            else cfg.head_dim
        if packed:
            shape = (cfg.n_layers, batch, length, cfg.n_kv_heads * d)
            sshape = (cfg.n_layers, batch, cfg.n_kv_heads, length)
        else:
            shape = (cfg.n_layers, batch, cfg.n_kv_heads, length, d)
            sshape = shape[:-1]
        if dtype == jnp.int8:
            # scales in bf16: the dequant product is computed in f32 anyway
            # and bf16 halves the per-step scale read + cache footprint
            return cls(k=jnp.zeros(shape, jnp.int8),
                       v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(sshape, jnp.bfloat16),
                       v_scale=jnp.zeros(sshape, jnp.bfloat16))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def packed(self) -> bool:
        return self.k.ndim == 4

    @property
    def length(self) -> int:
        return self.k.shape[2] if self.packed else self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def _kv_flatten(c: KVCache):
    # Always four children: a missing scale is a None CHILD (an empty
    # subtree), never aux data.  Deriving the child count from
    # ``k_scale is None`` made the structure depend on leaf values, which
    # breaks pytree-prefix machinery that maps leaves to None (e.g. jit's
    # internal out_layouts tree derived from out_shardings: the mapped
    # KVCache re-flattened with FEWER children and failed prefix matching).
    return (c.k, c.v, c.k_scale, c.v_scale), None


def _kv_unflatten(_, leaves):
    return KVCache(k=leaves[0], v=leaves[1], k_scale=leaves[2],
                   v_scale=leaves[3])


jax.tree_util.register_pytree_node(KVCache, _kv_flatten, _kv_unflatten)


def quantize_kv(x: jnp.ndarray, bits: int = 8):
    """[..., T, D] float -> (int8 values, [..., T] scales).

    bits=4: codes clipped to [-7, 7] and nibble-packed pairwise along D
    (output last dim D // 2); unpack with :func:`unpack_int4`."""
    qmax = 127.0 if bits == 8 else 7.0
    amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-8)
    scale = amax / qmax
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        q = pack_int4(q)
    return q, scale


def pack_heads(x: jnp.ndarray) -> jnp.ndarray:
    """Head-major [..., H, T, D] -> packed-heads [..., T, H * D]."""
    moved = jnp.moveaxis(x, -3, -2)                  # [..., T, H, D]
    return moved.reshape(*moved.shape[:-2], -1)


def quantize_kv_packed(x: jnp.ndarray, bits: int = 8):
    """Head-major float [..., H, T, D] -> (packed int8 [..., T, H*D or
    H*D/2], per-(head, position) scales [..., H, T])."""
    q, scale = quantize_kv(x, bits)                  # [..., H, T, D'], [..., H, T]
    return pack_heads(q), scale


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 codes in [-8, 7], even D -> packed int8 [..., D // 2]:
    element 2i in the low nibble, 2i+1 in the high nibble."""
    lo = q[..., 0::2] & 0x0F
    hi = q[..., 1::2] & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(p: jnp.ndarray) -> jnp.ndarray:
    """Packed int8 [..., D/2] -> int8 codes [..., D] (sign-extended)."""
    lo = ((p << 4).astype(jnp.int8) >> 4).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    return jnp.stack([lo, hi], axis=-1).reshape(*p.shape[:-1], -1)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        normed = xf * jax.lax.rsqrt(var + self.eps)
        return (normed * scale).astype(x.dtype)


def _dense(cfg, features, name, dtype):
    if cfg.quant_weights:
        from ...ops.quant import QuantDense
        return QuantDense(features, act_quant=cfg.quant_act, name=name)
    return nn.Dense(features, use_bias=False, name=name, dtype=dtype,
                    param_dtype=jnp.float32)


def _quant_q_rows(q1):
    """Per-(lane, head) int8 row quantization of q [B, H, D] for the
    int8 x int8 QK MXU dot (shared by the packed decode paths — keep the
    epsilon/rounding in ONE place; the ragged A/B test depends on both
    paths staying numerically identical)."""
    qf = q1.astype(jnp.float32)
    qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9
    q8 = jnp.clip(jnp.round(qf / qa * 127.0), -127, 127).astype(jnp.int8)
    return q8, qa


class Attention(nn.Module):
    cfg: T3ModelConfig

    def _qkv(self, x, positions, inv_freq):
        cfg = self.cfg
        B, T, _ = x.shape
        h, kvh, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        q = _dense(cfg, h * d, "q_proj", x.dtype)(x).reshape(B, T, h, d)
        k = _dense(cfg, kvh * d, "k_proj", x.dtype)(x).reshape(B, T, kvh, d)
        v = _dense(cfg, kvh * d, "v_proj", x.dtype)(x).reshape(B, T, kvh, d)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        return q, k, v

    def _repeat_kv(self, t):
        cfg = self.cfg
        if cfg.n_kv_heads != cfg.n_heads:
            t = jnp.repeat(t, cfg.n_heads // cfg.n_kv_heads, axis=1)
        return t

    @nn.compact
    def __call__(self, x, positions, valid_len, inv_freq,
                 frozen_k=None, frozen_v=None, frozen_len=None,
                 ring_k=None, ring_v=None, ring_idx=None,
                 frozen_k_scale=None, frozen_v_scale=None,
                 ring_k_scale=None, ring_v_scale=None, ring_base=None):
        """Three modes:

        Block mode (frozen_k is None): self-attention within the block with
        causal + valid_len masking.  Returns (out, block_k, block_v) with
        block K/V in cache layout [B, H, T, D].

        Decode mode (frozen_k given, T==1): attends frozen[0:frozen_len[b]]
        plus ring[0:ring_idx] plus the current token; writes this token's
        K/V into the ring at scalar index ring_idx.  Returns
        (out, new_ring_k, new_ring_v).

        Verify mode (frozen_k given, ring_base [B] given): multi-query
        speculative-decode verify — T fed tokens per lane attend
        frozen[0:frozen_len[b]] + ring[0:ring_base[b]] (committed chunk
        entries) + a causal self-block; the block K/V is RETURNED (the ring
        is read-only here — the engine performs the single per-cycle ring
        insert for the committed prefix, _verify_packed's docstring and
        engine._ring_insert).  Packed frozen only.
        """
        cfg = self.cfg
        d = cfg.head_dim
        B, T, _ = x.shape
        q, k, v = self._qkv(x, positions, inv_freq)

        if frozen_k is None:
            kc = k.transpose(0, 2, 1, 3)            # [B, H, T, D]
            vc = v.transpose(0, 2, 1, 3)
            kq, vq = self._repeat_kv(kc), self._repeat_kv(vc)
            scores = jnp.einsum("bthd,bhsd->bhts", q, kq,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(d))
            key_pos = jnp.arange(T)[None, None, :]
            causal = key_pos <= positions[:, :, None]
            valid = key_pos < valid_len[:, None, None]
            scores = jnp.where((causal & valid)[:, None], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhts,bhsd->bthd", probs, vq).reshape(B, T, -1)
            return _dense(cfg, cfg.hidden_size, "o_proj", x.dtype)(out), kc, vc

        # ---- decode mode ----
        heads_packed = frozen_k.ndim == 3          # [B, S, Hkv * D']
        int4_packed = frozen_k.shape[-1] == \
            (cfg.n_kv_heads * d // 2 if heads_packed else d // 2)
        if ring_base is not None:
            if not heads_packed:
                raise ValueError("verify mode needs the packed frozen cache")
            return self._verify_packed(
                x, q, k, v, frozen_k, frozen_v, frozen_k_scale,
                frozen_v_scale, frozen_len, ring_k, ring_v, ring_k_scale,
                ring_v_scale, ring_base, int4_packed)
        # NOTE: Pallas decode-attention kernels were built and measured
        # here across THREE designs over three rounds; all lose to XLA's
        # einsum fusions over the packed-heads cache.  The round-5
        # position-major ragged kernel (ops/ragged_decode.py, reachable
        # via decode_kernel="ragged" below) finally isolated why: Pallas
        # HBM streaming on this stack caps at ~0.6x of XLA's effective
        # bandwidth even for a pure copy, so per-lane length skipping
        # cannot pay at realistic fills (docs/PERF.md "round 5 ragged").
        # Decode attention is ~1.1x off the HBM roofline on the XLA path.
        S = frozen_k.shape[1] if heads_packed else frozen_k.shape[2]
        C = ring_k.shape[2]
        ring_quant = ring_k_scale is not None
        kt = k.transpose(0, 2, 1, 3)                        # [B, H, 1, D]
        vt = v.transpose(0, 2, 1, 3)
        if ring_quant:
            # quantize the step's K/V at ring write — the ring is then read
            # (within-chunk attention) and merged without a second pass
            ktq, kts = quantize_kv(kt)
            vtq, vts = quantize_kv(vt)
            new_ring_k = jax.lax.dynamic_update_slice(
                ring_k, ktq, (0, 0, ring_idx, 0))
            new_ring_v = jax.lax.dynamic_update_slice(
                ring_v, vtq, (0, 0, ring_idx, 0))
            new_rks = jax.lax.dynamic_update_slice(
                ring_k_scale, kts.astype(ring_k_scale.dtype),
                (0, 0, ring_idx))
            new_rvs = jax.lax.dynamic_update_slice(
                ring_v_scale, vts.astype(ring_v_scale.dtype),
                (0, 0, ring_idx))
        else:
            new_ring_k = jax.lax.dynamic_update_slice(
                ring_k, kt.astype(ring_k.dtype), (0, 0, ring_idx, 0))
            new_ring_v = jax.lax.dynamic_update_slice(
                ring_v, vt.astype(ring_v.dtype), (0, 0, ring_idx, 0))
            new_rks = new_rvs = None

        if heads_packed:
            return self._decode_packed(
                x, q, frozen_k, frozen_v, frozen_k_scale, frozen_v_scale,
                frozen_len, new_ring_k, new_ring_v, new_rks, new_rvs,
                ring_idx, int4_packed)

        fk, fv = self._repeat_kv(frozen_k), self._repeat_kv(frozen_v)
        rk, rv = self._repeat_kv(new_ring_k), self._repeat_kv(new_ring_v)
        if int4_packed:
            fk, fv = unpack_int4(fk), unpack_int4(fv)
        if frozen_k_scale is not None:
            # QK over the frozen cache as int8 x int8 -> int32 (MXU): q is
            # quantized per (lane, head) row; skipping the int8->bf16
            # convert of the whole K read measures ~15% faster at bench
            # shape (tools/ubench_attn.py v2 vs v1).  q's own quantization
            # noise (<=0.4% per element over a 64-dot) is far below the K
            # cache's int8 noise.  V stays int8->bf16: int8 PV loses
            # (ubench v4) because probs must be re-quantized per row.
            fv = fv.astype(x.dtype)
            qf = q.astype(jnp.float32)
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9
            q8 = jnp.clip(jnp.round(qf / qa * 127.0), -127,
                          127).astype(jnp.int8)
            s32 = jnp.einsum("bthd,bhsd->bhts", q8, fk,
                             preferred_element_type=jnp.int32)
            sf = (s32.astype(jnp.float32)
                  * (qa.transpose(0, 2, 1, 3)
                     / (127.0 * jnp.sqrt(jnp.float32(d))))
                  * self._repeat_kv(frozen_k_scale)[:, :, None, :]
                  .astype(jnp.float32))
        else:
            sf = jnp.einsum("bthd,bhsd->bhts", q, fk,
                            preferred_element_type=jnp.float32
                            ) / jnp.sqrt(jnp.float32(d))
        if ring_quant:
            rk = rk.astype(x.dtype)
            rv = rv.astype(x.dtype)
        sr = jnp.einsum("bthd,bhcd->bhtc", q, rk,
                        preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(d))
        if ring_quant:
            sr = sr * self._repeat_kv(new_rks)[:, :, None, :].astype(jnp.float32)

        f_valid = (jnp.arange(S)[None, :] < frozen_len[:, None])[:, None, None, :]
        r_valid = (jnp.arange(C)[None, :] <= ring_idx)[:, None, None, :]
        sf = jnp.where(f_valid, sf, -1e30)
        sr = jnp.where(r_valid, sr, -1e30)

        # joint softmax over both segments
        m = jnp.maximum(jnp.max(sf, axis=-1, keepdims=True),
                        jnp.max(sr, axis=-1, keepdims=True))
        ef = jnp.exp(sf - m)
        er = jnp.exp(sr - m)
        denom = jnp.sum(ef, axis=-1, keepdims=True) + jnp.sum(er, axis=-1, keepdims=True)
        pf = ef / denom
        pr = (er / denom).astype(x.dtype)
        # Alignment stream (original Chatterbox alignment_stream_analyzer:
        # attention of one mid layer over the text span tracks decode
        # progress; the reference drops this safeguard, README.md:99) —
        # head-mean frozen-segment probabilities, cheap to expose here.
        align = (jnp.mean(pf, axis=1)[:, 0, :].astype(jnp.float32)
                 if cfg.align_enabled else jnp.zeros((B, 0), jnp.float32))
        if frozen_v_scale is not None:
            # fold the per-position dequant scale into the probabilities
            pf = pf * self._repeat_kv(frozen_v_scale)[:, :, None, :].astype(jnp.float32)
        if ring_quant:
            pr = (pr.astype(jnp.float32)
                  * self._repeat_kv(new_rvs)[:, :, None, :].astype(jnp.float32)
                  ).astype(x.dtype)
        pf = pf.astype(x.dtype)
        out = (jnp.einsum("bhts,bhsd->bthd", pf, fv)
               + jnp.einsum("bhtc,bhcd->bthd", pr, rv)).reshape(B, T, -1)
        return (_dense(cfg, cfg.hidden_size, "o_proj", x.dtype)(out),
                new_ring_k, new_ring_v, new_rks, new_rvs, align)


    def _decode_packed(self, x, q, frozen_k, frozen_v, fk_scale, fv_scale,
                       frozen_len, ring_k, ring_v, rks, rvs, ring_idx,
                       int4_packed):
        """Decode attention over the packed-heads frozen cache.

        frozen_k/v: [B, S, Hkv * D'] (D' = D or D/2 when int4);
        fk/fv_scale: [B, Hkv, S] or None; ring_*: head-major as usual.
        The QK dot uses a block-diagonal q (each q head's row occupies its
        kv head's D-slice of the packed minor dim) and the PV dot computes
        [Hq, Hkv * D] then extracts each head's own block — M = n_heads MXU
        matmuls whose n_heads-fold MAC overhead is far cheaper than the
        D-minor relayout XLA makes for per-head matvecs (ubench v9/v10,
        docs/PERF.md)."""
        cfg = self.cfg
        d = cfg.head_dim
        Hq, Hkv = cfg.n_heads, cfg.n_kv_heads
        B = x.shape[0]
        kv_of = jnp.arange(Hq) // max(1, Hq // Hkv)       # q head -> kv head
        onehot = (kv_of[:, None] == jnp.arange(Hkv)[None, :])  # [Hq, Hkv]

        fkp, fvp = frozen_k, frozen_v
        if int4_packed:
            fkp, fvp = unpack_int4(fkp), unpack_int4(fvp)
        S = fkp.shape[1]
        C = ring_k.shape[2]
        q1 = q[:, 0]                                       # [B, Hq, D]

        if (cfg.decode_kernel == "ragged" and fk_scale is not None
                and not int4_packed and Hq == Hkv
                and not cfg.align_enabled and S % 96 == 0):
            return self._decode_packed_ragged(
                x, q1, fkp, fvp, fk_scale, fv_scale, frozen_len,
                ring_k, ring_v, rks, rvs, ring_idx)

        if fk_scale is not None:
            # int8 x int8 QK on the MXU (see the head-major path note)
            q8, qa = _quant_q_rows(q1)
            qbd = (q8[:, :, None, :]
                   * onehot.astype(jnp.int8)[None, :, :, None]
                   ).reshape(B, Hq, Hkv * d)
            s32 = jnp.einsum("bhD,bsD->bhs", qbd, fkp,
                             preferred_element_type=jnp.int32)
            ks_h = fk_scale[:, kv_of]                      # [B, Hq, S]
            sf = (s32.astype(jnp.float32)
                  * (qa / (127.0 * jnp.sqrt(jnp.float32(d))))
                  * ks_h.astype(jnp.float32))
        else:
            qbd = (q1[:, :, None, :]
                   * onehot.astype(x.dtype)[None, :, :, None]
                   ).reshape(B, Hq, Hkv * d)
            sf = jnp.einsum("bhD,bsD->bhs", qbd, fkp.astype(x.dtype),
                            preferred_element_type=jnp.float32
                            ) / jnp.sqrt(jnp.float32(d))

        rk = self._repeat_kv(ring_k)
        rv = self._repeat_kv(ring_v)
        ring_quant = rks is not None
        if ring_quant:
            rk = rk.astype(x.dtype)
            rv = rv.astype(x.dtype)
        qb = q1.astype(x.dtype)
        sr = jnp.einsum("bhd,bhcd->bhc", qb, rk,
                        preferred_element_type=jnp.float32
                        ) / jnp.sqrt(jnp.float32(d))
        if ring_quant:
            sr = sr * self._repeat_kv(rks).astype(jnp.float32)

        f_valid = (jnp.arange(S)[None, :] < frozen_len[:, None])[:, None, :]
        r_valid = (jnp.arange(C) <= ring_idx)[None, None, :]
        sf = jnp.where(f_valid, sf, -1e30)
        sr = jnp.where(r_valid, sr, -1e30)

        m = jnp.maximum(jnp.max(sf, axis=-1, keepdims=True),
                        jnp.max(sr, axis=-1, keepdims=True))
        ef = jnp.exp(sf - m)
        er = jnp.exp(sr - m)
        denom = jnp.sum(ef, -1, keepdims=True) + jnp.sum(er, -1, keepdims=True)
        pf = ef / denom
        pr = (er / denom).astype(x.dtype)
        align = (jnp.mean(pf, axis=1).astype(jnp.float32)
                 if cfg.align_enabled else jnp.zeros((B, 0), jnp.float32))
        if fv_scale is not None:
            pf = pf * fv_scale[:, kv_of].astype(jnp.float32)
        if ring_quant:
            pr = (pr.astype(jnp.float32)
                  * self._repeat_kv(rvs).astype(jnp.float32)).astype(x.dtype)
        pf = pf.astype(x.dtype)
        of = jnp.einsum("bhs,bsD->bhD", pf, fvp.astype(x.dtype),
                        preferred_element_type=jnp.float32)
        of = jnp.einsum("bhgd,hg->bhd", of.reshape(B, Hq, Hkv, d),
                        onehot.astype(jnp.float32))
        orr = jnp.einsum("bhc,bhcd->bhd", pr, rv,
                         preferred_element_type=jnp.float32)
        out = (of + orr).astype(x.dtype).reshape(B, 1, Hq * d)
        return (_dense(cfg, cfg.hidden_size, "o_proj", x.dtype)(out),
                ring_k, ring_v, rks, rvs, align)


    def _decode_packed_ragged(self, x, q1, fkp, fvp, fk_scale, fv_scale,
                              frozen_len, ring_k, ring_v, rks, rvs,
                              ring_idx):
        """Frozen segment via the ragged Pallas kernel
        (ops/ragged_decode.py): per-lane S-blocks beyond frozen_len are
        never read from HBM (the XLA einsum path reads the whole shared
        s_active window and masks).  The ring segment stays XLA (C <= 32)
        and the two segments merge by exact softmax-stat combination —
        numerics match _decode_packed up to accumulation order.

        Preconditions (checked by the caller): int8 packed cache with
        scales, Hq == Hkv, align_enabled off, S % 96 == 0."""
        from ...ops.ragged_decode import ragged_decode_attention
        cfg = self.cfg
        d = cfg.head_dim
        Hq = cfg.n_heads
        B = x.shape[0]
        S = fkp.shape[1]
        C = ring_k.shape[2]

        q8, qa = _quant_q_rows(q1)
        eye8 = jnp.eye(Hq, dtype=jnp.int8)
        qbd = (q8[:, :, None, :] * eye8[None, :, :, None]
               ).reshape(B, Hq, Hq * d)
        q_scale = (qa[:, :, 0] / (127.0 * jnp.sqrt(jnp.float32(d))))

        block_s = 192 if S % 192 == 0 else 96
        o_f, m_f, l_f = ragged_decode_attention(
            frozen_len.astype(jnp.int32), qbd, q_scale, fkp, fvp,
            fk_scale, fv_scale, block_s=block_s,
            interpret=jax.default_backend() == "cpu")

        # ---- ring segment (KEEP IN SYNC with _decode_packed's ring
        # math: the numbers must match for the ragged A/B equality; the
        # fused path keeps its joint-softmax form because splitting it
        # into stats perturbs the measured-optimal XLA fusion graph) ----
        rk = self._repeat_kv(ring_k)
        rv = self._repeat_kv(ring_v)
        ring_quant = rks is not None
        if ring_quant:
            rk = rk.astype(x.dtype)
            rv = rv.astype(x.dtype)
        qb = q1.astype(x.dtype)
        sr = jnp.einsum("bhd,bhcd->bhc", qb, rk,
                        preferred_element_type=jnp.float32
                        ) / jnp.sqrt(jnp.float32(d))
        if ring_quant:
            sr = sr * self._repeat_kv(rks).astype(jnp.float32)
        r_valid = (jnp.arange(C) <= ring_idx)[None, None, :]
        sr = jnp.where(r_valid, sr, -1e30)
        m_r = jnp.max(sr, axis=-1)                        # [B, Hq]
        e_r = jnp.exp(sr - m_r[..., None])
        e_r = jnp.where(r_valid, e_r, 0.0)
        l_r = jnp.sum(e_r, axis=-1)
        if ring_quant:
            e_r = e_r * self._repeat_kv(rvs).astype(jnp.float32)
        o_r = jnp.einsum("bhc,bhcd->bhd", e_r.astype(x.dtype), rv,
                         preferred_element_type=jnp.float32)

        # ---- exact merge of the two segments' softmax stats ----
        m_all = jnp.maximum(m_f, m_r)
        a_f = jnp.exp(m_f - m_all)
        a_r = jnp.exp(m_r - m_all)
        denom = l_f * a_f + l_r * a_r                      # ring has >= 1
        out = ((o_f * a_f[..., None] + o_r * a_r[..., None])
               / denom[..., None]).astype(x.dtype).reshape(B, 1, Hq * d)
        align = jnp.zeros((B, 0), jnp.float32)
        return (_dense(cfg, cfg.hidden_size, "o_proj", x.dtype)(out),
                ring_k, ring_v, rks, rvs, align)

    def _verify_packed(self, x, q, k, v, frozen_k, frozen_v, fk_scale,
                       fv_scale, frozen_len, ring_k, ring_v, rks, rvs,
                       ring_base, int4_packed):
        """Multi-query decode over the packed-heads frozen cache — the
        speculative-decode verify pass (and, at T == 1, the per-lane-indexed
        draft step).

        q/k/v: [B, T, H(kv), D] fresh block for the T fed tokens per lane.
        Attention spans three segments jointly: the frozen prefix
        (< frozen_len[b]), the committed ring prefix (< ring_base[b]), and a
        causal self-block over the fed tokens.  The ring is READ-ONLY here:
        the block K/V is returned (head-major [B, H, T, D]) and the engine
        writes the committed entries into the ring ONCE per speculation
        cycle — an earlier design wrote the ring inside every layer of
        every draft step and the verify pass, i.e. 4 whole-ring rewrites
        per cycle, and measured 3-5x machinery overhead (docs/PERF.md
        round-3 spec notes).  The T q-rows amortize the dominant frozen-KV
        read — the whole point of speculative decode on this matvec-bound
        step.  Reuses the block-diagonal q / block-extract output trick and
        the int8 x int8 QK of :meth:`_decode_packed`."""
        cfg = self.cfg
        d = cfg.head_dim
        Hq, Hkv = cfg.n_heads, cfg.n_kv_heads
        B, T = q.shape[0], q.shape[1]
        kv_of = jnp.arange(Hq) // max(1, Hq // Hkv)
        onehot = (kv_of[:, None] == jnp.arange(Hkv)[None, :])  # [Hq, Hkv]

        kt = k.transpose(0, 2, 1, 3)                 # [B, Hkv, T, D]
        vt = v.transpose(0, 2, 1, 3)
        ring_quant = rks is not None
        C = ring_k.shape[2]
        cpos = jnp.arange(C)[None, :]                # [1, C]

        # ---- scores: [B, T, Hq, {S | C | T}] ----
        fkp, fvp = frozen_k, frozen_v
        if int4_packed:
            fkp, fvp = unpack_int4(fkp), unpack_int4(fvp)
        S = fkp.shape[1]
        # frozen QK/PV use einsums SHAPE-IDENTICAL to the tuned decode
        # path's ("bxD,bsD->bxs" with x = T*Hq fused) — a distinct einsum
        # form over the same cache risks XLA choosing a different layout
        # and relayouting the whole frozen cache per pass (the packed-heads
        # design exists precisely because of that failure mode)
        if fk_scale is not None:
            qf = q.astype(jnp.float32)               # [B, T, Hq, D]
            qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9
            q8 = jnp.clip(jnp.round(qf / qa * 127.0), -127,
                          127).astype(jnp.int8)
            qbd = (q8[:, :, :, None, :]
                   * onehot.astype(jnp.int8)[None, None, :, :, None]
                   ).reshape(B, T * Hq, Hkv * d)
            s32 = jnp.einsum("bxD,bsD->bxs", qbd, fkp,
                             preferred_element_type=jnp.int32
                             ).reshape(B, T, Hq, S)
            sf = (s32.astype(jnp.float32)
                  * (qa / (127.0 * jnp.sqrt(jnp.float32(d))))
                  * fk_scale[:, kv_of][:, None].astype(jnp.float32))
        else:
            qbd = (q[:, :, :, None, :]
                   * onehot.astype(x.dtype)[None, None, :, :, None]
                   ).reshape(B, T * Hq, Hkv * d)
            sf = jnp.einsum("bxD,bsD->bxs", qbd, fkp.astype(x.dtype),
                            preferred_element_type=jnp.float32
                            ).reshape(B, T, Hq, S) / jnp.sqrt(jnp.float32(d))

        rk = self._repeat_kv(ring_k)
        rv_ = self._repeat_kv(ring_v)
        if ring_quant:
            rk = rk.astype(x.dtype)
            rv_ = rv_.astype(x.dtype)
        sr = jnp.einsum("bthd,bhcd->bthc", q.astype(x.dtype), rk,
                        preferred_element_type=jnp.float32
                        ) / jnp.sqrt(jnp.float32(d))
        if ring_quant:
            sr = sr * self._repeat_kv(rks)[:, None].astype(jnp.float32)

        kq_self = self._repeat_kv(kt)                # [B, Hq, T, D]
        ss = jnp.einsum("bthd,bhud->bthu", q, kq_self,
                        preferred_element_type=jnp.float32
                        ) / jnp.sqrt(jnp.float32(d))

        f_valid = (jnp.arange(S)[None, :] <
                   frozen_len[:, None])[:, None, None, :]
        r_valid = (cpos < ring_base[:, None])[:, None, None, :]
        s_causal = (jnp.arange(T)[None, :] <=
                    jnp.arange(T)[:, None])[None, :, None, :]
        sf = jnp.where(f_valid, sf, -1e30)
        sr = jnp.where(r_valid, sr, -1e30)
        ss = jnp.where(s_causal, ss, -1e30)

        m = jnp.maximum(jnp.maximum(
            jnp.max(sf, axis=-1, keepdims=True),
            jnp.max(sr, axis=-1, keepdims=True)),
            jnp.max(ss, axis=-1, keepdims=True))
        ef = jnp.exp(sf - m)
        er = jnp.exp(sr - m)
        es = jnp.exp(ss - m)
        denom = (jnp.sum(ef, -1, keepdims=True)
                 + jnp.sum(er, -1, keepdims=True)
                 + jnp.sum(es, -1, keepdims=True))
        pf = ef / denom
        pr = (er / denom).astype(x.dtype)
        ps = (es / denom).astype(x.dtype)
        # Alignment stream per fed token (spec_decode x align_stop): the
        # head-mean frozen-segment probabilities, exposed before the
        # dequant-scale fold like the decode path.  The extra self/ring
        # softmax terms only rescale each row's denominator, so the
        # text-span argmax the engine takes is identical to the plain
        # decode path's.  [B, T, S]
        align = (jnp.mean(pf, axis=2).astype(jnp.float32)
                 if cfg.align_enabled else
                 jnp.zeros((B, T, 0), jnp.float32))
        if fv_scale is not None:
            pf = pf * fv_scale[:, kv_of][:, None].astype(jnp.float32)
        if ring_quant:
            pr = (pr.astype(jnp.float32)
                  * self._repeat_kv(rvs)[:, None].astype(jnp.float32)
                  ).astype(x.dtype)
        pf = pf.astype(x.dtype)
        of = jnp.einsum("bxs,bsD->bxD", pf.reshape(B, T * Hq, S),
                        fvp.astype(x.dtype),
                        preferred_element_type=jnp.float32)
        of = jnp.einsum("bthgd,hg->bthd", of.reshape(B, T, Hq, Hkv, d),
                        onehot.astype(jnp.float32))
        orr = jnp.einsum("bthc,bhcd->bthd", pr, rv_,
                         preferred_element_type=jnp.float32)
        vq_self = self._repeat_kv(vt)
        os_ = jnp.einsum("bthu,bhud->bthd", ps, vq_self,
                         preferred_element_type=jnp.float32)
        out = (of + orr + os_).astype(x.dtype).reshape(B, T, Hq * d)
        # return the fed block's K/V (head-major); the engine writes the
        # committed prefix into the ring once per speculation cycle
        return (_dense(cfg, cfg.hidden_size, "o_proj", x.dtype)(out),
                kt, vt, align)


class MLP(nn.Module):
    cfg: T3ModelConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        gate = _dense(cfg, cfg.intermediate_size, "gate_proj", x.dtype)(x)
        up = _dense(cfg, cfg.intermediate_size, "up_proj", x.dtype)(x)
        return _dense(cfg, cfg.hidden_size, "down_proj", x.dtype)(jax.nn.silu(gate) * up)


class LlamaBlock(nn.Module):
    cfg: T3ModelConfig

    @nn.compact
    def __call__(self, x, layer_kv, positions, valid_len, inv_freq, ring_idx,
                 ring_base=None):
        """Scanned layer.  layer_kv is either (None-mode) a placeholder for
        block mode or (frozen_k, frozen_v, ring_k, ring_v) for decode /
        verify (ring_base set selects the multi-query verify path)."""
        attn_in = RMSNorm(self.cfg.rms_norm_eps, name="input_layernorm")(x)
        attn = Attention(self.cfg, name="self_attn")
        if ring_idx is None and ring_base is None:
            out, kc, vc = attn(attn_in, positions, valid_len, inv_freq)
            kv_out = (kc, vc)
        elif ring_base is not None:
            fk, fv, fks, fvs, rk, rv, rks, rvs = layer_kv
            out, bk, bv, align = attn(
                attn_in, positions, valid_len, inv_freq,
                frozen_k=fk, frozen_v=fv, frozen_len=valid_len,
                ring_k=rk, ring_v=rv, ring_idx=None,
                frozen_k_scale=fks, frozen_v_scale=fvs,
                ring_k_scale=rks, ring_v_scale=rvs, ring_base=ring_base)
            kv_out = (bk, bv, align)
        else:
            fk, fv, fks, fvs, rk, rv, rks, rvs = layer_kv
            out, nrk, nrv, nrks, nrvs, align = attn(
                attn_in, positions, valid_len, inv_freq,
                frozen_k=fk, frozen_v=fv, frozen_len=valid_len,
                ring_k=rk, ring_v=rv, ring_idx=ring_idx,
                frozen_k_scale=fks, frozen_v_scale=fvs,
                ring_k_scale=rks, ring_v_scale=rvs)
            kv_out = (nrk, nrv, nrks, nrvs, align)
        x = x + out
        x = x + MLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.rms_norm_eps, name="post_attention_layernorm")(x))
        return x, kv_out


class LlamaBackbone(nn.Module):
    """30-layer Llama trunk on pre-computed input embeddings (the T3 level
    feeds mixed cond/text/speech embeddings, as the reference does via
    ``inputs_embeds``)."""
    cfg: T3ModelConfig

    def _scan(self):
        return nn.scan(
            LlamaBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast, nn.broadcast),
            out_axes=0,
            length=self.cfg.n_layers,
        )

    @nn.compact
    def __call__(self, embeds, positions, valid_len, *, mode="block",
                 frozen: Optional[KVCache] = None,
                 ring: Optional[KVCache] = None,
                 ring_idx=None, ring_base=None):
        cfg = self.cfg
        inv_freq = llama3_rope_frequencies(cfg)
        scan = self._scan()

        if mode == "block":
            dummy = jnp.zeros((cfg.n_layers, 0), embeds.dtype)
            x, (ks, vs) = scan(cfg, name="layers")(
                embeds, dummy, positions, valid_len, inv_freq, None, None)
            x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
            return x, KVCache(k=ks, v=vs)

        if mode == "verify":
            # ring is READ-ONLY in verify mode; the fed block's K/V comes
            # back stacked head-major [L, B, Hkv, T, D] for the engine to
            # commit into the ring once per speculation cycle
            x, (bk, bv, align) = scan(cfg, name="layers")(
                embeds, (frozen.k, frozen.v, frozen.k_scale, frozen.v_scale,
                         ring.k, ring.v, ring.k_scale, ring.v_scale),
                positions, valid_len, inv_freq, None, ring_base)
            x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
            return x, KVCache(k=bk, v=bv), align

        x, (nrk, nrv, nrks, nrvs, align) = scan(cfg, name="layers")(
            embeds, (frozen.k, frozen.v, frozen.k_scale, frozen.v_scale,
                     ring.k, ring.v, ring.k_scale, ring.v_scale),
            positions, valid_len, inv_freq, ring_idx, None)
        x = RMSNorm(cfg.rms_norm_eps, name="norm")(x)
        return x, KVCache(k=nrk, v=nrv, k_scale=nrks, v_scale=nrvs), align
