"""Ragged per-lane decode attention over the packed-heads frozen KV cache.

The engine's decode step reads the WHOLE ``s_active`` window ``[B2, S,
H*D]`` for every lane even though lane b only has ``frozen_len[b]`` valid
positions — at the parity workload's position mix ~1.5x of the dominant
HBM read is beyond-length waste (docs/PERF.md round-4 roofline notes).
XLA cannot skip those bytes: the mask is applied after the gather.  This
Pallas kernel skips them physically.

Design (same bytes as the shipped XLA block-diagonal math at dense
shapes — backbone._decode_packed / ubench v9):

* grid ``(B2/2, S/block_s)`` — CFG lane pairs (cond at 2s, uncond at 2s+1,
  runtime/engine.py slot layout) share one request's ``frozen_len``, so a
  2-lane block skips with zero granularity loss;
* ``frozen_len`` is scalar-prefetched; the K/V/scale index maps clamp the
  S-block index at each lane's last live block, so a skipped grid step
  revisits the previous block and issues NO DMA (the standard ragged-
  attention revisit trick) — beyond-length bytes are never read;
* everything is POSITION-MAJOR to stay inside Mosaic's layout rules (no
  minor-dim reshapes): QK is one int8 MXU matmul ``[block_s, H*D] x
  [H*D, H]`` against the block-diagonal q (each q head's row occupies its
  kv head's D-slice of the packed minor dim), giving scores
  ``[block_s, H]``; PV broadcasts the weights across each head's D-slice
  (``pltpu.repeat`` along the minor dim) and reduces over positions on
  the VPU — the flat ``[H*D]`` output needs no in-kernel reshape;
* flash-style running (m, l, o) accumulators in VMEM scratch across
  S-blocks, one output flush per lane group;
* outputs are UNNORMALIZED per-segment softmax stats ``(o, m, l)``; the
  caller merges them with the ring segment's stats (exact joint softmax,
  same math as backbone._decode_packed's fused version).

Reference behavior being replaced: vLLM's PagedAttention CUDA kernel
reads only each request's own pages (SURVEY.md §2.12 row 1); this is the
TPU-native equivalent for the dense slot cache.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 2   # CFG pair


def _expand_heads(x, H, D, dtype):
    """[..., H] -> [..., H*D] where column h*D + d carries x[..., h].

    Implemented as a one-hot [H, H*D] matmul: ``pltpu.repeat`` is a TILE
    repeat ([x0..xH, x0..xH, ...]) in compiled Mosaic — NOT the
    element repeat this mapping needs (measured on-chip; the first kernel
    version silently produced wrong compiled output while interpret mode,
    which used jnp.repeat, was correct).  The tiny MXU matmul is exact
    (0/1 weights) and identical in both modes."""
    hh = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1)
    eye_exp = (cc // D == hh).astype(dtype)
    return jax.lax.dot_general(
        x.astype(dtype), eye_exp, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kernel(len_ref, qbd_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref,
            o_ref, m_ref, l_ref, o_acc, m_acc, l_acc, *, block_s: int,
            n_heads: int, head_dim: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ns = pl.num_programs(1)
    H, D = n_heads, head_dim
    # per-lane lengths: masking is exact for ARBITRARY lanes; the DMA skip
    # (index maps below) uses the pair max, so CFG pairs sharing a length
    # skip with zero granularity loss and unpaired lanes stay correct
    l0 = len_ref[i * LANE_BLOCK]
    l1 = len_ref[i * LANE_BLOCK + 1]
    lane_len = jax.lax.max(l0, l1)

    @pl.when(j == 0)
    def _init():
        m_acc[:] = jnp.full(m_acc.shape, -1e30, m_acc.dtype)
        l_acc[:] = jnp.zeros(l_acc.shape, l_acc.dtype)
        o_acc[:] = jnp.zeros(o_acc.shape, o_acc.dtype)

    @pl.when(j * block_s < lane_len)
    def _block():
        qbd = qbd_ref[:]                       # [2, H*D, H] int8
        kb = k_ref[:]                          # [2, block_s, H*D] int8
        s32 = jax.lax.dot_general(
            kb, qbd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)  # [2, block_s, H]
        s = (s32.astype(jnp.float32) * qs_ref[:]
             * ks_ref[:].astype(jnp.float32))
        pos = j * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (LANE_BLOCK, block_s, H), 1)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (LANE_BLOCK, block_s, H), 0)
        lens_b = jnp.where(lane == 0, l0, l1)
        s = jnp.where(pos < lens_b, s, -1e30)

        m_old = m_acc[:]                       # [2, 1, H]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)         # [2, 1, H]
        e = jnp.exp(s - m_new)                 # [2, block_s, H]
        m_acc[:] = m_new
        l_acc[:] = l_acc[:] * alpha + jnp.sum(e, axis=1, keepdims=True)

        ev = e * vs_ref[:].astype(jnp.float32)           # [2, block_s, H]
        ev_rep = _expand_heads(ev, H, D, jnp.bfloat16)   # [2, block_s, H*D]
        contrib = jnp.sum(
            ev_rep * v_ref[:].astype(jnp.float32),
            axis=1, keepdims=True)                       # [2, 1, H*D]
        alpha_rep = _expand_heads(alpha, H, D, jnp.float32)
        o_acc[:] = o_acc[:] * alpha_rep + contrib

    @pl.when(j == ns - 1)
    def _flush():
        o_ref[:] = o_acc[:]
        m_ref[:] = m_acc[:]
        l_ref[:] = l_acc[:]


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def ragged_decode_attention(lengths, qbd, q_scale, kp, vp, ks, vs,
                            *, block_s: int = 192, interpret: bool = False):
    """Frozen-segment attention stats with per-lane length skipping.

    Args:
      lengths: [B2] int32 — per-lane frozen length.  Masking is exact for
        arbitrary per-lane values; lanes are PROCESSED in adjacent pairs,
        so the DMA skip only engages past the pair's max (CFG cond/uncond
        pairs share a length and lose nothing).
      qbd:     [B2, H, H*D] int8 block-diagonal quantized q rows.
      q_scale: [B2, H] f32 — per-(lane, head) ``qa / (127 * sqrt(D))``.
      kp, vp:  [B2, S, H*D] int8 packed-heads frozen cache (S % block_s == 0).
      ks, vs:  [B2, H, S] per-(head, position) dequant scales (any float
               dtype; transposed to position-major internally).
    Returns:
      (o, m, l): unnormalized PV sum [B2, H, D] f32 (v-scale folded),
      running max m [B2, H] f32 and exp-sum l [B2, H] f32 over the valid
      frozen positions.  All-masked lanes return (0, -1e30, 0).
    """
    B2, S, HD = kp.shape
    H = q_scale.shape[-1]
    D = HD // H
    assert B2 % LANE_BLOCK == 0 and S % block_s == 0, (B2, S, block_s)
    nb, ns = B2 // LANE_BLOCK, S // block_s

    qbd_t = jnp.swapaxes(qbd, 1, 2)    # [B2, H*D, H] — QK contracts H*D
    ks_t = jnp.swapaxes(ks, 1, 2)      # [B2, S, H] position-major
    vs_t = jnp.swapaxes(vs, 1, 2)
    qs3 = q_scale[:, None, :]          # [B2, 1, H]

    def kv_map(i, j, len_ref):
        pair_len = jax.lax.max(len_ref[i * LANE_BLOCK],
                               len_ref[i * LANE_BLOCK + 1])
        last = jax.lax.max((jax.lax.max(pair_len, 1) - 1) // block_s, 0)
        return i, jax.lax.min(j, last), 0

    def lane_map3(i, j, len_ref):
        return i, 0, 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, ns),
        in_specs=[
            pl.BlockSpec((LANE_BLOCK, HD, H), lane_map3),          # qbd_t
            pl.BlockSpec((LANE_BLOCK, 1, H), lane_map3),           # q_scale
            pl.BlockSpec((LANE_BLOCK, block_s, HD), kv_map),       # kp
            pl.BlockSpec((LANE_BLOCK, block_s, HD), kv_map),       # vp
            pl.BlockSpec((LANE_BLOCK, block_s, H), kv_map),        # ks_t
            pl.BlockSpec((LANE_BLOCK, block_s, H), kv_map),        # vs_t
        ],
        out_specs=[
            pl.BlockSpec((LANE_BLOCK, 1, HD), lane_map3),
            pl.BlockSpec((LANE_BLOCK, 1, H), lane_map3),
            pl.BlockSpec((LANE_BLOCK, 1, H), lane_map3),
        ],
        scratch_shapes=[
            pltpu.VMEM((LANE_BLOCK, 1, HD), jnp.float32),
            pltpu.VMEM((LANE_BLOCK, 1, H), jnp.float32),
            pltpu.VMEM((LANE_BLOCK, 1, H), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, block_s=block_s, n_heads=H,
                               head_dim=D)
    o, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B2, 1, HD), jnp.float32),
            jax.ShapeDtypeStruct((B2, 1, H), jnp.float32),
            jax.ShapeDtypeStruct((B2, 1, H), jnp.float32),
        ],
        interpret=interpret,
    )(lengths, qbd_t, qs3, kp, vp, ks_t, vs_t)
    return o.reshape(B2, H, D), m[:, 0], l[:, 0]
