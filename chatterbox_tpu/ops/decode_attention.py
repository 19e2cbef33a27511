"""Pallas fused decode attention: frozen-prefix + ring, one kernel per layer.

Device profiling of the T3 decode chunk (tools/xprof.py) showed two XLA
fusions — q.K^T over the frozen cache and p.V — eating ~80% of step time at
~4x off bandwidth-bound (the M=1 matvec tiles the MXU poorly and the s8->f32
convert + f32 score tensor round-trip through HBM).  This kernel streams each
(lane, head)'s K and V through VMEM once, computes scores + joint softmax
(frozen ++ ring) + output in-register, inserts the step's K/V into the ring
in place (input_output_aliases), and applies int8 dequant scales inline.

Mosaic notes: grid is (B, H) so every tensor inside the kernel is 2-D
[S|C, D] — unit-dim-inserting reshapes and dots with empty non-contracting
dims are rejected at higher ranks, and per-lane whole-[H,S,D] float32
temporaries blow the 16 MB VMEM budget.

Shapes (one decode step):
  q, k_new, v_new: [B, H, D]
  frozen_k/v:      [B, H, S, D]  int8 or bf16
  fk/fv_scale:     [B, H, S]     float32 (pass ones for bf16 caches)
  ring_k/v:        [B, H, C, D]  bf16 (aliased outputs)
  ring_idx:        scalar int32 (chunk step)
  frozen_len:      [B] int32 (frozen valid length per lane)
Returns (out [B, H, D], new_ring_k, new_ring_v).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(flen_ref, ridx_ref, q_ref, kn_ref, vn_ref, fk_ref, fv_ref,
            ks_ref, vs_ref, rk_ref, rv_ref,
            out_ref, rko_ref, rvo_ref, *, scale):
    b = pl.program_id(0)
    flen = flen_ref[b]
    ridx = ridx_ref[0]

    S, D = fk_ref.shape[2], fk_ref.shape[3]
    C = rk_ref.shape[2]

    # ring insert via select (kn is [1, D], broadcasts over C)
    sel = jax.lax.broadcasted_iota(jnp.int32, (C, D), 0) == ridx
    rko_ref[0, 0] = jnp.where(sel, kn_ref[0, 0].astype(rko_ref.dtype),
                              rk_ref[0, 0])
    rvo_ref[0, 0] = jnp.where(sel, vn_ref[0, 0].astype(rvo_ref.dtype),
                              rv_ref[0, 0])

    q2 = q_ref[0, 0].astype(jnp.float32)                  # [1, D]
    k = fk_ref[0, 0].astype(jnp.float32)                  # [S, D]
    sf = jnp.sum(k * q2, axis=-1, keepdims=True) * scale  # [S, 1]
    sf = sf * ks_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    sf = jnp.where(col < flen, sf, NEG)

    rk = rko_ref[0, 0].astype(jnp.float32)                # [C, D]
    sr = jnp.sum(rk * q2, axis=-1, keepdims=True) * scale  # [C, 1]
    rcol = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    sr = jnp.where(rcol <= ridx, sr, NEG)

    m = jnp.maximum(jnp.max(sf), jnp.max(sr))
    pf = jnp.exp(sf - m)                                  # [S, 1]
    pr = jnp.exp(sr - m)                                  # [C, 1]
    denom = jnp.sum(pf) + jnp.sum(pr)

    pf = pf * vs_ref[0, 0]                                # fold v dequant
    v = fv_ref[0, 0].astype(jnp.float32)
    rv = rvo_ref[0, 0].astype(jnp.float32)
    o = (jnp.sum(pf * v, axis=0, keepdims=True)
         + jnp.sum(pr * rv, axis=0, keepdims=True)) / denom   # [1, D]
    out_ref[0, 0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_attention(q, k_new, v_new, frozen_k, frozen_v,
                           fk_scale, fv_scale, ring_k, ring_v,
                           ring_idx, frozen_len, interpret: bool = False):
    B, H, D = q.shape
    S = frozen_k.shape[2]
    C = ring_k.shape[2]
    scale = 1.0 / np.sqrt(D)

    def bh(*blk):
        return pl.BlockSpec(blk, lambda b, h, *_: (b, h) + (0,) * (len(blk) - 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H),
        in_specs=[
            bh(1, 1, 1, D),       # q
            bh(1, 1, 1, D),       # k_new
            bh(1, 1, 1, D),       # v_new
            bh(1, 1, S, D),       # frozen_k
            bh(1, 1, S, D),       # frozen_v
            bh(1, 1, S, 1),       # fk_scale
            bh(1, 1, S, 1),       # fv_scale
            bh(1, 1, C, D),       # ring_k
            bh(1, 1, C, D),       # ring_v
        ],
        out_specs=[
            bh(1, 1, 1, D),
            bh(1, 1, C, D),
            bh(1, 1, C, D),
        ],
    )
    out, nrk, nrv = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
            jax.ShapeDtypeStruct(ring_k.shape, ring_k.dtype),
            jax.ShapeDtypeStruct(ring_v.shape, ring_v.dtype),
        ],
        # operand indices count the 2 scalar-prefetch args first
        input_output_aliases={9: 1, 10: 2},
        interpret=interpret,
    )(frozen_len.astype(jnp.int32),
      jnp.full((1,), ring_idx, jnp.int32),
      q[:, :, None, :], k_new[:, :, None, :], v_new[:, :, None, :],
      frozen_k, frozen_v,
      fk_scale.astype(jnp.float32)[..., None],
      fv_scale.astype(jnp.float32)[..., None],
      ring_k, ring_v)
    return out[:, :, 0], nrk, nrv
