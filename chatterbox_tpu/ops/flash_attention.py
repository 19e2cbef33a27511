"""Pallas flash self-attention (non-causal, key-length masked) for TPU.

Replaces materialized [B, H, T, T] float32 score tensors in the S3Gen CFM
estimator (56 transformer blocks at T~700 — the softmax traffic dominates the
whole vocoder) with an online-softmax kernel: scores never leave VMEM.

Contract: q, k, v: [B, H, T, D]; kv_len: [B] valid key count (padded keys are
masked; padded query rows produce garbage the caller slices off).  Returns
[B, H, T, D] in q's dtype.

The kernel is VPU-bound (the exp + reduction passes over the [bq, bk] score
block dwarf the K=64 matmuls), so round-5 cut elementwise passes:

* softmax runs in the exp2 domain with ``scale * log2(e)`` folded into q
  OUTSIDE the kernel — exp lowers to exp2+mul on the VPU anyway, so this
  deletes one full [bq, bk] multiply pass per block;
* when one k block covers the padded sequence (the shipped bq=1024 /
  bk=whole-T configuration), a single-pass kernel runs plain softmax with
  no m/l scratch carry or correction terms.

(A conditional key mask — skip the where pass when the block is fully
valid — measured SLOWER: Mosaic executes both lax.cond branches for
vector results.  The mask stays unconditional.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = float(np.log2(np.e))


def _mask_tail(s, kv_len, col0):
    bq, bk = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + col0
    return jnp.where(col < kv_len, s, NEG_INF)


def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, bq, bk):
    """Multi-k-block online softmax (exp2 domain; q pre-scaled)."""
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # [bq, D] (pre-scaled by scale*log2e)
    k = k_ref[0]                      # [bk, D]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [bq, bk]

    bh = pl.program_id(0)
    kv_len = kvlen_ref[bh]
    # unconditional mask: a lax.cond here measured SLOWER (Mosaic executes
    # both branches for vector results), see docs/PERF.md round 5
    s = _mask_tail(s, kv_len, ik * bk)

    m_prev = m_scr[:, 0][:, None]                            # [bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)                                  # [bq, bk]
    corr = jnp.exp2(m_prev - m_new)                          # [bq, 1]

    l_new = l_scr[:, 0][:, None] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[0] = (acc_scr[:] /
                    jnp.maximum(l_scr[:, 0][:, None], 1e-30)).astype(o_ref.dtype)


def _flash_kernel_v1(kvlen_ref, q_ref, k_ref, v_ref, o_ref,
                     m_scr, l_scr, acc_scr, *, bq, bk, scale):
    """Round-4 kernel (natural-exp domain, unconditional mask) kept for
    same-window A/B measurement (tools/ubench_flash.py --ab)."""
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    bh = pl.program_id(0)
    kv_len = kvlen_ref[bh]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ik * bk
    s = jnp.where(col < kv_len, s, NEG_INF)
    m_prev = m_scr[:, 0][:, None]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, 0][:, None] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[0] = (acc_scr[:] /
                    jnp.maximum(l_scr[:, 0][:, None], 1e-30)).astype(o_ref.dtype)


def _flash_kernel_single(kvlen_ref, q_ref, k_ref, v_ref, o_ref, *, bq, bk):
    """One k block covers the whole (padded) sequence: plain softmax, no
    online-correction carry, no scratch."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [bq, bk]
    bh = pl.program_id(0)
    kv_len = kvlen_ref[bh]
    s = _mask_tail(s, kv_len, 0)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bq", "bk", "interpret", "impl"))
def flash_self_attention(q, k, v, kv_len, bq: int = 1024, bk: int = 1024,
                         interpret: bool = False, impl: str = "v2"):
    """q, k, v: [B, H, T, D]; kv_len: [B] int32.  Non-causal, key-masked."""
    B, H, T, D = q.shape
    scale = 1.0 / np.sqrt(D)
    # Block sizes must DIVIDE the (128-rounded) sequence so the wrapper
    # never re-pads beyond one tile: bq = the largest 128-multiple divisor
    # of ceil128(T) within the requested bq; bk likewise (bk = whole-T by
    # default — k/v block revisiting measured fastest, docs/PERF.md).
    T128 = -(-T // 128) * 128
    def _fit(b):
        b = min(b, T128)
        while T128 % b:
            b -= 128
        return max(b, 128)
    bq = _fit(bq)
    bk = _fit(bk)
    Tp = T128
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    if impl == "v2":
        # fold scale AND the exp->exp2 base change into q once (saves a
        # full [bq, bk] VPU multiply pass per block inside the kernel)
        q = q * jnp.asarray(scale * LOG2E, q.dtype)

    qf = q.reshape(B * H, Tp, D)
    kf = k.reshape(B * H, Tp, D)
    vf = v.reshape(B * H, Tp, D)
    kvlen_bh = jnp.repeat(kv_len.astype(jnp.int32), H)

    single = (Tp // bk) == 1 and impl == "v2"
    if impl == "v2":
        kern = functools.partial(
            _flash_kernel_single if single else _flash_kernel, bq=bq, bk=bk)
    else:
        kern = functools.partial(_flash_kernel_v1, bq=bq, bk=bk, scale=scale)
    grid = (B * H, Tp // bq, Tp // bk)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda bh, iq, ik, *_: (bh, iq, 0)),
                pl.BlockSpec((1, bk, D), lambda bh, iq, ik, *_: (bh, ik, 0)),
                pl.BlockSpec((1, bk, D), lambda bh, iq, ik, *_: (bh, ik, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda bh, iq, ik, *_: (bh, iq, 0)),
            scratch_shapes=[] if single else [
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, D), q.dtype),
        interpret=interpret,
    )(kvlen_bh, qf, kf, vf)
    return out.reshape(B, H, Tp, D)[:, :, :T]
