"""Numerical tests for ops: STFT/iSTFT vs torch oracle, sampler semantics,
conv layers vs torch functional ops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from chatterbox_tpu.ops.stft import hann_window, istft, overlap_add, stft_realimag
from chatterbox_tpu.ops.sampling import (SamplerState, SamplingParams,
                                         apply_repetition_penalty, sample_step,
                                         top_p_min_p_mask)


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    n_fft, hop = 16, 4
    win = hann_window(n_fft)
    real, imag = stft_realimag(jnp.asarray(x), jnp.asarray(win), n_fft, hop)
    ref = torch.stft(torch.from_numpy(x), n_fft, hop, n_fft,
                     window=torch.from_numpy(win), return_complex=True)
    np.testing.assert_allclose(np.asarray(real), ref.real.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(imag), ref.imag.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_istft_matches_torch():
    rng = np.random.default_rng(1)
    n_fft, hop, frames = 16, 4, 257
    win = hann_window(n_fft)
    mag = rng.uniform(0.1, 2.0, (2, n_fft // 2 + 1, frames)).astype(np.float32)
    ph = rng.uniform(-1, 1, (2, n_fft // 2 + 1, frames)).astype(np.float32)
    real, imag = mag * np.cos(ph), mag * np.sin(ph)
    out = istft(jnp.asarray(real), jnp.asarray(imag), jnp.asarray(win), n_fft, hop)
    ref = torch.istft(torch.complex(torch.from_numpy(real), torch.from_numpy(imag)),
                      n_fft, hop, n_fft, window=torch.from_numpy(win))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_overlap_add_basic():
    frames = jnp.ones((1, 3, 4))
    y = overlap_add(frames, 2)  # frames at 0, 2, 4; length (3-1)*2+4 = 8
    expect = np.array([1, 1, 2, 2, 2, 2, 1, 1], np.float32)
    np.testing.assert_allclose(np.asarray(y[0]), expect)


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    seen = jnp.asarray([[True, True, False]])
    out = apply_repetition_penalty(logits, seen, jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, -4.0, 1.0])


def test_top_p_keeps_nucleus():
    # probs ~ [0.6, 0.3, 0.08, 0.02]; top_p=0.7 keeps first two
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.08, 0.02]]))
    out = np.asarray(top_p_min_p_mask(logits, jnp.asarray([0.7]),
                                      jnp.asarray([0.0])))
    assert np.isfinite(out[0, :2]).all()
    assert np.isinf(out[0, 2:]).all() and (out[0, 2:] < 0).all()


def test_min_p_filters():
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.08, 0.02]]))
    out = np.asarray(top_p_min_p_mask(logits, jnp.asarray([1.0]),
                                      jnp.asarray([0.2])))  # thr = 0.12
    assert np.isfinite(out[0, :2]).all()
    assert np.isinf(out[0, 2:]).all()


def test_greedy_sampling():
    logits = jnp.asarray([[0.1, 5.0, 0.2], [3.0, 0.0, 0.1]])
    params = SamplingParams.full(2, temperature=0.0)
    st = SamplerState.init(2, 3, jax.random.PRNGKey(0))
    toks, st2 = sample_step(logits, params, st)
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])
    assert bool(st2.seen[0, 1]) and bool(st2.seen[1, 0])


def test_sampling_respects_mask():
    """With top_p tiny, sampling must be near-greedy."""
    logits = jnp.asarray([[0.0, 8.0, 0.0, 0.0]])
    params = SamplingParams.full(1, temperature=1.0, top_p=0.01, min_p=0.0,
                                 repetition_penalty=1.0)
    st = SamplerState.init(1, 4, jax.random.PRNGKey(3))
    for _ in range(5):
        toks, st = sample_step(logits, params, st._replace(
            seen=jnp.zeros_like(st.seen)))
        assert int(toks[0]) == 1


def test_top_p_bisection_matches_sorted_reference():
    """The sort-free nucleus must match the exact sorted-cumsum nucleus."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 512)) * 3.0)
    top_p = jnp.asarray(rng.uniform(0.1, 0.95, size=8).astype(np.float32))
    out = np.asarray(top_p_min_p_mask(logits, top_p, jnp.zeros(8)))

    probs = np.asarray(jax.nn.softmax(logits, axis=-1), np.float64)
    for b in range(8):
        order = np.argsort(-probs[b])
        cum = np.cumsum(probs[b][order])
        keep_sorted = (cum - probs[b][order]) < float(top_p[b])
        ref_keep = np.zeros(512, bool)
        ref_keep[order[keep_sorted]] = True
        got_keep = np.isfinite(out[b])
        # identical except possibly tokens within bisection resolution of
        # the threshold
        tau = probs[b][order][keep_sorted].min()
        fuzzy = np.abs(probs[b] - tau) < 1e-6
        assert (got_keep == ref_keep)[~fuzzy].all()
        assert got_keep.sum() >= 1


def test_flash_attention_matches_reference_softmax():
    """Pallas flash kernel (interpret mode on CPU) vs the plain masked
    softmax attention it replaces, including ragged kv lengths and the
    T -> block-multiple padding path."""
    from chatterbox_tpu.ops.flash_attention import flash_self_attention
    from chatterbox_tpu.utils.layers import masked_softmax_attention

    rng = np.random.default_rng(5)
    B, H, T, D = 2, 3, 200, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    lens = jnp.asarray([200, 137], jnp.int32)

    got = flash_self_attention(q, k, v, lens, bq=128, bk=128, interpret=True)
    key_mask = (jnp.arange(T)[None, :] < lens[:, None])[:, None, None, :]
    ref = masked_softmax_attention(q, k, v, key_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_no_sort_fast_path_identical_when_top_p_one():
    """needs_top_p=False (min-p-only fast path) must sample bit-identically
    to the full path whenever every request has top_p == 1 — the engine
    selects the fast path statically (runtime/engine.py), so divergence here
    would change outputs depending on batch composition."""
    rng = np.random.default_rng(7)
    B, V = 6, 512
    logits = jnp.asarray(rng.standard_normal((B, V)) * 4.0)
    params = SamplingParams.full(B, temperature=0.8, top_p=1.0, min_p=0.05,
                                 repetition_penalty=2.0)
    key = jax.random.PRNGKey(11)
    st_a = SamplerState.init(B, V, key)
    st_b = SamplerState.init(B, V, key)
    # pre-mark some seen tokens so the repetition penalty participates
    seen = jnp.zeros((B, V), bool).at[:, :17].set(True)
    st_a = st_a._replace(seen=seen)
    st_b = st_b._replace(seen=seen)
    for _ in range(4):
        ta, st_a = sample_step(logits, params, st_a, needs_top_p=True)
        tb, st_b = sample_step(logits, params, st_b, needs_top_p=False)
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))


def test_quant_dense_act_quant_close():
    """W8A8 (per-row int8 activations, int8 x int8 MXU dot) must stay close
    to the weight-only int8 path: the activation quant adds <=~0.8% relative
    error over a 1024-wide dot."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chatterbox_tpu.ops.quant import QuantDense, quantize_kernel

    rng = np.random.default_rng(0)
    w = rng.standard_normal((1024, 512)).astype(np.float32) * 0.02
    x = rng.standard_normal((8, 1024)).astype(np.float32)
    w_q, scale = quantize_kernel(w)
    params = {"params": {"w_q": jnp.asarray(w_q), "scale": jnp.asarray(scale)}}

    y_w8 = QuantDense(512).apply(params, jnp.asarray(x))
    y_w8a8 = QuantDense(512, act_quant=True).apply(params, jnp.asarray(x))
    ref = np.abs(np.asarray(y_w8, np.float32))
    err = np.abs(np.asarray(y_w8a8, np.float32) - np.asarray(y_w8, np.float32))
    denom = np.maximum(ref.mean(), 1e-6)
    assert err.mean() / denom < 8e-3, err.mean() / denom


def test_ragged_decode_matches_reference_math():
    """ops/ragged_decode.py vs plain masked softmax-stat math (interpret
    mode on CPU): ragged block skipping must be numerically exact up to
    bf16 PV accumulation order."""
    from chatterbox_tpu.ops.ragged_decode import ragged_decode_attention

    B2, H, D, S = 8, 4, 16, 192
    HD = H * D
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    kp = jax.random.randint(keys[0], (B2, S, HD), -127, 128, jnp.int8)
    vp = jax.random.randint(keys[1], (B2, S, HD), -127, 128, jnp.int8)
    ks = jax.random.uniform(keys[2], (B2, H, S), jnp.float32, 0.5,
                            1.5).astype(jnp.bfloat16)
    vs = jax.random.uniform(keys[3], (B2, H, S), jnp.float32, 0.5,
                            1.5).astype(jnp.bfloat16)
    q8 = jax.random.randint(keys[4], (B2, H, D), -127, 128, jnp.int8)
    qs = jax.random.uniform(keys[5], (B2, H), jnp.float32, 0.001, 0.01)
    # deliberately UNPAIRED per-lane lengths: masking must be exact for
    # arbitrary lanes (the CFG pair structure only affects DMA skipping)
    lengths = jnp.asarray(np.array([5, 37, 96, 192, 10, 150, 192, 64],
                                   np.int32))
    eye = jnp.eye(H, dtype=jnp.int8)
    qbd = (q8[:, :, None, :] * eye[None, :, :, None]).reshape(B2, H, HD)

    o, m, l = ragged_decode_attention(lengths, qbd, qs, kp, vp, ks, vs,
                                      block_s=16, interpret=True)

    s32 = jnp.einsum("bhD,bsD->bhs", qbd, kp,
                     preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * qs[..., None] * ks.astype(jnp.float32)
    valid = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, :]
    s = jnp.where(valid, s, -1e30)
    m_ref = jnp.max(s, -1)
    e = jnp.where(valid, jnp.exp(s - m_ref[..., None]), 0.0)
    l_ref = jnp.sum(e, -1)
    ev = (e * vs.astype(jnp.float32)).astype(jnp.bfloat16)
    of = jnp.einsum("bhs,bsD->bhD", ev, vp.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    o_ref = jnp.sum(of.reshape(B2, H, H, D)
                    * jnp.eye(H)[None, :, :, None], axis=2)

    # the kernel multiplies the scale factors in a different association
    # (position-major), so scores round differently in f32; exp amplifies
    # that to ~1e-3 relative on l/o — the module-level A/B below bounds the
    # end-to-end effect
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(o_ref),
        atol=1e-2 * float(jnp.abs(o_ref).max()))


def test_ragged_decode_attention_module_ab():
    """backbone Attention decode mode: decode_kernel='ragged' must match
    'xla' on an int8 packed frozen cache + quantized ring (the full
    two-segment joint softmax, v-scale folding, o_proj)."""
    import dataclasses
    from chatterbox_tpu.config import T3ModelConfig
    from chatterbox_tpu.models.t3.backbone import (Attention, quantize_kv,
                                                   quantize_kv_packed)

    cfg = dataclasses.replace(T3ModelConfig.tiny(), n_heads=4, n_kv_heads=4,
                              head_dim=16, hidden_size=64)
    S, C, B2 = 96, 8, 4
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 8)
    x = jax.random.normal(keys[0], (B2, 1, cfg.hidden_size), jnp.float32)
    positions = jnp.full((B2, 1), 40, jnp.int32)
    inv_freq = jnp.ones((cfg.head_dim // 2,), jnp.float32) * 0.01
    fk = jax.random.normal(keys[1], (B2, cfg.n_kv_heads, S, cfg.head_dim))
    fv = jax.random.normal(keys[2], (B2, cfg.n_kv_heads, S, cfg.head_dim))
    fkp, fks = quantize_kv_packed(fk)
    fvp, fvs = quantize_kv_packed(fv)
    rk = jax.random.normal(keys[3], (B2, cfg.n_kv_heads, C, cfg.head_dim))
    rv = jax.random.normal(keys[4], (B2, cfg.n_kv_heads, C, cfg.head_dim))
    rkq, rksc = quantize_kv(rk)
    rvq, rvsc = quantize_kv(rv)
    frozen_len = jnp.asarray([37, 37, 96, 96], jnp.int32)

    outs = {}
    for kind in ("xla", "ragged"):
        c = dataclasses.replace(cfg, decode_kernel=kind)
        attn = Attention(c)
        args = dict(positions=positions, valid_len=None, inv_freq=inv_freq,
                    frozen_k=fkp, frozen_v=fvp, frozen_len=frozen_len,
                    ring_k=rkq, ring_v=rvq, ring_idx=3,
                    frozen_k_scale=fks.astype(jnp.bfloat16),
                    frozen_v_scale=fvs.astype(jnp.bfloat16),
                    ring_k_scale=rksc.astype(jnp.bfloat16),
                    ring_v_scale=rvsc.astype(jnp.bfloat16))
        params = attn.init(jax.random.PRNGKey(7), x, **args)
        outs[kind] = attn.apply(params, x, **args)

    o_x, o_r = outs["xla"][0], outs["ragged"][0]
    scale = float(jnp.abs(o_x).max())
    np.testing.assert_allclose(np.asarray(o_r), np.asarray(o_x),
                               atol=5e-3 * scale)
