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
