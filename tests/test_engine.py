"""Engine integration tests on a tiny T3: continuous batching, stop handling,
determinism, per-request cfg_scale."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.config import T3ModelConfig, EngineConfig
from chatterbox_tpu.models.t3.model import T3Model
from chatterbox_tpu.runtime.engine import Request, T3Engine


@pytest.fixture(scope="module")
def setup():
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tt = 2, 8
    spk = jax.random.normal(rng, (B, cfg.speaker_embed_size))
    ptoks = jax.random.randint(rng, (B, 6), 0, cfg.start_speech_token)
    emo = 0.5 * jnp.ones((B, 1))
    text = jax.random.randint(rng, (B, Tt), 0, cfg.text_vocab_size)
    tlen = jnp.array([5, 8], jnp.int32)
    params = jax.jit(lambda r: model.init(
        r, spk, ptoks, emo, text, tlen, method=lambda m, *a: m.init_all(*a)))(rng)
    eng = EngineConfig(max_batch_size=4, max_model_len=96, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=16,
                       kv_dtype="float32")
    return cfg, model, params, eng


def mk_req(cfg, rng, n_text, max_new=8, **kw):
    text = np.asarray(jax.random.randint(rng, (n_text,), 0, cfg.text_vocab_size))
    cond = np.asarray(jax.random.normal(rng, (cfg.cond_len, cfg.hidden_size)))
    return Request(text_ids=text.astype(np.int32), cond_emb=cond,
                   max_new_tokens=max_new, **kw)


def test_generate_batch(setup):
    cfg, model, params, eng = setup
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(7))
    rngs = jax.random.split(jax.random.PRNGKey(1), 6)
    reqs = [mk_req(cfg, rngs[i], n_text=4 + i, max_new=6 + i) for i in range(6)]
    results = engine.generate(reqs)
    assert len(results) == 6
    for i, r in enumerate(results):
        assert 1 <= len(r.tokens) <= reqs[i].max_new_tokens
        valid = (r.tokens < cfg.start_speech_token) | \
                (r.tokens == cfg.stop_speech_token)
        assert valid.all(), r.tokens


def test_overlong_prompt_rejected(setup):
    """A prompt beyond the largest prefill bucket must raise, not be
    silently cropped (VERDICT r4 missing #6: vLLM rejects > max_model_len)."""
    cfg, model, params, eng = setup
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(3))
    bad = mk_req(cfg, jax.random.PRNGKey(4),
                 n_text=eng.prefill_buckets[-1] + 1, max_new=4)
    with pytest.raises(ValueError, match="exceeds the engine's prompt"):
        engine.generate([bad])
    # a max-bucket-sized prompt still runs
    ok = mk_req(cfg, jax.random.PRNGKey(4),
                n_text=eng.prefill_buckets[-1], max_new=4)
    res = engine.generate([ok])
    assert len(res) == 1 and len(res[0].tokens) >= 1


def test_deterministic_greedy(setup):
    cfg, model, params, eng = setup
    out = []
    for trial in range(2):
        engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(trial))
        reqs = [mk_req(cfg, jax.random.PRNGKey(5), n_text=6, max_new=8,
                       temperature=0.0)]
        out.append(engine.generate(reqs)[0].tokens)
    np.testing.assert_array_equal(out[0], out[1])


def test_continuous_refill(setup):
    """More requests than slots: slots must be reused."""
    cfg, model, params, eng = setup
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(9))
    rngs = jax.random.split(jax.random.PRNGKey(2), 10)
    reqs = [mk_req(cfg, rngs[i], n_text=4, max_new=4 + (i % 5)) for i in range(10)]
    results = engine.generate(reqs)
    assert len(results) == 10
    assert all(len(r.tokens) >= 1 for r in results)


def test_per_request_cfg_scale(setup):
    """Different cfg_scale must change greedy outputs (given random weights)."""
    cfg, model, params, eng = setup
    outs = []
    for scale in (0.0, 5.0):
        engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(3))
        reqs = [mk_req(cfg, jax.random.PRNGKey(4), n_text=6, max_new=8,
                       temperature=0.0, cfg_scale=scale)]
        outs.append(engine.generate(reqs)[0].tokens)
    assert not np.array_equal(outs[0], outs[1])


def _align_engine(patience, margin, max_new=24):
    import dataclasses as dc
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.runtime.engine import Request, T3Engine
    cfg = dc.replace(T3ModelConfig.tiny(), align_enabled=True, align_layer=1)
    model = T3Model(cfg)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(jax.random.PRNGKey(0))
    eng = EngineConfig(max_batch_size=2, max_model_len=96, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=max_new,
                       align_stop=True, align_stall_patience=patience,
                       align_end_margin=margin)
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(3))
    rs = np.random.default_rng(0)
    reqs = [Request(
        text_ids=rs.integers(0, cfg.text_vocab_size, size=6).astype(np.int32),
        cond_emb=rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size)).astype(np.float32),
        max_new_tokens=max_new, temperature=0.8, uid=i) for i in range(3)]
    return engine, reqs, cfg


def test_align_stop_forces_eos_when_stalled():
    # margin >= text_len makes near_end true immediately; patience 0 forces
    # EOS on the first decode step after admission.
    engine, reqs, cfg = _align_engine(patience=0, margin=100)
    results = engine.generate(reqs)
    for r in results:
        assert r.finished_by_stop, r.tokens
        assert len(r.tokens) <= 3
        assert r.tokens[-1] == cfg.stop_speech_token


def test_align_stop_suppresses_premature_eos():
    # margin very negative -> near_end never true -> EOS suppressed; every
    # request must run to its cap and never finish by stop.
    engine, reqs, cfg = _align_engine(patience=0, margin=-1000, max_new=12)
    results = engine.generate(reqs)
    for r in results:
        assert not r.finished_by_stop
        assert len(r.tokens) == 12
        assert (r.tokens != cfg.stop_speech_token).all()


def test_align_stop_requires_model_flag():
    import dataclasses as dc
    import pytest
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.runtime.engine import T3Engine
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        T3Engine(model, params, cfg,
                 EngineConfig(max_batch_size=2, max_model_len=96,
                              align_stop=True))


def test_generate_empty_and_edge_requests(setup):
    """Edge cases: empty request list, empty text, and a max_new_tokens
    request that must be clamped to fit max_model_len."""
    cfg, model, params, eng = setup
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(3))

    assert engine.generate([]) == []

    rng = jax.random.PRNGKey(9)
    empty = Request(text_ids=np.zeros((0,), np.int32),
                    cond_emb=np.asarray(jax.random.normal(
                        rng, (cfg.cond_len, cfg.hidden_size))),
                    max_new_tokens=6, temperature=0.0, uid="empty")
    huge = mk_req(cfg, rng, 8, max_new=10_000, temperature=0.0, uid="huge")
    results = engine.generate([empty, huge])
    assert results[0].uid == "empty" and 1 <= len(results[0].tokens) <= 6
    # clamp: cond_len + text + 1 + generated must fit the cache
    assert len(results[1].tokens) <= eng.max_model_len
    for r in results:
        assert np.all(r.tokens >= 0)
        assert np.all(r.tokens < cfg.speech_vocab_size)


def test_generate_pipelined_matches_simple(setup):
    """The opt-in pipelined harvest returns identical greedy results.

    All requests fit one admission wave so both modes see bit-identical
    prefill/decode shapes (different admission timing changes padding
    bucket shapes, and fp reassociation can flip greedy argmax near-ties
    on random weights — not a correctness difference)."""
    cfg, model, params, eng = setup
    rng = jax.random.PRNGKey(11)
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), 5 + i, max_new=8,
                   temperature=0.0, uid=i) for i in range(4)]
    import dataclasses as dc
    a = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(5))
    b = T3Engine(model, params, cfg,
                 dc.replace(eng, pipelined_harvest=True),
                 rng=jax.random.PRNGKey(5))
    ra = a.generate(reqs)
    rb = b.generate(reqs)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(x.tokens, y.tokens)


def test_generate_pipelined_multiwave_slot_recycling(setup):
    """Pipelined harvest across slot recycling (requests >> slots).

    Regression for the harvest race where a snapshot taken BEFORE the
    previous snapshot was consumed re-reported a freed slot, harvesting the
    slot's next occupant immediately with the previous request's tokens
    (observed: results verbatim-swapped between requests).  Admission-wave
    composition differs between the two modes (pipelined frees slots one
    chunk later), which changes prefill bucket shapes, so exact float-path
    equality is not guaranteed — instead assert the contamination symptoms
    directly: every request yields plausible-length output and no two
    requests share a verbatim token string."""
    cfg, model, params, eng = setup
    import dataclasses as dc
    rng = jax.random.PRNGKey(23)
    # 2 slots, 8 requests, varied lengths/caps -> heavy recycling
    small = dc.replace(eng, max_batch_size=2, pipelined_harvest=True)
    engine = T3Engine(model, params, cfg, small, rng=jax.random.PRNGKey(5))
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), 4 + (i % 4),
                   max_new=5 + (i % 4) * 3, temperature=0.8, uid=i)
            for i in range(8)]
    results = engine.generate(reqs)
    assert len(results) == 8
    strings = []
    for i, r in enumerate(results):
        assert r.uid == i
        assert 1 <= len(r.tokens) <= reqs[i].max_new_tokens, (i, r.tokens)
        strings.append(r.tokens.tobytes())
    # verbatim-duplicate outputs across requests = the contamination bug
    assert len(set(strings)) == len(strings), "cross-request token contamination"


@pytest.mark.parametrize("pipelined", [False, True])
def test_admit_interleave_matches_drained(setup, pipelined):
    """admit_interleave=True (one prefill wave per decode chunk) returns the
    same greedy tokens as the default drain-all-waves admission — on BOTH
    harvest paths (the pipelined loop has its own interleave break and
    one-chunk-delayed slot recycling, ADVICE r2).

    Lanes decode independently, so admission timing cannot change a lane's
    stream; uniform text lengths keep every prefill wave in one padded
    bucket shape so fp reassociation can't flip near-ties either."""
    cfg, model, params, eng = setup
    import dataclasses as dc
    rng = jax.random.PRNGKey(31)
    # 2 slots, 6 requests, uniform text length -> multiple admission waves
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), 6,
                   max_new=4 + (i % 3) * 3, temperature=0.0, uid=i)
            for i in range(6)]
    small = dc.replace(eng, max_batch_size=2, pipelined_harvest=pipelined)
    a = T3Engine(model, params, cfg, small, rng=jax.random.PRNGKey(5))
    b = T3Engine(model, params, cfg,
                 dc.replace(small, admit_interleave=True),
                 rng=jax.random.PRNGKey(5))
    ra = a.generate(reqs)
    rb = b.generate(reqs)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(x.tokens, y.tokens)


def test_megachunk_matches_single_chunk(setup):
    """chunks_per_dispatch > 1 (k chunk+merge pairs enqueued per harvest
    sync) must produce the same greedy tokens as the per-chunk path."""
    cfg, model, params, eng = setup
    import dataclasses as dc
    rng = jax.random.PRNGKey(31)
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), 4 + i % 3,
                   max_new=6 + i, temperature=0.0, uid=i) for i in range(6)]
    a = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(5))
    b = T3Engine(model, params, cfg, dc.replace(eng, chunks_per_dispatch=2),
                 rng=jax.random.PRNGKey(5))
    ra = a.generate(reqs)
    rb = b.generate(reqs)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(x.tokens, y.tokens)


def test_compact_tail_matches_full_batch(setup):
    """Tail batch compaction (queue empty -> gather live slots into half
    the lanes) must produce the same greedy tokens as the full-B path,
    across multiple halvings and slot recycling."""
    cfg, model, params, eng = setup
    import dataclasses as dc
    rng = jax.random.PRNGKey(17)
    # 6 requests over 4 slots with staggered caps: slots recycle, then the
    # tail drains through compaction 4 -> 2 (compact_min=2)
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), 4 + i % 3,
                   max_new=4 + 2 * i, temperature=0.0, uid=i)
            for i in range(6)]
    a = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(3))
    b = T3Engine(model, params, cfg,
                 dc.replace(eng, compact_tail=True, compact_min=2),
                 rng=jax.random.PRNGKey(3))
    ra = a.generate(reqs)
    rb = b.generate(reqs)
    assert any(m <= eng.max_batch_size // 2 for m in b._jit_compact), \
        "compaction never triggered"
    for i, (x, y) in enumerate(zip(ra, rb)):
        np.testing.assert_array_equal(x.tokens, y.tokens, err_msg=f"req {i}")
        assert x.finished_by_stop == y.finished_by_stop


def test_compact_tail_small_batch_reusable(setup):
    """After a compacted generate, the engine must serve the next call
    (full-size buffers restored by the tail reset)."""
    cfg, model, params, eng = setup
    import dataclasses as dc
    engine = T3Engine(model, params, cfg,
                      dc.replace(eng, compact_tail=True, compact_min=2),
                      rng=jax.random.PRNGKey(4))
    rng = jax.random.PRNGKey(23)
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), 4, max_new=5 + i,
                   temperature=0.0, uid=i) for i in range(2)]
    r1 = engine.generate(reqs)
    r2 = engine.generate(reqs)
    assert len(r1) == len(r2) == 2
    for x, y in zip(r1, r2):
        np.testing.assert_array_equal(x.tokens, y.tokens)


def test_partial_wave_admission_preserves_each_request(setup):
    """Regression: a padded admission wave (m=2 into m_bucket=4) duplicates
    slot ids for the padding rows; the padding payload must repeat request 0
    bit-identically.  The old code padded with the LAST request of the wave,
    so the duplicate scatter overwrote request 0's slot with request 1's
    prompt/text_len on every partial wave — greedy streams for the wave's
    first request were silently another request's."""
    cfg, model, params, eng = setup
    rng = jax.random.PRNGKey(31)
    r0 = mk_req(cfg, jax.random.fold_in(rng, 0), n_text=5, max_new=7,
                temperature=0.0, uid=0)
    r1 = mk_req(cfg, jax.random.fold_in(rng, 1), n_text=8, max_new=7,
                temperature=0.0, uid=1)

    # ground truth: each request admitted alone (m_bucket=1, no padding)
    solo = []
    for r in (r0, r1):
        e = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(11))
        solo.append(e.generate([r])[0].tokens)

    # one partial wave of both (B=4 -> m=2 pads to bucket 4)
    e = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(11))
    e._ttft = {}
    e._admit([r0, r1], [2, 1])
    st = e.state
    assert int(st.text_len[2]) == 5, "slot 2 must hold request 0's text"
    assert int(st.text_len[1]) == 8, "slot 1 must hold request 1's text"

    both = [r.tokens for r in
            T3Engine(model, params, cfg, eng,
                     rng=jax.random.PRNGKey(11)).generate([r0, r1])]
    np.testing.assert_array_equal(both[0], solo[0], err_msg="request 0")
    np.testing.assert_array_equal(both[1], solo[1], err_msg="request 1")


def test_rtt_policy_selection():
    """Pure policy mapping (docs/PERF.md round-3 thresholds: plain loop
    wins through 29 ms measured; insurance only beyond 40 ms)."""
    from chatterbox_tpu.runtime.engine import rtt_policy
    assert rtt_policy(6.0) == {}
    assert rtt_policy(29.0) == {}
    assert rtt_policy(39.9) == {}
    assert rtt_policy(40.0) == {"chunks_per_dispatch": 2}
    assert rtt_policy(60.0) == {"chunks_per_dispatch": 2}


def test_rtt_adaptive_engine_construction(setup):
    """rtt_adaptive=True probes at construction (prober injectable) and
    applies the policy override; greedy streams stay bit-identical (the
    k>1 dispatch is the same jits, only the sync cadence changes)."""
    import dataclasses as dc
    from chatterbox_tpu.runtime import engine as eng_mod
    cfg, model, params, eng = setup

    orig = eng_mod.probe_sync_rtt
    eng_mod.probe_sync_rtt = lambda n=8: 45.0
    try:
        e = T3Engine(model, params, cfg,
                     dc.replace(eng, rtt_adaptive=True),
                     rng=jax.random.PRNGKey(5))
    finally:
        eng_mod.probe_sync_rtt = orig
    assert e.rtt_ms == 45.0
    assert e.eng.chunks_per_dispatch == 2

    reqs = [mk_req(cfg, jax.random.fold_in(jax.random.PRNGKey(41), i), 5,
                   max_new=6 + i, temperature=0.0, uid=i) for i in range(3)]
    base = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(5))
    ra = base.generate(reqs)
    rb = e.generate(reqs)
    for x, y in zip(ra, rb):
        np.testing.assert_array_equal(x.tokens, y.tokens)


def test_lazy_cache_growth(setup):
    """The slot cache starts at the smallest position bucket, grows when a
    wave needs more, and growth mid-serving never changes greedy streams
    (round-3: a full-max_model_len dense cache measured ~1.8x slower per
    step than one sized to the workload)."""
    cfg, model, params, eng = setup
    rng = jax.random.PRNGKey(51)
    short = [mk_req(cfg, jax.random.fold_in(rng, i), 4, max_new=5,
                    temperature=0.0, uid=i) for i in range(2)]
    # needs ~ cond + 8 text + 1 + 70 -> beyond the first bucket for S=96
    lng = mk_req(cfg, jax.random.fold_in(rng, 9), 8, max_new=70,
                 temperature=0.0, uid=9)

    e = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(5))
    step = max(96, -(-e.S // 6))
    assert e.cache.k.shape[2] == step          # starts minimal
    r_short = e.generate(short)
    alloc_after_short = e.cache.k.shape[2]

    # growth mid-serving: long request admitted into the same engine
    r_mixed = e.generate([lng] + short)
    assert e.cache.k.shape[2] >= alloc_after_short

    # equality vs an engine that allocated big from its first wave
    e2 = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(5))
    r2 = e2.generate([lng] + short)
    for a, b in zip(r_mixed, r2):
        np.testing.assert_array_equal(a.tokens, b.tokens)
    # and the short-only streams are unaffected by allocation size
    e3 = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(5))
    e3._ensure_capacity(e3.S)
    r3 = e3.generate(short)
    for a, b in zip(r_short, r3):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_pool_split_matches_single_dispatch():
    """Age-grouped two-pool dispatch (pool_split): greedy token streams are
    bit-identical to the single full-batch dispatch, and the split actually
    engages on a position-skewed full-occupancy workload."""
    cfg = T3ModelConfig.tiny()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.init(
        r, jax.random.normal(r, (1, cfg.speaker_embed_size)),
        jax.random.randint(r, (1, 6), 0, cfg.start_speech_token),
        0.5 * jnp.ones((1, 1)),
        jax.random.randint(r, (1, 8), 0, cfg.text_vocab_size),
        jnp.full((1,), 8, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    # S large enough for a >= pool_margin bucketed spread (96 vs 384+)
    mk = lambda **kw: EngineConfig(
        max_batch_size=4, max_model_len=576, decode_chunk=8,
        prefill_buckets=(8, 16, 320), tokens_max=400, kv_dtype="int8",
        pool_margin=192, **kw)
    rngs = jax.random.split(jax.random.PRNGKey(3), 4)
    # two old/long lanes (long prompts + big caps -> high pos_cap), two
    # young/short lanes; all admitted together = full occupancy
    reqs = [mk_req(cfg, rngs[0], 300, max_new=200, temperature=0.0, uid=0),
            mk_req(cfg, rngs[1], 280, max_new=180, temperature=0.0, uid=1),
            mk_req(cfg, rngs[2], 4, max_new=60, temperature=0.0, uid=2),
            mk_req(cfg, rngs[3], 6, max_new=60, temperature=0.0, uid=3)]

    e_pool = T3Engine(model, params, cfg, mk(pool_split=True),
                      rng=jax.random.PRNGKey(7))
    r_pool = e_pool.generate(reqs)
    assert e_pool._pool_dispatches > 0, "split never engaged"

    e_full = T3Engine(model, params, cfg, mk(pool_split=False),
                      rng=jax.random.PRNGKey(7))
    r_full = e_full.generate(reqs)
    for a, b in zip(r_pool, r_full):
        np.testing.assert_array_equal(a.tokens, b.tokens)
        assert a.finished_by_stop == b.finished_by_stop


def test_lpt_admission_and_hysteresis(setup):
    """admission_order='lpt' + admit_min_free: longest-total requests admit
    first (flatter drain tail), smaller hysteresis admits sooner; greedy
    per-request streams are unchanged (lanes are independent)."""
    cfg, model, params, eng = setup
    import dataclasses as dc
    rng = jax.random.PRNGKey(31)
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), n_text=4 + i,
                   max_new=4 + 2 * i, temperature=0.0, uid=i)
            for i in range(6)]
    base = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(5))
    ref = base.generate(reqs)
    lpt = T3Engine(model, params, cfg,
                   dc.replace(eng, admission_order="lpt", admit_min_free=1),
                   rng=jax.random.PRNGKey(5))
    out = lpt.generate(reqs)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a.tokens, b.tokens)

    # LPT queue pops the longest total first
    from chatterbox_tpu.runtime.native import NativeScheduler
    s = NativeScheduler(4, 96, order="lpt")
    s.add_request(0, 10, 5)     # total 15
    s.add_request(1, 5, 30)     # total 35
    s.add_request(2, 8, 10)     # total 18
    slots, uids = s.admit(4)
    assert uids == [1, 2, 0]


def test_compact_tail_double_halving(setup):
    """Regression: entering the drain with few enough live requests that the
    batch halves TWICE back-to-back (48->24->12 analog) must not index the
    pre-compaction slot ids (round-4 KeyError in _drain_tail)."""
    cfg, model, params, eng = setup
    import dataclasses as dc
    e = T3Engine(model, params, cfg,
                 dc.replace(eng, max_batch_size=8, compact_tail=True,
                            compact_min=2),
                 rng=jax.random.PRNGKey(5))
    rng = jax.random.PRNGKey(77)
    # 8 slots, only 2 live at queue-empty -> target halves 8->4->2 in one
    # pass of the drain loop
    reqs = [mk_req(cfg, jax.random.fold_in(rng, i), n_text=4,
                   max_new=4 if i < 6 else 14, temperature=0.0, uid=i)
            for i in range(8)]
    results = e.generate(reqs)
    assert len(results) == 8
    e2 = T3Engine(model, params, cfg, dc.replace(eng, max_batch_size=8),
                  rng=jax.random.PRNGKey(5))
    ref = e2.generate(reqs)
    for a, b in zip(ref, results):
        np.testing.assert_array_equal(a.tokens, b.tokens)


def test_native_scheduler_cpp_matches_python_fallback(monkeypatch):
    """The C++ scheduler (native/scheduler.cc via ctypes) and the Python
    fallback must be step-for-step identical on a randomized workload:
    admit waves (slots AND uids), counts, pos_caps, harvest results."""
    import chatterbox_tpu.runtime.native as nat
    from chatterbox_tpu.runtime.native import NativeScheduler

    assert nat._load_lib() is not None, "C++ scheduler should build here"

    def build(py: bool, order):
        if py:
            monkeypatch.setattr(nat, "_lib", None)
            monkeypatch.setattr(nat, "_lib_tried", True)
        else:
            monkeypatch.setattr(nat, "_lib_tried", False)
        return NativeScheduler(8, 256, order=order, min_free=2)

    for order in ("shortest", "lpt"):
        rs = np.random.default_rng(3)
        reqs = [(i, int(rs.integers(5, 60)), int(rs.integers(4, 80)))
                for i in range(40)]
        cpp = build(False, order)
        py = build(True, order)
        for uid, pl, mx in reqs[:20]:
            cpp.add_request(uid, pl, mx)
            py.add_request(uid, pl, mx)
        next_req = 20
        for step in range(60):
            a_c = cpp.admit(6)
            a_p = py.admit(6)
            assert a_c == a_p, (order, step, a_c, a_p)
            assert cpp.pending_count() == py.pending_count()
            assert cpp.active_count() == py.active_count()
            assert cpp.free_count() == py.free_count()
            up_c = cpp.advance(8)
            up_p = py.advance(8)
            assert up_c == up_p, (order, step)
            np.testing.assert_array_equal(cpp.pos_caps(), py.pos_caps())
            # randomly finish some active slots
            done = (rs.random(8) < 0.3).astype(np.uint8)
            h_c = cpp.harvest(done)
            h_p = py.harvest(done)
            assert h_c == h_p, (order, step, h_c, h_p)
            # trickle in more requests mid-run
            if next_req < len(reqs) and step % 3 == 0:
                uid, pl, mx = reqs[next_req]
                next_req += 1
                cpp.add_request(uid, pl, mx)
                py.add_request(uid, pl, mx)
        assert cpp.pending_count() == py.pending_count()


def test_overlong_prompt_cap_respects_bucket_rounding(setup):
    """The prompt cap must be the largest length whose PREFILL BUCKET fits
    the allocation (code-review r5): with max_model_len=20 and buckets
    (8, 16), a 10-token prompt buckets to 16 -> block 6+16+1=23 > 20 and
    used to crash inside the prefill jit; it must be rejected up front."""
    cfg, model, params, _ = setup
    eng = EngineConfig(max_batch_size=2, max_model_len=20, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=4,
                       kv_dtype="float32")
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(3))
    bad = mk_req(cfg, jax.random.PRNGKey(4), n_text=10, max_new=2)
    with pytest.raises(ValueError, match="exceeds the engine's prompt"):
        engine.generate([bad])
    ok = mk_req(cfg, jax.random.PRNGKey(4), n_text=8, max_new=2)
    res = engine.generate([ok])
    assert len(res) == 1 and len(res[0].tokens) >= 1


def test_batched_greedy_equals_individual(setup):
    """Lanes are independent: greedy tokens from one batched generate must
    be identical to running each request alone (canary for cross-lane
    contamination in admission/decode/harvest/compaction)."""
    cfg, model, params, eng = setup
    rngs = jax.random.split(jax.random.PRNGKey(21), 5)
    reqs = [mk_req(cfg, rngs[i], n_text=3 + i, max_new=5 + i,
                   temperature=0.0, uid=i) for i in range(5)]
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(0))
    batched = engine.generate(reqs)
    for i, r in enumerate(reqs):
        solo_engine = T3Engine(model, params, cfg, eng,
                               rng=jax.random.PRNGKey(0))
        solo = solo_engine.generate([r])[0]
        np.testing.assert_array_equal(batched[i].tokens, solo.tokens,
                                      err_msg=f"request {i}")
