"""Engine A/B campaign: checkpointed (baseline, arm) pairs in one process.

Each pending pair runs (baseline, arm) back-to-back so the A/B is internal
to one tunnel window, and persists its result to CHATTERBOX_AB_STATE
(default /tmp/r3/ab_state.json) — the tunnel's ~15-minute alive windows
are shorter than a full campaign, so pairs accumulate across watchdog
retries (see docs/PERF.md "Round-3 A/B campaign RESULTS" for the landed
numbers and the warm-shape methodology).  Params build once per process;
engines are torn down between runs (params + cache ~2.2 GB each).

Workload: 96 reqs x 130 text x 400 caps, B=48, S=576, int8 KV.

Usage: python tools/ab_round2.py [quick]   # quick: skip the dense ubench
"""
import dataclasses
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_rtt(n=8):
    x = jnp.ones((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1)
    np.asarray(f(x))
    ts = []
    for _ in range(n):
        t0 = time.time()
        x = f(x)
        np.asarray(x)
        ts.append(time.time() - t0)
    return sorted(ts)[n // 2] * 1e3


def ubench_dense():
    """w8 / w8a8 / bf16 trunk-projection variants (cf. tools/ubench_dense)."""
    L, B, H, I = 30, 96, 1024, 4096
    SHAPES = [(H, 3 * H), (H, H), (H, I), (H, I), (I, H)]
    ITERS = 20
    key = jax.random.PRNGKey(0)
    ws, ss, wb = [], [], []
    for i, (fin, fout) in enumerate(SHAPES):
        k = jax.random.fold_in(key, i)
        w = jax.random.normal(k, (L, fin, fout), jnp.float32) * 0.02
        amax = jnp.maximum(jnp.abs(w).max(axis=1), 1e-8)
        sc = amax / 127.0
        wq = jnp.clip(jnp.round(w / sc[:, None, :]), -127,
                      127).astype(jnp.int8)
        ws.append(wq)
        ss.append(sc)
        wb.append(w.astype(jnp.bfloat16))
    x = jax.random.normal(key, (B, H), jnp.bfloat16)
    xi = jax.random.normal(jax.random.fold_in(key, 99), (B, I), jnp.bfloat16)
    jax.block_until_ready(x)
    log(f"ubench gen done")

    def loop(body, W):
        def run(x_, xi_):
            def step(acc, l):
                for i, (fin, fout) in enumerate(SHAPES):
                    a = x_ if fin == H else xi_
                    acc = acc + jnp.sum(
                        body(a, W[i][l], ss[i][l]).astype(jnp.float32))
                return acc, None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(L * ITERS) % L)
            return acc
        return jax.jit(run)

    def w8(a, wq, sc):
        return (jnp.dot(a, wq.astype(a.dtype),
                        preferred_element_type=jnp.float32) * sc).astype(a.dtype)

    def w8a8(a, wq, sc):
        af = a.astype(jnp.float32)
        aa = jnp.max(jnp.abs(af), axis=-1, keepdims=True) + 1e-9
        a8 = jnp.clip(jnp.round(af / aa * 127.0), -127, 127).astype(jnp.int8)
        y32 = jnp.dot(a8, wq, preferred_element_type=jnp.int32)
        return (y32.astype(jnp.float32) * (aa / 127.0) * sc).astype(a.dtype)

    def bf16(a, w, sc):
        return jnp.dot(a, w, preferred_element_type=jnp.float32).astype(a.dtype)

    for name, body, W in (("w8", w8, ws), ("w8a8", w8a8, ws),
                          ("bf16", bf16, wb)):
        f = loop(body, W)
        out = f(x, xi)
        np.asarray(out)
        t1 = time.time()
        np.asarray(f(x, xi))
        dt = (time.time() - t1) / ITERS
        log(f"ubench {name:6s} {dt * 1e3:8.3f} ms/30layers "
            f"({dt * 1e6 / L:6.1f} us/layer)")


_PARAMS = {}


def build_params(cfg):
    """Build + quantize the bench params once per process (the dominant
    per-run setup cost, ~100 s on the tunneled chip); knob variants reuse
    them — quant_act is a model flag, the int8 param tree is identical."""
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    if "p" in _PARAMS:
        return _PARAMS["p"]
    rng = jax.random.PRNGKey(0)
    base_model = T3Model(cfg)
    t0 = time.time()
    params = jax.jit(lambda r: base_model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    params = quantize_t3_params(jax.tree.map(np.asarray, params))
    params = jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.bfloat16)
        if jnp.asarray(x).dtype == jnp.float32 else jnp.asarray(x), params)
    jax.block_until_ready(params)
    log(f"params ready ({time.time() - t0:.1f}s)")
    _PARAMS["p"] = params
    return params


def engine_run(quant_act: bool = False, compact: bool = False,
               interleave: bool = False,
               cpd: int = 1, pipelined: bool = False, spec: bool = False,
               temp: float = 0.8, B=48, S=576, chunk=32):
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.runtime.engine import Request, T3Engine

    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True,
                              quant_act=quant_act)
    eng = EngineConfig(max_batch_size=B, max_model_len=S, decode_chunk=chunk,
                       kv_dtype="int8", compact_tail=compact,
                       admit_interleave=interleave,
                       chunks_per_dispatch=cpd, pipelined_harvest=pipelined,
                       spec_decode=spec,
                       spec_draft_layers=base_cfg.n_layers, spec_tokens=3)
    rtt0 = probe_rtt()
    log(f"engine_run a8={int(quant_act)} compact={int(compact)} "
        f"il={int(interleave)} cpd={cpd} pipe={int(pipelined)} "
        f"spec={int(spec)} temp={temp}: rtt={rtt0:.1f}ms init...")
    params = build_params(base_cfg)
    model = T3Model(cfg)
    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))

    reqs = []
    for i in range(2 * B):
        text = rs.integers(1, cfg.text_vocab_size, size=130).astype(np.int32)
        cond = (0.02 * rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size))).astype(np.float32)
        reqs.append(Request(text_ids=text, cond_emb=cond,
                            max_new_tokens=400, temperature=temp,
                            top_p=1.0 if temp == 0.0 else 0.8, uid=i))
    # compile the decode variant the timed run will use (greedy runs take
    # the needs_top_p=False sampler path — a separate jit variant)
    ntp = any(r.top_p < 1.0 - 1e-6 for r in reqs)
    engine.precompile(needs_top_p=ntp)
    log("  precompiled")
    # warm every (m_bucket, text_bucket) shape the timed run can hit
    # (admission cap 16 -> m_buckets 1/4/16; 130-token texts -> bucket 256)
    # with the SAME sampling params, so warm exercises the same jit variants
    wkw = dict(temperature=temp, top_p=1.0 if temp == 0.0 else 0.8)
    for n in (1, 4, 16):
        w = [Request(text_ids=reqs[i].text_ids, cond_emb=reqs[i].cond_emb,
                     max_new_tokens=8, uid=i, **wkw) for i in range(n)]
        engine.generate(w)
        engine.reset()
    warm = [Request(text_ids=reqs[i].text_ids, cond_emb=reqs[i].cond_emb,
                    max_new_tokens=40, uid=i, **wkw) for i in range(B)]
    engine.generate(warm)
    engine.reset()
    log("  warm")
    t0 = time.time()
    results = engine.generate(reqs)
    dt = time.time() - t0
    tot = sum(len(r.tokens) for r in results)
    ttfts = sorted(r.ttft_s for r in results)
    tok_s = tot / dt
    rtt1 = probe_rtt()
    log(f"engine a8={int(quant_act)} compact={int(compact)} "
        f"il={int(interleave)} cpd={cpd} pipe={int(pipelined)}: "
        f"{tot} tok in {dt:.2f}s -> {tok_s:.1f} tok/s; "
        f"TTFT p50 {ttfts[len(ttfts)//2]:.2f}s "
        f"p95 {ttfts[int(len(ttfts)*0.95)]:.2f}s; rtt after {rtt1:.1f}ms")
    del engine
    gc.collect()
    return {"tok_s": round(tok_s, 1),
            "ttft_p50": round(ttfts[len(ttfts) // 2], 2),
            "rtt_before": round(rtt0, 1), "rtt_after": round(rtt1, 1)}


# (pair_name, arm kwargs) — each pair runs (baseline, arm) back-to-back in
# ONE tunnel window so the A/B is window-internal; pairs checkpoint to a
# state file so short healthy windows accumulate across wrapper retries.
# (pair_name, base_kwargs, arm_kwargs)
PAIRS = [
    ("a8", {}, dict(quant_act=True)),
    ("compact", {}, dict(compact=True)),
    ("interleave", {}, dict(interleave=True)),
    ("cpd2", {}, dict(cpd=2)),
    ("cpd4", {}, dict(cpd=4)),
    ("pipe", {}, dict(pipelined=True)),
    ("both", {}, dict(quant_act=True, compact=True)),
    # spec path OVERHEAD check at alpha=1 (greedy + full-depth self-draft:
    # every cycle commits M+1=4 tokens at a cost of ~M+1 full steps, so the
    # ideal ratio is ~1.0x; a much lower ratio means the verify/commit
    # machinery itself is expensive).  The real speedup needs a truncated
    # draft with high acceptance — measurable only on real checkpoints
    # (tools/probe_draft.py); this arm bounds the machinery cost.
    ("spec_mech", dict(temp=0.0), dict(temp=0.0, spec=True)),
    # cache-allocation size effect: same workload/caps/s_active trajectory,
    # only max_model_len differs (576 vs 1200).  bench.py at S=1200 runs
    # ~2x slower per step than the campaign at S=576 at similar s_active —
    # if this pair reproduces that, the dense slot cache's allocation size
    # (merge windows / slices over a 2x buffer) is the round-4 target
    # (lazy cache growth to mimic paged-KV's laziness without page tables).
    ("s1200", {}, dict(S=1200)),
]


def main():
    import json
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    state_path = os.environ.get("CHATTERBOX_AB_STATE",
                                "/tmp/r3/ab_state.json")
    state = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
        log(f"resuming: {sorted(state)} done")
    log(f"devices: {jax.devices()}")
    log(f"sync RTT: {probe_rtt():.1f} ms")
    if not quick:
        ubench_dense()
    for name, base_kw, arm_kw in PAIRS:
        if name in state:
            continue
        base = engine_run(**base_kw)
        arm = engine_run(**arm_kw)
        state[name] = {"base": base, "arm": arm}
        with open(state_path, "w") as f:
            json.dump(state, f, indent=1)
        log(f"PAIR {name}: base {base['tok_s']} vs arm {arm['tok_s']} tok/s "
            f"({arm['tok_s'] / base['tok_s']:.3f}x)")
    log("SUMMARY " + " ".join(
        f"{n}={state[n]['arm']['tok_s']:.0f}/{state[n]['base']['tok_s']:.0f}"
        for n, _, _ in PAIRS if n in state))


if __name__ == "__main__":
    main()
