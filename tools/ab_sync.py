"""One-window A/B of sync-reduction knobs, re-run after the round-4
scatter-compile fix (the old pipelined/cpd A/Bs were polluted by ~3 s
per-freed-count compile stalls inside their timed regions).

tools/ubench_pool.py showed the device step cost implies ~4800 tok/s at
full occupancy while the parity bench measures ~2400-2900 in the same
windows — i.e. ~50-60% slot utilization.  The candidate levers (all
config-only):

  tail   compact_tail=True      (ragged 330-460 caps -> long partial-
                                 occupancy drain; halving the batch cuts
                                 the per-step cost of the tail)
  lpt    admission_order="lpt"  (longest-total first: last-admitted
                                 requests are the shortest -> flat tail)
  hyst   admit_min_free=4       (admit as soon as 4 slots free instead of
                                 waiting for 12)
  all    all three

Arms run in ONE process on ONE engine; compiles paid in warmup/rehearsal
(rehearsal runs the 'all' configuration so compacted-batch shapes warm).

Usage: python tools/ab_occupancy.py [n_requests]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ARMS = {
    "base": {},
    "pipe": {"pipelined_harvest": True},
    "cpd2": {"chunks_per_dispatch": 2},
    "minfree2": {"admit_min_free": 2},
}


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 154
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import (T3Engine, Request,
                                               probe_sync_rtt)

    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    eng = EngineConfig(max_batch_size=48, max_model_len=1200,
                       decode_chunk=32, kv_dtype="int8", admit_min_free=4)
    base_model = T3Model(base_cfg)
    model = T3Model(cfg)
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
    log(f"params {time.time() - t0:.1f}s; rtt {probe_sync_rtt():.1f} ms")

    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))

    reqs = []
    for i in range(n_requests):
        n_text = int(rs.integers(120, 181))
        text = rs.integers(1, cfg.text_vocab_size,
                           size=n_text).astype(np.int32)
        cond = (0.02 * rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size))).astype(np.float32)
        reqs.append(Request(text_ids=text, cond_emb=cond,
                            max_new_tokens=int(rs.integers(330, 461)),
                            temperature=0.8, top_p=0.8, uid=i))

    t0 = time.time()
    max_pos = max(cfg.cond_len + len(r.text_ids) + 1 + r.max_new_tokens + 1
                  for r in reqs)
    engine.precompile(verbose=True, workload_max_pos=max_pos)
    log(f"precompile {time.time() - t0:.1f}s")
    wkw = dict(temperature=0.8, top_p=0.8)
    for L in (126, 180):
        for n in (1, 4, 16):
            w = [Request(text_ids=np.full((L,), 1, np.int32),
                         cond_emb=reqs[i].cond_emb, max_new_tokens=8, uid=i,
                         **wkw) for i in range(n)]
            engine.generate(w)
            engine.reset()
    log(f"warm {time.time() - t0:.1f}s")
    # rehearsal in the 'all' configuration so compact-tail batch shapes
    # (24/12/8 lanes x their s_active buckets) and lpt/hyst paths warm
    engine.eng = dataclasses.replace(engine.eng, **ARMS["pipe"])
    t0 = time.time()
    engine.generate(reqs)
    engine.reset()
    log(f"rehearsal(pipe) {time.time() - t0:.1f}s")
    # plain-path rehearsal too (base arm shapes)
    engine.eng = dataclasses.replace(
        engine.eng, pipelined_harvest=False, chunks_per_dispatch=1)
    t0 = time.time()
    engine.generate(reqs)
    engine.reset()
    log(f"rehearsal(base) {time.time() - t0:.1f}s")

    results = []
    order = ["base", "pipe", "cpd2", "minfree2", "base"]
    for arm in order:
        over = {"pipelined_harvest": False, "chunks_per_dispatch": 1,
                "admit_min_free": 4}
        over.update(ARMS[arm])
        engine.eng = dataclasses.replace(engine.eng, **over)
        rtt0 = probe_sync_rtt()
        t0 = time.time()
        out = engine.generate(reqs)
        dt = time.time() - t0
        engine.reset()
        toks = sum(len(r.tokens) for r in out)
        ttfts = sorted(r.ttft_s for r in out)
        p50 = ttfts[len(ttfts) // 2]
        results.append((arm, toks / dt, p50, rtt0, dt))
        log(f"arm={arm}: {toks / dt:.1f} tok/s  ttft_p50={p50:.2f}s  "
            f"rtt={rtt0:.1f}ms  ({dt:.1f}s)")

    log("--- summary ---")
    for arm, tps, p50, rtt0, dt in results:
        log(f"{arm:5s} {tps:8.1f} tok/s  p50={p50:5.2f}s  rtt={rtt0:.1f}  "
            f"{dt:.1f}s")


if __name__ == "__main__":
    main()
