"""One-window A/B/A of the age-grouped two-pool dispatch (pool_split) on
the parity-shaped bench workload (154 reqs, S=1200, text 120-180, caps
330-460 — bench.py's exact request generator).

Both arms run in ONE process on ONE engine (pool_split toggled on the live
EngineConfig), so compiles and the fresh-process first-run penalty are paid
in the shared warmup/rehearsal, and window quality applies to both arms
(docs/PERF.md: cross-window comparisons are invalid — real throughput
swings ~1.4x at identical RTT).

Usage: python tools/ab_pool.py [n_requests]
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


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 154
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import T3Engine, Request, probe_sync_rtt

    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    eng = EngineConfig(max_batch_size=48, max_model_len=1200,
                       decode_chunk=32, kv_dtype="int8", pool_split=True)
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
        text = rs.integers(1, cfg.text_vocab_size, size=n_text).astype(np.int32)
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
    t0 = time.time()
    engine.generate(reqs)        # untimed rehearsal (first-run penalty)
    engine.reset()
    log(f"rehearsal {time.time() - t0:.1f}s")

    results = []
    for arm in ("off", "on", "off", "on"):
        engine.eng = dataclasses.replace(engine.eng,
                                         pool_split=(arm == "on"))
        engine._pool_dispatches = 0
        rtt0 = probe_sync_rtt()
        t0 = time.time()
        out = engine.generate(reqs)
        dt = time.time() - t0
        engine.reset()
        toks = sum(len(r.tokens) for r in out)
        ttfts = sorted(r.ttft_s for r in out)
        p50 = ttfts[len(ttfts) // 2]
        results.append((arm, toks / dt, engine._pool_dispatches, p50, rtt0))
        log(f"arm={arm}: {toks / dt:.1f} tok/s  pool_dispatches="
            f"{engine._pool_dispatches}  ttft_p50={p50:.2f}s  "
            f"rtt={rtt0:.1f}ms  ({dt:.1f}s)")

    log("--- summary ---")
    for arm, tps, pd, p50, rtt0 in results:
        log(f"{arm:4s} {tps:8.1f} tok/s  splits={pd:3d}  p50={p50:.2f}s  "
            f"rtt={rtt0:.1f}")


if __name__ == "__main__":
    main()
