"""One-window A/B/A: decode_chunk 32 vs 24 on the parity workload at B=64.

Serving defaults moved to decode_chunk=24 for single-stream latency
(fewer harvest RTTs per request); this measures whether the BATCHED bench
config should follow (TTFT p50/p95 vs tok/s).  Engines are built
sequentially in one process (two B=64 caches cannot coexist in 16 GB);
arms run A/B/A to read window drift.

Usage: python tools/ab_chunk.py [n_requests] [chunks...]
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


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 154
    chunks = [int(c) for c in (sys.argv[2:] or ["32", "24", "32"])]
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import (T3Engine, Request,
                                               probe_sync_rtt)

    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    init_model = T3Model(base_cfg)
    model = T3Model(cfg)
    params = jax.jit(lambda r: init_model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    params = quantize_t3_params(jax.tree.map(np.asarray, params))
    params = jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.bfloat16)
        if jnp.asarray(x).dtype == jnp.float32 else jnp.asarray(x), params)
    jax.block_until_ready(params)
    log(f"params ready; rtt {probe_sync_rtt():.1f} ms")

    reqs = []
    for i in range(n_requests):
        n_text = int(rs.integers(120, 181))
        reqs.append(Request(
            text_ids=rs.integers(1, cfg.text_vocab_size,
                                 size=n_text).astype(np.int32),
            cond_emb=(0.02 * rs.standard_normal(
                (cfg.cond_len, cfg.hidden_size))).astype(np.float32),
            max_new_tokens=int(rs.integers(330, 461)),
            temperature=0.8, top_p=0.8, uid=i))
    max_pos = max(cfg.cond_len + len(r.text_ids) + 1 + r.max_new_tokens + 1
                  for r in reqs)
    wkw = dict(temperature=0.8, top_p=0.8)

    results = []
    for arm_i, dc in enumerate(chunks):
        eng = EngineConfig(max_batch_size=64, max_model_len=1200,
                           decode_chunk=dc, kv_dtype="int8",
                           admit_min_free=4)
        engine = T3Engine(model, params, cfg, eng,
                          rng=jax.random.PRNGKey(1))
        t0 = time.time()
        engine.precompile(workload_max_pos=max_pos)
        for L in (126, 180):
            for n in (1, 4, 16, 24):
                engine.generate([Request(
                    text_ids=np.full((L,), 1, np.int32),
                    cond_emb=reqs[i].cond_emb, max_new_tokens=8, uid=i,
                    **wkw) for i in range(n)])
                engine.reset()
        engine.generate(reqs)
        engine.reset()
        log(f"[dc={dc}] precompile+warm+rehearsal {time.time() - t0:.1f}s")
        rtt0 = probe_sync_rtt()
        t0 = time.time()
        out = engine.generate(reqs)
        dt = time.time() - t0
        engine.reset()
        toks = sum(len(r.tokens) for r in out)
        tt = sorted(r.ttft_s for r in out)
        p50, p95 = tt[len(tt) // 2], tt[int(len(tt) * 0.95)]
        results.append((dc, toks / dt, p50, p95, rtt0))
        log(f"arm{arm_i} dc={dc}: {toks / dt:.1f} tok/s  p50={p50:.2f}s "
            f"p95={p95:.2f}s  rtt={rtt0:.1f}ms")
        del engine
        gc.collect()

    log("--- summary ---")
    for dc, tps, p50, p95, rtt0 in results:
        log(f"dc={dc:3d} {tps:8.1f} tok/s  p50={p50:5.2f}s  p95={p95:5.2f}s"
            f"  rtt={rtt0:.1f}")


if __name__ == "__main__":
    main()
