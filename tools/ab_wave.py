"""One-window A/B: admission wave width 16 vs 24 (vs 32) at B=64 on the
parity workload (VERDICT r4 item 3: TTFT p95 under burst load).

A 24-wide wave fills 64 slots in 3 prefill dispatches instead of 4; the
cost is a bigger prefill block-KV transient and one extra compile shape
per text bucket.  Reports tok/s + TTFT p50/p95 per arm, interleaved in
one process so window drift reads out of the repeats.

Usage: python tools/ab_wave.py [n_requests] [wave widths...]
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
    waves = [int(b) for b in (sys.argv[2:] or ["16", "24"])]
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import (T3Engine, Request,
                                               probe_sync_rtt)

    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    t0 = time.time()
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
    log(f"params {time.time() - t0:.1f}s; rtt {probe_sync_rtt():.1f} ms")

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
    max_pos = max(cfg.cond_len + len(r.text_ids) + 1 + r.max_new_tokens + 1
                  for r in reqs)
    wkw = dict(temperature=0.8, top_p=0.8)

    engines = {}
    for W in waves:
        eng = EngineConfig(max_batch_size=64, max_model_len=1200,
                           decode_chunk=32, kv_dtype="int8",
                           admit_min_free=4, admit_wave=W)
        t0 = time.time()
        engine = T3Engine(model, params, cfg, eng,
                          rng=jax.random.PRNGKey(1))
        engine.precompile(workload_max_pos=max_pos)
        warm_ns = sorted({1, 4, 16, W})
        for L in (126, 180):
            for n in warm_ns:
                w = [Request(text_ids=np.full((L,), 1, np.int32),
                             cond_emb=reqs[i].cond_emb, max_new_tokens=8,
                             uid=i, **wkw) for i in range(n)]
                engine.generate(w)
                engine.reset()
        log(f"[wave={W}] precompile+warm {time.time() - t0:.1f}s")
        t0 = time.time()
        engine.generate(reqs)
        engine.reset()
        log(f"[wave={W}] rehearsal {time.time() - t0:.1f}s")
        engines[W] = engine

    results = []
    for W in waves + waves[::-1]:
        engine = engines[W]
        rtt0 = probe_sync_rtt()
        t0 = time.time()
        out = engine.generate(reqs)
        dt = time.time() - t0
        engine.reset()
        toks = sum(len(r.tokens) for r in out)
        ttfts = sorted(r.ttft_s for r in out)
        p50 = ttfts[len(ttfts) // 2]
        p95 = ttfts[int(len(ttfts) * 0.95)]
        results.append((W, toks / dt, p50, p95, rtt0, dt))
        log(f"arm=wave{W}: {toks / dt:.1f} tok/s  p50={p50:.2f}s "
            f"p95={p95:.2f}s  rtt={rtt0:.1f}ms  ({dt:.1f}s)")

    log("--- summary ---")
    for W, tps, p50, p95, rtt0, dt in results:
        log(f"wave={W:3d} {tps:8.1f} tok/s  p50={p50:5.2f}s  "
            f"p95={p95:5.2f}s  rtt={rtt0:.1f}  {dt:.1f}s")


if __name__ == "__main__":
    main()
