"""One instrumented parity-workload run: per-chunk utilization trace +
analysis (where the gap to perfect occupancy actually goes).

Usage: python tools/trace_parity.py [n_requests]
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE = "/tmp/sched_trace.jsonl"
os.environ["CHATTERBOX_SCHED_TRACE"] = TRACE

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
    from chatterbox_tpu.runtime.engine import (T3Engine, Request,
                                               probe_sync_rtt)

    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    # bench.py's shipped configuration (compact_tail defaults on)
    eng = EngineConfig(max_batch_size=64, max_model_len=1200,
                       decode_chunk=32, kv_dtype="int8", admit_min_free=4)
    model = T3Model(cfg)
    params = jax.jit(lambda r: T3Model(base_cfg).init(
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
    max_pos = max(cfg.cond_len + len(r.text_ids) + 1 + r.max_new_tokens + 1
                  for r in reqs)
    t0 = time.time()
    engine.precompile(verbose=False, workload_max_pos=max_pos)
    wkw = dict(temperature=0.8, top_p=0.8)
    for L in (126, 180):
        for n in (1, 4, 16):
            engine.generate([Request(
                text_ids=np.full((L,), 1, np.int32),
                cond_emb=reqs[i].cond_emb, max_new_tokens=8, uid=i, **wkw)
                for i in range(n)])
            engine.reset()
    log(f"precompile+warm {time.time() - t0:.1f}s")
    os.environ.pop("CHATTERBOX_SCHED_TRACE")   # rehearsal untraced
    t0 = time.time()
    engine.generate(reqs)
    engine.reset()
    log(f"rehearsal {time.time() - t0:.1f}s")

    os.environ["CHATTERBOX_SCHED_TRACE"] = TRACE
    if os.path.exists(TRACE):
        os.unlink(TRACE)
    t0 = time.time()
    out = engine.generate(reqs)
    dt = time.time() - t0
    toks = sum(len(r.tokens) for r in out)
    log(f"timed: {toks} toks in {dt:.1f}s -> {toks / dt:.1f} tok/s")

    rows = [json.loads(l) for l in open(TRACE)]
    B = eng.max_batch_size
    chunk = eng.decode_chunk
    total_wall = sum(r["wall_ms"] for r in rows) / 1e3
    log(f"chunks={len(rows)} decode-loop wall={total_wall:.1f}s "
        f"(run wall {dt:.1f}s -> admission/overhead {dt - total_wall:.1f}s)")
    # occupancy-weighted accounting
    tok_chunks = sum(r["live"] for r in rows) * chunk
    log(f"chunk-steps x live = {tok_chunks} lane-steps vs {toks} tokens "
        f"(done-but-unharvested waste {(tok_chunks - toks) / max(1, tok_chunks):.1%})")
    full = B * len(rows) * chunk
    log(f"mean occupancy {sum(r['live'] for r in rows) / (B * len(rows)):.1%}")
    # phase buckets
    def bucket(rows, pred, name):
        w = sum(r["wall_ms"] for r in rows if pred(r)) / 1e3
        n = sum(1 for r in rows if pred(r))
        if n:
            occ = sum(r["live"] for r in rows if pred(r)) / (B * n)
            log(f"  {name}: {n} chunks, {w:.1f}s, occ {occ:.0%}")
    bucket(rows, lambda r: r["pending"] > 0, "queue nonempty")
    bucket(rows, lambda r: r["pending"] == 0 and r["live"] > B // 2,
           "drain >B/2 live")
    bucket(rows, lambda r: r["pending"] == 0 and r["live"] <= B // 2,
           "drain <=B/2 live")
    # s_active histogram weighted by wall
    from collections import Counter
    sa = Counter()
    for r in rows:
        sa[r["s_active"]] += r["wall_ms"] / 1e3
    log("wall by s_active: " + ", ".join(
        f"{k}:{v:.1f}s" for k, v in sorted(sa.items())))
    log("first 8 chunks: " + json.dumps(rows[:8]))
    log("last 10 chunks: " + json.dumps(rows[-10:]))


if __name__ == "__main__":
    main()
