"""One-window A/B: w8 (int8-weight, bf16-activation trunk denses) vs w8a8
(additionally quantize activations per row and run int8 x int8 on the MXU,
skipping the int8->bf16 weight convert in every decode-step dense).

tools/ubench_dense.py projected the step's dense share could drop from
~3.4 ms toward its ~0.6 ms int8-read floor; the on-chip confirmation was
blocked by the round-2 tunnel outage.  Both engines share the SAME
quantized params (quant_act is a runtime lowering choice, not a different
checkpoint), run in ONE process, and the arms interleave base/a8/base/a8
so window drift reads as spread, not bias.

Usage: python tools/ab_w8a8.py [n_requests]
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
    from chatterbox_tpu.runtime.engine import (T3Engine, Request,
                                               probe_sync_rtt)

    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    eng = EngineConfig(max_batch_size=48, max_model_len=1200,
                       decode_chunk=32, kv_dtype="int8", admit_min_free=4)
    t0 = time.time()
    init_model = T3Model(base_cfg)
    params = jax.jit(lambda r: init_model.init(
        r, jnp.zeros((1, base_cfg.speaker_embed_size)),
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
        text = rs.integers(1, base_cfg.text_vocab_size,
                           size=n_text).astype(np.int32)
        cond = (0.02 * rs.standard_normal(
            (base_cfg.cond_len, base_cfg.hidden_size))).astype(np.float32)
        reqs.append(Request(text_ids=text, cond_emb=cond,
                            max_new_tokens=int(rs.integers(330, 461)),
                            temperature=0.8, top_p=0.8, uid=i))
    max_pos = max(base_cfg.cond_len + len(r.text_ids) + 1
                  + r.max_new_tokens + 1 for r in reqs)
    wkw = dict(temperature=0.8, top_p=0.8)

    engines = {}
    for arm, qa in (("w8", False), ("w8a8", True)):
        cfg = dataclasses.replace(base_cfg, quant_weights=True, quant_act=qa)
        t0 = time.time()
        engine = T3Engine(T3Model(cfg), params, cfg, eng,
                          rng=jax.random.PRNGKey(1))
        engine.precompile(workload_max_pos=max_pos)
        for L in (126, 180):
            for n in (1, 4, 16):
                w = [Request(text_ids=np.full((L,), 1, np.int32),
                             cond_emb=reqs[i].cond_emb, max_new_tokens=8,
                             uid=i, **wkw) for i in range(n)]
                engine.generate(w)
                engine.reset()
        log(f"[{arm}] precompile+warm {time.time() - t0:.1f}s")
        t0 = time.time()
        engine.generate(reqs)
        engine.reset()
        log(f"[{arm}] rehearsal {time.time() - t0:.1f}s")
        engines[arm] = engine

    results = []
    for arm in ("w8", "w8a8", "w8", "w8a8"):
        engine = engines[arm]
        rtt0 = probe_sync_rtt()
        t0 = time.time()
        out = engine.generate(reqs)
        dt = time.time() - t0
        engine.reset()
        toks = sum(len(r.tokens) for r in out)
        results.append((arm, toks / dt, rtt0, dt))
        log(f"arm={arm}: {toks / dt:.1f} tok/s  rtt={rtt0:.1f}ms  ({dt:.1f}s)")

    log("--- summary ---")
    for arm, tps, rtt0, dt in results:
        log(f"{arm:5s} {tps:8.1f} tok/s  rtt={rtt0:.1f}  {dt:.1f}s")


if __name__ == "__main__":
    main()
