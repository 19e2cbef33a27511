"""Decompose the decode-chunk device cost per HLO-op group at given
s_active buckets (the round-3 riddle: step(s) ~= 5.3 ms fixed +
6.9 us x s_active, where the roofline says the fixed part should be
~1.6 ms — weights 0.5 GB int8 + ring + sampler).

Traces `n_trace` warm (decode_chunk + merge) dispatch pairs per bucket
with jax.profiler and prints the grouped device-op table via tools/xprof.

Usage: python tools/profile_decode.py [batch] [s_max] [buckets...]
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 576
    buckets = [int(a) for a in sys.argv[3:]] or [96, 576]

    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import T3Engine

    rng = jax.random.PRNGKey(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    eng = EngineConfig(max_batch_size=B, max_model_len=S, decode_chunk=32,
                       kv_dtype="int8")
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
    log(f"params ready {time.time() - t0:.1f}s")

    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))
    n = eng.decode_chunk
    n_trace = 4
    for s_active in buckets:
        engine._ensure_capacity(s_active)
        # warm compile (chunk + merge)
        ring, g0, st = engine._decode_chunk(
            engine.params, engine.cache, engine.state,
            n_steps=n, s_active=s_active)
        engine.cache = engine._merge(engine.cache, ring, g0,
                                     st.global_pos - g0)
        engine.state = st
        np.asarray(st.tokens)
        log(f"warm s={s_active} done")
        # timed (untraced) reference
        t0 = time.time()
        for _ in range(n_trace):
            ring, g0, st = engine._decode_chunk(
                engine.params, engine.cache, engine.state,
                n_steps=n, s_active=s_active)
            engine.cache = engine._merge(engine.cache, ring, g0,
                                         st.global_pos - g0)
            engine.state = st
        np.asarray(st.tokens)
        wall = (time.time() - t0) / n_trace / n
        log(f"s={s_active}: {wall * 1e3:.3f} ms/step wall (chunk+merge)")

        trace_dir = f"/tmp/decode_trace_s{s_active}"
        with jax.profiler.trace(trace_dir):
            for _ in range(n_trace):
                ring, g0, st = engine._decode_chunk(
                    engine.params, engine.cache, engine.state,
                    n_steps=n, s_active=s_active)
                engine.cache = engine._merge(engine.cache, ring, g0,
                                             st.global_pos - g0)
                engine.state = st
            np.asarray(st.tokens)
        log(f"trace s={s_active} written to {trace_dir}")
        from xprof import device_op_times, group_name
        import collections
        tot, cnt = device_op_times(trace_dir)
        g, gc = collections.Counter(), collections.Counter()
        for nm, ps in tot.items():
            g[group_name(nm)] += ps
            gc[group_name(nm)] += cnt[nm]
        total = sum(g.values())
        steps = n_trace * n
        log(f"--- s_active={s_active}: device total {total / 1e9:.2f} ms "
            f"over {steps} steps = {total / 1e9 / steps:.3f} ms/step ---")
        for nm, ps in g.most_common(25):
            log(f"{ps / 1e9 / steps * 1e3:9.1f} us/step ({100 * ps / total:4.1f}%) "
                f"x{gc[nm] // steps:4d}/step  {nm}")
        # top individual ops, per step
        log("top ops:")
        for nm, ps in tot.most_common(18):
            log(f"{ps / 1e9 / steps * 1e3:9.1f} us/step x{cnt[nm] / steps:6.1f}  {nm[:140]}")
        engine.reset()


if __name__ == "__main__":
    main()
