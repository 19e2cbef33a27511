"""Time the jitted decode chunk per s_active bucket: separates the
frozen-attention cost (scales with s_active) from the fixed per-step cost
(dense projections, ring, sampler, scan overhead).

Usage: python tools/bench_decode_chunk.py [batch] [s_max]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 576

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

    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))
    n = eng.decode_chunk
    step = max(96, -(-S // 6))
    for s_active in sorted({max(step, min(S, k * step))
                            for k in range(1, S // step + 1)}):
        # warm compile
        ring, g0, st = engine._decode_chunk(
            engine.params, engine.cache, engine.state,
            n_steps=n, s_active=s_active)
        jax.block_until_ready(st.tokens)
        np.asarray(st.tokens)
        t0 = time.time()
        iters = 4
        for _ in range(iters):
            ring, g0, st = engine._decode_chunk(
                engine.params, engine.cache, st,
                n_steps=n, s_active=s_active)
        np.asarray(st.tokens)
        dt = (time.time() - t0) / iters / n
        print(f"s_active={s_active:4d}: {dt * 1e3:7.3f} ms/step "
              f"({dt * 1e3 / 30 * 1e3:6.1f} us/layer-equivalent)",
              file=sys.stderr)
        engine.reset()


if __name__ == "__main__":
    main()
