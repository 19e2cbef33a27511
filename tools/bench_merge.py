"""Time the engine's ring->frozen merge and prefill-insert in isolation.

Usage: python tools/bench_merge.py [batch] [s_max]
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
    from chatterbox_tpu.models.t3.backbone import KVCache
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
    ring = KVCache.zeros(cfg, 2 * B, n, jnp.int8)
    g0 = jnp.full((B,), 200, jnp.int32)
    n_new = jnp.full((B,), n, jnp.int32)

    engine.cache = engine._merge(engine.cache, ring, g0, n_new)
    jax.block_until_ready(engine.cache.k)
    np.asarray(engine.cache.k[0, 0, 0, :1])
    iters = 8
    t0 = time.time()
    for _ in range(iters):
        engine.cache = engine._merge(engine.cache, ring, g0, n_new)
    np.asarray(engine.cache.k[0, 0, 0, :1])
    print(f"merge: {(time.time() - t0) / iters * 1e3:.2f} ms/call",
          file=sys.stderr)


if __name__ == "__main__":
    main()
