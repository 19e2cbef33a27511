"""Warm microbench: full-batch decode chunk vs contiguous half-pool pair.

Isolates the pool-split arithmetic from scheduler/compile effects:
  A = decode_chunk(s=hi) + merge                    (the thing split avoids)
  B = pool(lo half, s=lo_s) + merge + pool(hi half, s=hi_s) + merge
If B < A the split pays at this (lo_s, hi_s) spread; the difference vs the
attention-read model says what the fixed per-dispatch overhead really is.

Usage: python tools/ubench_pool.py [B] [S] [lo_s] [hi_s]
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
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    lo_s = int(sys.argv[3]) if len(sys.argv) > 3 else 288
    hi_s = int(sys.argv[4]) if len(sys.argv) > 4 else 672

    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import T3Engine

    rng = jax.random.PRNGKey(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    eng = EngineConfig(max_batch_size=B, max_model_len=S, decode_chunk=32,
                       kv_dtype="int8")
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
    log("params ready")

    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))
    engine._ensure_capacity(S)
    n = eng.decode_chunk
    half = B // 2

    def full(s_active):
        ring, g0, engine.state = engine._decode_chunk(
            engine.params, engine.cache, engine.state,
            n_steps=n, s_active=s_active, needs_top_p=True)
        engine.cache = engine._merge(engine.cache, ring, g0,
                                     engine.state.global_pos - g0)

    def pools(sa, sb):
        for lo, hi, s_act in ((0, half, sa), (half, B, sb)):
            ring, g0, n_new, engine.state = engine._pool_chunk(
                engine.params, engine.cache, engine.state, lo=lo, hi=hi,
                n_steps=n, s_active=s_act, needs_top_p=True)
            engine.cache = engine._merge_pool(engine.cache, ring, g0,
                                              n_new, lo=lo)

    def timeit(name, fn, iters=8):
        fn()                                   # warm
        np.asarray(engine.state.tokens)
        t0 = time.time()
        for _ in range(iters):
            fn()
        np.asarray(engine.state.tokens)
        dt = (time.time() - t0) / iters
        log(f"{name}: {dt * 1e3:8.2f} ms/chunk  ({dt / n * 1e3:6.3f} ms/step)")
        return dt

    a_hi = timeit(f"full  s={hi_s}        ", lambda: full(hi_s))
    a_lo = timeit(f"full  s={lo_s}        ", lambda: full(lo_s))
    b = timeit(f"pools s=({lo_s},{hi_s})", lambda: pools(lo_s, hi_s))
    b_eq = timeit(f"pools s=({hi_s},{hi_s})", lambda: pools(hi_s, hi_s))
    log(f"split vs full@hi: {b / a_hi:.3f}x  "
        f"(model: ~{(a_hi + a_lo) / 2 / a_hi:.3f}x if overhead were zero)")
    log(f"equal-window pools vs full: {b_eq / a_hi:.3f}x  "
        "(pure 2-dispatch overhead)")


if __name__ == "__main__":
    main()
