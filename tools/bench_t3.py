"""T3-only decode benchmark for KV-dtype / batch-size experiments.

Usage: python tools/bench_t3.py [kv_dtype] [batch] [s_max]
Prints tok/s to stderr (diagnostic tool; bench.py stays the official bench).
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
    kv_dtype = sys.argv[1] if len(sys.argv) > 1 else "int8"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 576
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    quant_act = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
    compact = bool(int(sys.argv[7])) if len(sys.argv) > 7 else False

    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import T3Engine, Request

    print(f"devices: {jax.devices()}  kv={kv_dtype} B={B} S={S} k={k} "
          f"a8={int(quant_act)} compact={int(compact)}", file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)

    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True,
                              quant_act=quant_act)
    eng = EngineConfig(max_batch_size=B, max_model_len=S, decode_chunk=chunk,
                       kv_dtype=kv_dtype, chunks_per_dispatch=k,
                       compact_tail=compact)
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

    n_requests = 2 * B
    reqs = []
    for i in range(n_requests):
        text = rs.integers(1, cfg.text_vocab_size, size=130).astype(np.int32)
        cond = (0.02 * rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size))).astype(np.float32)
        reqs.append(Request(text_ids=text, cond_emb=cond,
                            max_new_tokens=400, temperature=0.8,
                            top_p=0.8, uid=i))

    t0 = time.time()
    engine.precompile()
    warm = [Request(text_ids=reqs[i].text_ids, cond_emb=reqs[i].cond_emb,
                    max_new_tokens=40, uid=i) for i in range(B)]
    for n in (1, 4, len(warm)):
        engine.generate(warm[:n])
        engine.reset()
    print(f"warmup: {time.time() - t0:.1f}s", file=sys.stderr)

    prof_dir = os.environ.get("CHATTERBOX_PROFILE")
    t0 = time.time()
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            results = engine.generate(reqs)
    else:
        results = engine.generate(reqs)
    t3_time = time.time() - t0
    total_tokens = sum(len(r.tokens) for r in results)
    print(f"[T3] kv={kv_dtype} B={B} chunk={chunk} k={k}: {total_tokens} tokens in "
          f"{t3_time:.2f}s -> {total_tokens / t3_time:.1f} tok/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
