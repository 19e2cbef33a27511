"""TPU benchmark: T3 batched decode throughput (the reference's headline
metric — 4,577.88 output tok/s on an RTX 3090, reference README.md:151).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on the default platform (the real TPU chip under the driver).
Extra diagnostics go to stderr.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TOK_S = 4577.88  # reference README.md:151 (RTX 3090, v0.1.3)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.runtime.engine import T3Engine, Request

    cfg = T3ModelConfig()
    eng = EngineConfig(max_batch_size=24, max_model_len=576, decode_chunk=32)
    model = T3Model(cfg)

    log(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    jax.block_until_ready(params)
    log(f"param init: {time.time() - t0:.1f}s")

    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))

    # Workload: 32 requests, ~130 text tokens, up to 400 speech tokens each
    # (matches the benchmark.py chunking regime: ≤400 chars -> a few hundred
    # tokens per chunk).
    rs = np.random.default_rng(0)
    n_requests = 64
    reqs = []
    for i in range(n_requests):
        text = rs.integers(1, cfg.text_vocab_size, size=130).astype(np.int32)
        cond = (0.02 * rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size))).astype(np.float32)
        reqs.append(Request(text_ids=text, cond_emb=cond,
                            max_new_tokens=400, temperature=0.8,
                            top_p=0.8, uid=i))

    # Warmup: compile prefill + all decode s_active buckets
    t0 = time.time()
    engine.precompile()
    warm = [Request(text_ids=reqs[i].text_ids, cond_emb=reqs[i].cond_emb,
                    max_new_tokens=40, uid=i) for i in range(eng.max_batch_size)]
    for n in (1, 4, len(warm)):        # cover the prefill m-buckets
        engine.generate(warm[:n])
        engine.reset()
    log(f"warmup (compile): {time.time() - t0:.1f}s")

    engine.reset()
    t0 = time.time()
    results = engine.generate(reqs)
    dt = time.time() - t0
    total_tokens = sum(len(r.tokens) for r in results)
    tok_s = total_tokens / dt
    log(f"decode: {total_tokens} tokens in {dt:.2f}s -> {tok_s:.1f} tok/s")
    log(f"audio-seconds equivalent: {total_tokens / 25:.1f}s "
        f"-> {total_tokens / 25 / dt:.1f}x realtime (T3 stage only)")

    print(json.dumps({
        "metric": "t3_batched_decode_throughput",
        "value": round(tok_s, 2),
        "unit": "speech_tokens/s/chip",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 4),
    }))


if __name__ == "__main__":
    main()
