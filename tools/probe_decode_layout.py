"""Compile-only probe: inspect the decode-chunk HLO per s_active bucket for
relayout copies of the frozen KV (D-minor (8,128)-tiled copies pad head_dim
64 -> 128 lanes, doubling the bytes every decode step reads).

Usage: python tools/probe_decode_layout.py [batch] [s_max] [buckets...]
"""
import dataclasses
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 576
    buckets = [int(a) for a in sys.argv[3:]] or [288, 512, 576]

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
    print(f"init: {time.time() - t0:.0f}s", file=sys.stderr)

    engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))

    for s_active in buckets:
        t0 = time.time()
        lowered = engine._decode_chunk.lower(
            engine.params, engine.cache, engine.state,
            n_steps=eng.decode_chunk, s_active=s_active)
        compiled = lowered.compile()
        txt = compiled.as_text()
        # D-minor layouts for the 5-D s8 cache: minor-to-major starts with 4
        pad_copies = re.findall(
            r"s8\[30,\d+,16,\d+,64\]\{4,", txt)
        mem = compiled.memory_analysis()
        print(f"s_active={s_active}: compile {time.time()-t0:.0f}s, "
              f"D-minor s8 cache layouts: {len(pad_copies)}, "
              f"temp {mem.temp_size_in_bytes/2**30:.2f} GiB, "
              f"args {mem.argument_size_in_bytes/2**30:.2f} GiB",
              file=sys.stderr)
        for mo in sorted(set(re.findall(
                r"s8\[30,\d+,16,\d+,\d+\]\{[0-9,]+", txt)))[:6]:
            print(f"   layout: {mo}", file=sys.stderr)


if __name__ == "__main__":
    main()
