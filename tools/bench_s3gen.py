"""S3Gen-only vocode benchmark for batch-size / step-count experiments.

Usage: python tools/bench_s3gen.py [batch] [gen_tokens] [n_timesteps]
Prints s/call + realtime factor to stderr (diagnostic; bench.py is official).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    Tg = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from chatterbox_tpu.config import S3GenConfig, S3_TOKEN_RATE
    from chatterbox_tpu.models.s3gen.flow import fixed_noise
    from chatterbox_tpu.models.s3gen.s3gen import S3Gen

    print(f"devices: {jax.devices()}  B={B} Tg={Tg} steps={steps}",
          file=sys.stderr)
    rng = jax.random.PRNGKey(0)
    scfg = S3GenConfig()
    s3gen = S3Gen(scfg)
    Tp = 100
    T = Tp + Tg
    tokens = jnp.zeros((B, T), jnp.int32)
    token_len = jnp.full((B,), T, jnp.int32)
    pfeat = jnp.zeros((B, 2 * Tp, scfg.n_mels), jnp.bfloat16)
    pflen = jnp.full((B,), 2 * Tp, jnp.int32)
    emb = jnp.zeros((B, scfg.spk_embed_dim), jnp.bfloat16)
    noise = jnp.broadcast_to(fixed_noise(scfg.n_mels)[:, :2 * T],
                             (B, 2 * T, scfg.n_mels)).astype(jnp.bfloat16)
    rngs = jax.random.split(jax.random.PRNGKey(42), B)

    t0 = time.time()
    sparams = jax.jit(lambda r: s3gen.init(
        r, tokens, token_len, pfeat, pflen, emb, noise, rngs,
        n_timesteps=1))(rng)
    sparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        sparams)
    jax.block_until_ready(sparams)
    print(f"param init: {time.time() - t0:.1f}s", file=sys.stderr)

    vocode = jax.jit(lambda p, *a: s3gen.apply(p, *a, n_timesteps=steps))
    t0 = time.time()
    wav, wl = vocode(sparams, tokens, token_len, pfeat, pflen, emb, noise, rngs)
    _ = np.asarray(wav[0, :4])
    print(f"compile: {time.time() - t0:.1f}s", file=sys.stderr)

    n_calls = 4
    prof_dir = os.environ.get("CHATTERBOX_PROFILE")
    t0 = time.time()
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            wav, wl = vocode(sparams, tokens, token_len, pfeat, pflen, emb,
                             noise, rngs)
            _ = np.asarray(wav[0, :4])
        n_calls = 1
    else:
        for _ in range(n_calls):
            wav, wl = vocode(sparams, tokens, token_len, pfeat, pflen, emb,
                             noise, rngs)
            _ = np.asarray(wav[0, :4])
    dt = (time.time() - t0) / n_calls
    audio = B * Tg / S3_TOKEN_RATE
    print(f"[S3Gen] B={B} Tg={Tg} steps={steps}: {dt:.3f} s/call "
          f"({audio:.0f}s audio -> {audio / dt:.1f}x RT)", file=sys.stderr)


if __name__ == "__main__":
    main()
