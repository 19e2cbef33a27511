"""Fresh device profile of the batched S3Gen vocode call (round-4: the
e2e headline is S3Gen-carried; last trace was round-1 — re-baseline the
op-group split before attacking the 'pads+copies' and flash lines).

Usage: python tools/profile_s3gen.py [B] [Tg] [n_timesteps]
"""
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    Tg = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from chatterbox_tpu.config import S3GenConfig
    from chatterbox_tpu.models.s3gen.flow import fixed_noise
    from chatterbox_tpu.models.s3gen.s3gen import S3Gen

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
    log(f"params {time.time() - t0:.1f}s")

    vocode = jax.jit(lambda p, *a: s3gen.apply(p, *a, n_timesteps=steps))
    t0 = time.time()
    wav, wl = vocode(sparams, tokens, token_len, pfeat, pflen, emb, noise,
                     rngs)
    _ = np.asarray(wav[0, :4])
    log(f"compile {time.time() - t0:.1f}s")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        wav, wl = vocode(sparams, tokens, token_len, pfeat, pflen, emb,
                         noise, rngs)
        _ = np.asarray(wav[0, :4])
    per = (time.time() - t0) / iters
    log(f"warm: {per * 1e3:.1f} ms/call = {per / B * 1e3:.1f} ms/sample "
        f"-> {B * Tg / 25 / per:.1f}x RT")

    trace_dir = f"/tmp/s3gen_trace_B{B}_T{Tg}"
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            wav, wl = vocode(sparams, tokens, token_len, pfeat, pflen, emb,
                             noise, rngs)
            _ = np.asarray(wav[0, :4])
    log(f"trace -> {trace_dir}")
    from xprof import device_op_times, group_name
    import collections
    tot, cnt = device_op_times(trace_dir)
    g, gc = collections.Counter(), collections.Counter()
    for nm, ps in tot.items():
        g[group_name(nm)] += ps
        gc[group_name(nm)] += cnt[nm]
    total = sum(g.values())
    log(f"--- device total {total / 1e9:.2f} ms over 2 calls ---")
    for nm, ps in g.most_common(22):
        log(f"{ps / 1e9 / 2:9.2f} ms/call ({100 * ps / total:4.1f}%) "
            f"x{gc[nm] // 2:6d}  {nm}")
    log("top ops:")
    for nm, ps in tot.most_common(25):
        log(f"{ps / 1e9 / 2:9.2f} ms/call x{cnt[nm] / 2:7.1f}  {nm[:150]}")


if __name__ == "__main__":
    main()
