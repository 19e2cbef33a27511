"""Multi-chip scaling-efficiency benchmark (BASELINE.json config 5).

Runs the sharded T3 engine over (dp, tp) meshes of increasing size and
reports steady-state decode tokens/s plus scaling efficiency vs the
single-device run.  On a real TPU slice, run as-is; without one, set
``--virtual N`` to lay the mesh over N virtual CPU devices — functionally
identical SPMD programs (same NamedShardings, same XLA collectives), numbers
then measure *functional* scaling only.

The reference has no distributed mode at all (SURVEY §2.9); this measures
what the TPU build adds.

Usage:
  python examples/scaling_bench.py --virtual 8 --tiny
  python examples/scaling_bench.py            # real devices, full model
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--tiny", action="store_true", help="tiny model (CPU)")
    ap.add_argument("--batch-per-dp", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--max-model-len", type=int, default=192)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.virtual:
        # sitecustomize may force-register a TPU platform and override the
        # env var; the config update works as long as no op has run yet
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from chatterbox_tpu.config import (EngineConfig, MeshConfig,
                                       T3ModelConfig)
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.parallel.sharding import build_mesh
    from chatterbox_tpu.runtime.engine import Request, T3Engine

    devices = jax.devices()
    n_dev = len(devices)
    print(f"devices: {n_dev} x {devices[0].device_kind}")

    cfg = T3ModelConfig.tiny() if args.tiny else T3ModelConfig()
    model = T3Model(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    jax.block_until_ready(params)

    # mesh ladder: (dp, tp) shapes that divide the device count
    shapes = [(1, 1)]
    n = 2
    while n <= n_dev:
        shapes.append((n // 2 if n > 1 else 1, 2) if cfg.n_heads % 2 == 0
                      else (n, 1))
        if (n, 1) not in shapes:
            shapes.append((n, 1))
        n *= 2

    rs = np.random.default_rng(0)
    base_tok_s = None
    for dp, tp in shapes:
        n_use = dp * tp
        if n_use > n_dev:
            break
        B = args.batch_per_dp * dp
        eng = EngineConfig(max_batch_size=B, max_model_len=args.max_model_len,
                           decode_chunk=16, prefill_buckets=(16, 32),
                           tokens_max=args.steps,
                           kv_dtype="bfloat16" if args.tiny else "int8")
        mesh = (None if (dp, tp) == (1, 1)
                else build_mesh(MeshConfig(dp=dp, tp=tp),
                                devices[:n_use]))
        engine = T3Engine(model, params, cfg, eng,
                          rng=jax.random.PRNGKey(1), mesh=mesh)
        reqs = [Request(
            text_ids=rs.integers(0, cfg.text_vocab_size, size=12).astype(np.int32),
            cond_emb=rs.standard_normal(
                (cfg.cond_len, cfg.hidden_size)).astype(np.float32),
            max_new_tokens=args.steps, temperature=0.8, uid=i)
            for i in range(B)]
        engine.generate(reqs[: max(1, B // 4)])   # warm compile
        engine.reset()
        t0 = time.time()
        results = engine.generate(reqs)
        dt = time.time() - t0
        toks = sum(len(r.tokens) for r in results)
        tok_s = toks / dt
        if base_tok_s is None:
            base_tok_s = tok_s
        eff = tok_s / (base_tok_s * n_use)
        print(f"mesh (dp={dp}, tp={tp}) on {n_use} dev: {tok_s:8.1f} tok/s, "
              f"scaling efficiency {eff:.2f}")
        del engine

    # ---- S3Gen vocode scaling (dp over the vocode batch; the vocoder is
    # 82% of the reference's runtime, so config 5 names it explicitly) ----
    from chatterbox_tpu.config import S3GenConfig
    from chatterbox_tpu.models.s3gen.flow import fixed_noise
    from chatterbox_tpu.models.s3gen.s3gen import S3Gen
    from chatterbox_tpu.parallel.sharding import sharded_vocode_fn

    scfg = S3GenConfig.tiny() if args.tiny else S3GenConfig()
    s3gen = S3Gen(scfg)
    Bv0, Tp, Tg = 4, 4, 16 if args.tiny else 200
    T = Tp + Tg

    def vocode_inputs(B):
        tokens = jnp.zeros((B, T), jnp.int32)
        token_len = jnp.full((B,), T, jnp.int32)
        pfeat = jnp.zeros((B, 2 * Tp, scfg.n_mels))
        pflen = jnp.full((B,), 2 * Tp, jnp.int32)
        emb = jnp.zeros((B, scfg.spk_embed_dim))
        noise = jnp.broadcast_to(fixed_noise(scfg.n_mels)[:, : 2 * T],
                                 (B, 2 * T, scfg.n_mels))
        return (tokens, token_len, pfeat, pflen, emb, noise,
                jax.random.split(jax.random.PRNGKey(2), B))

    sparams = jax.jit(lambda r: s3gen.init(
        r, *vocode_inputs(1), n_timesteps=1))(rng)
    base = None
    n_steps = 2 if args.tiny else 10
    dp = 1
    while dp <= n_dev:
        B = Bv0 * dp
        inp = vocode_inputs(B)
        if dp == 1:
            fn = jax.jit(lambda p, *a: s3gen.apply(p, *a,
                                                   n_timesteps=n_steps))
        else:
            fn = sharded_vocode_fn(
                s3gen, build_mesh(MeshConfig(dp=dp, tp=1), devices[:dp]),
                n_timesteps=n_steps)
        wav, _ = fn(sparams, *inp)
        jax.block_until_ready(wav)             # warm compile
        t0 = time.time()
        wav, _ = fn(sparams, *inp)
        jax.block_until_ready(wav)
        dt = time.time() - t0
        rate = B * Tg / dt                     # speech tokens vocoded / s
        if base is None:
            base = rate
        print(f"vocode dp={dp} (B={B}): {rate:10.1f} tok/s, "
              f"scaling efficiency {rate / (base * dp):.2f}")
        dp *= 2


if __name__ == "__main__":
    main()
