"""Dump the compiled S3Gen vocode HLO and summarize the biggest copy/pad
instructions (data movement that is pure overhead)."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    Tg = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/s3gen_hlo.txt"

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
    sparams = jax.eval_shape(lambda r: s3gen.init(
        r, tokens, token_len, pfeat, pflen, emb, noise, rngs,
        n_timesteps=1), rng)
    sparams = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), sparams)

    compiled = jax.jit(
        lambda p, *a: s3gen.apply(p, *a, n_timesteps=10)).lower(
        sparams, tokens, token_len, pfeat, pflen, emb, noise, rngs).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)

    def size_of(shape_str):
        m = re.match(r"(bf16|f32|s8|s32|pred|u32)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt = {"bf16": 2, "f32": 4, "s8": 1, "s32": 4, "pred": 1, "u32": 4}[m.group(1)]
        dims = [int(x) for x in m.group(2).split(",") if x]
        n = dt
        for v in dims:
            n *= v
        return n

    rows = []
    for ln in txt.splitlines():
        mm = re.match(r"\s*%?(\S+) = (\S+\[\S*\]\S*) (copy|pad)\(", ln)
        if mm:
            rows.append((size_of(mm.group(2)), mm.group(3), ln.strip()[:200]))
    rows.sort(reverse=True)
    print(f"{len(rows)} copy/pad instructions; top by size:", file=sys.stderr)
    for sz, kind, ln in rows[:14]:
        print(f"  {sz/2**20:8.1f} MiB {kind}: {ln[:180]}", file=sys.stderr)


if __name__ == "__main__":
    main()
