"""Microbench: estimator flash-attention block sizes at vocoder shape.

Shape: [2B, H, T, D] = [16, 8, 1000, 64] (vocode batch 8, 10 Euler steps
call it 560 times).  Loops ITERS calls inside one jit per variant.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from chatterbox_tpu.ops.flash_attention import flash_self_attention

B, H, T, D = 16, 8, 1024, 64
ITERS = 30


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    jax.block_until_ready((q, k, v))

    # ragged lens variant exercises the conditional-mask path
    lens_ragged = jnp.asarray(
        np.random.default_rng(0).integers(700, T + 1, size=B), jnp.int32)

    # --check: compiled-mode numerics vs an f32 reference (the CPU test
    # runs interpret mode; after the pltpu.repeat tile-vs-element surprise
    # in ragged_decode, every production Pallas kernel gets an on-chip
    # numeric check)
    if "--check" in sys.argv:
        for ln, tag in ((lens, "dense"), (lens_ragged, "ragged")):
            for impl in ("v1", "v2"):
                out = flash_self_attention(q, k, v, ln, impl=impl)
                s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.float32),
                               k.astype(jnp.float32)) / np.sqrt(D)
                mask = (jnp.arange(T)[None, :] < ln[:, None])[:, None, None]
                p = jax.nn.softmax(jnp.where(mask, s, -1e30), axis=-1)
                ref = jnp.einsum("bhts,bhsd->bhtd", p, v.astype(jnp.float32))
                err = float(jnp.abs(out.astype(jnp.float32) - ref).max()
                            / (jnp.abs(ref).max() + 1e-9))
                ok = err < 2e-2
                print(f"check {impl} {tag}: rel err {err:.2e} "
                      f"({'OK' if ok else 'FAIL'})", file=sys.stderr)
                assert ok, (impl, tag, err)
    arms = [("v1", lens, 1024, 1024), ("v2", lens, 1024, 1024),
            ("v1", lens, 512, 1024), ("v2", lens, 512, 1024),
            ("v2-ragged", lens_ragged, 1024, 1024),
            ("v1-ragged", lens_ragged, 1024, 1024)]
    for name, ln, bq, bk in arms + arms[:2][::-1]:
        impl = name.split("-")[0]
        def run(q, k, v, ln, bq=bq, bk=bk, impl=impl):
            out = q
            for _ in range(ITERS):
                out = flash_self_attention(out, k, v, ln, bq=bq, bk=bk,
                                           impl=impl)
            return out
        f = jax.jit(run)
        o = f(q, k, v, ln)
        np.asarray(o[0, 0, 0])
        t0 = time.time()
        o = f(q, k, v, ln)
        np.asarray(o[0, 0, 0])
        dt = (time.time() - t0) / ITERS
        print(f"{name:10s} bq={bq:5d} bk={bk:5d}: {dt * 1e3:7.3f} ms/call",
              file=sys.stderr)


if __name__ == "__main__":
    main()
