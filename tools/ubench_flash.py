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
