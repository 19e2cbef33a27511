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

    for bq, bk in ((1024, 1024), (512, 1024), (1024, 512), (512, 512),
                   (256, 1024), (128, 1024)):
        def run(q, k, v, lens, bq=bq, bk=bk):
            acc = jnp.zeros((), jnp.float32)
            out = q
            for _ in range(ITERS):
                out = flash_self_attention(out, k, v, lens, bq=bq, bk=bk)
            return out
        f = jax.jit(run)
        o = f(q, k, v, lens)
        np.asarray(o[0, 0, 0])
        t0 = time.time()
        o = f(q, k, v, lens)
        np.asarray(o[0, 0, 0])
        dt = (time.time() - t0) / ITERS
        print(f"bq={bq:5d} bk={bk:5d}: {dt * 1e3:7.3f} ms/call",
              file=sys.stderr)


if __name__ == "__main__":
    main()
