"""Microbench: decode-step dense-projection variants at bench shape.

The fixed-cost decomposition (docs/PERF.md round-2) shows the whole
~5.7 ms/step fixed cost sits in the trunk; attention reads are ~0.7 ms at
s=96 and the ring ~1.6 ms, leaving ~3.4 ms for the dense projections
(qkv / o / gate / up / down over 96 lanes, int8 weights).  The int8 weight
read alone is ~0.63 ms at HBM roofline, so if the int8->bf16 convert is
being materialized instead of fused into the dot, there is ~2-3 ms/step on
the table.  Variants:

  w8     : dot(x_bf16, w_q.astype(bf16)) * scale          (shipped)
  w8a8   : per-row int8 activation quant, int8 x int8 -> int32 MXU, scales
  bf16   : plain bf16 weights (2x read bytes, no convert)
  w8f32acc: like w8 but preferred_element_type f32 (shipped uses this)

All weights stacked [L, in, out] and looped via lax.scan inside ONE jit so
tunnel RTT doesn't pollute; L=30 layers' worth of the real shapes.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 96           # 2 x 48 CFG lanes
H = 1024
I = 4096
L = 30
ITERS = 20

SHAPES = [(H, 3 * H), (H, H), (H, I), (H, I), (I, H)]   # qkv, o, gate, up, down


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    np.asarray(jax.tree.leaves(out)[0])[0]
    t0 = time.time()
    out = fn_j(*args)
    np.asarray(jax.tree.leaves(out)[0])[0]
    dt = (time.time() - t0) / ITERS
    print(f"{name:10s} {dt * 1e3:8.3f} ms/step-all-layers "
          f"({dt * 1e6 / L:6.1f} us/layer)", file=sys.stderr)


def main():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def gen():
        ws, ss, wb = [], [], []
        for i, (fin, fout) in enumerate(SHAPES):
            k = jax.random.fold_in(key, i)
            w = jax.random.normal(k, (L, fin, fout), jnp.float32) * 0.02
            amax = jnp.maximum(jnp.abs(w).max(axis=1), 1e-8)   # [L, out]
            sc = amax / 127.0
            wq = jnp.clip(jnp.round(w / sc[:, None, :]), -127,
                          127).astype(jnp.int8)
            ws.append(wq)
            ss.append(sc)
            wb.append(w.astype(jnp.bfloat16))
        x = jax.random.normal(key, (B, H), jnp.bfloat16)
        xi = jax.random.normal(jax.random.fold_in(key, 99), (B, I),
                               jnp.bfloat16)
        return tuple(ws), tuple(ss), tuple(wb), x, xi

    ws, ss, wb, x, xi = gen()
    jax.block_until_ready(x)

    def loop(body):
        def run(ws_, ss_, x_, xi_):
            def step(carry, layer):
                acc = carry
                for i, (fin, fout) in enumerate(SHAPES):
                    a = x_ if fin == H else xi_
                    y = body(a, ws_[i][layer], ss_[i][layer])
                    acc = acc + jnp.sum(y.astype(jnp.float32))
                return acc, None

            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(L * ITERS) % L)
            return acc
        return run

    def w8(a, wq, sc):
        y = jnp.dot(a, wq.astype(a.dtype), preferred_element_type=jnp.float32)
        return (y * sc).astype(a.dtype)

    def w8a8(a, wq, sc):
        af = a.astype(jnp.float32)
        aa = jnp.max(jnp.abs(af), axis=-1, keepdims=True) + 1e-9
        a8 = jnp.clip(jnp.round(af / aa * 127.0), -127, 127).astype(jnp.int8)
        y32 = jnp.dot(a8, wq, preferred_element_type=jnp.int32)
        return (y32.astype(jnp.float32) * (aa / 127.0) * sc).astype(a.dtype)

    def bf16(a, w, sc):
        del sc
        return jnp.dot(a, w, preferred_element_type=jnp.float32
                       ).astype(a.dtype)

    timeit("w8", loop(w8), ws, ss, x, xi)
    timeit("w8a8", loop(w8a8), ws, ss, x, xi)
    timeit("bf16", loop(bf16), wb, ss, x, xi)


if __name__ == "__main__":
    main()
