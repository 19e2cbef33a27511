"""Microbench: ragged Pallas decode attention vs the shipped XLA packed
einsum at bench shape.

Arms (all packed-heads int8 cache [L, B2, S, H*D] + bf16 scales):
  xla_dense      — shipped block-diag einsum, full-window read + mask
  pallas_dense   — ragged kernel with every length = S (worst case: must
                   roughly tie xla_dense for the ragged win to be real)
  pallas_ragged  — ragged kernel with the parity-mix lengths
  xla_ragged     — shipped einsum with the same lengths (reads everything)

Run on the chip:  python tools/ubench_ragged.py [S] [B2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_tpu.ops.ragged_decode import ragged_decode_attention

S = int(sys.argv[1]) if len(sys.argv) > 1 else 576
B2 = int(sys.argv[2]) if len(sys.argv) > 2 else 128
H, D, L = 16, 64, 10
HD = H * D
ITERS = 20
BLOCK_S = 192 if S % 192 == 0 else 96


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    np.asarray(out[0, 0, 0])
    t0 = time.time()
    out = fn_j(*args)
    np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / ITERS
    print(f"{name:24s} {dt * 1e6:9.1f} us/step-all-layers "
          f"({dt * 1e6 / L:6.1f} us/layer)", file=sys.stderr)
    return dt * 1e6 / L


def main():
    key = jax.random.PRNGKey(0)
    ks_ = jax.random.split(key, 6)

    @jax.jit
    def gen():
        kp = jax.random.randint(ks_[0], (L, B2, S, HD), -127, 128, jnp.int8)
        vp = jax.random.randint(ks_[1], (L, B2, S, HD), -127, 128, jnp.int8)
        ks = jax.random.uniform(ks_[2], (L, B2, H, S), jnp.float32,
                                0.01, 0.03).astype(jnp.bfloat16)
        vs = jax.random.uniform(ks_[3], (L, B2, H, S), jnp.float32,
                                0.01, 0.03).astype(jnp.bfloat16)
        q8 = jax.random.randint(ks_[4], (L, B2, H, D), -127, 128, jnp.int8)
        qs = jax.random.uniform(ks_[5], (L, B2, H), jnp.float32,
                                0.001, 0.01)
        eye = jnp.eye(H, dtype=jnp.int8)
        qbd = (q8[:, :, :, None, :] * eye[None, None, :, :, None]
               ).reshape(L, B2, H, HD)
        return kp, vp, ks, vs, qbd, qs

    kp, vp, ks, vs, qbd, qs = jax.block_until_ready(gen())

    # parity-mix lengths: cond/uncond pairs share; uniform over
    # [S//3.5, S] like the steady-state position spread of ragged caps
    rs = np.random.default_rng(0)
    lens_req = rs.integers(max(96, int(S / 3.5)), S + 1, size=B2 // 2)
    lens_ragged = jnp.asarray(np.repeat(lens_req, 2).astype(np.int32))
    lens_dense = jnp.full((B2,), S, jnp.int32)
    frac = float(np.repeat(lens_req, 2).sum()) / (B2 * S)
    print(f"S={S} B2={B2} block_s={BLOCK_S} ragged fill={frac:.2f}",
          file=sys.stderr)

    def scan_layers(body, n_in):
        def run(*args):
            def step(acc, xs):
                return acc + body(*xs), None
            acc0 = jnp.zeros((B2, H, D), jnp.float32)
            for _ in range(ITERS):
                acc0, _ = jax.lax.scan(step, acc0, args[:n_in])
            return acc0
        return run

    def xla_body(lens):
        def body(kpl, vpl, ksl, vsl, qbdl, qsl):
            s32 = jnp.einsum("bhD,bsD->bhs", qbdl, kpl,
                             preferred_element_type=jnp.int32)
            s = (s32.astype(jnp.float32) * qsl[..., None]
                 * ksl.astype(jnp.float32))
            valid = (jnp.arange(S)[None, :] < lens[:, None])[:, None, :]
            s = jnp.where(valid, s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            p = (p * vsl.astype(jnp.float32)).astype(jnp.bfloat16)
            o = jnp.einsum("bhs,bsD->bhD", p, vpl.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            o4 = o.reshape(B2, H, H, D)
            return jnp.einsum("bhgd,hg->bhd", o4,
                              jnp.eye(H, dtype=jnp.float32))
        return body

    def pallas_body(lens):
        def body(kpl, vpl, ksl, vsl, qbdl, qsl):
            o, m, l = ragged_decode_attention(
                lens, qbdl, qsl, kpl, vpl, ksl, vsl, block_s=BLOCK_S)
            return o / jnp.maximum(l, 1e-30)[..., None]
        return body

    # compiled-mode numeric check (the CPU tests run interpret mode; this
    # verifies the Mosaic lowering itself): one layer, ragged lengths
    if "--check" in sys.argv:
        from chatterbox_tpu.ops.ragged_decode import LANE_BLOCK
        o, m, l_ = ragged_decode_attention(
            lens_ragged, qbd[0], qs[0], kp[0], vp[0], ks[0], vs[0],
            block_s=BLOCK_S)
        o_pl = np.asarray(o / np.maximum(np.asarray(l_), 1e-30)[..., None])
        o_ref = np.asarray(xla_body(lens_ragged)(
            kp[0], vp[0], ks[0], vs[0], qbd[0], qs[0]))
        err = np.abs(o_pl - o_ref).max() / (np.abs(o_ref).max() + 1e-9)
        print(f"compiled-mode check: max rel err {err:.2e} "
              f"({'OK' if err < 2e-2 else 'FAIL'})", file=sys.stderr)
        assert err < 2e-2, err

    args = (kp, vp, ks, vs, qbd, qs)
    r = {}
    r["xla_dense"] = timeit("xla_dense",
                            scan_layers(xla_body(lens_dense), 6), *args)
    r["pallas_dense"] = timeit("pallas_dense",
                               scan_layers(pallas_body(lens_dense), 6), *args)
    r["pallas_ragged"] = timeit("pallas_ragged",
                                scan_layers(pallas_body(lens_ragged), 6),
                                *args)
    r["xla_ragged"] = timeit("xla_ragged",
                             scan_layers(xla_body(lens_ragged), 6), *args)
    print(f"pallas_dense/xla_dense = {r['pallas_dense']/r['xla_dense']:.3f}; "
          f"pallas_ragged/xla_ragged = "
          f"{r['pallas_ragged']/r['xla_ragged']:.3f} (fill {frac:.2f})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
