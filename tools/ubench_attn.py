"""Microbench: decode-attention frozen-read variants at bench shape.

B2=96 lanes, H=16, S=576, D=64; L layers folded as a leading scan dim
(L=10 here, scale x3 for the 30-layer model). All data generated on
device; each variant loops ITERS times inside one jit so tunnel RTT
doesn't dominate.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B2, H, S, D, L = 96, 16, 576, 64, 10
ITERS = 20


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    np.asarray(out[0, 0, 0])  # force
    t0 = time.time()
    out = fn_j(*args)
    np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / ITERS
    print(f"{name:42s} {dt * 1e6:9.1f} us/step-all-layers "
          f"({dt * 1e6 / L:6.1f} us/layer)", file=sys.stderr)


def main():
    key = jax.random.PRNGKey(0)
    ks_, vs_, q_, k_, v_ = jax.random.split(key, 5)

    @jax.jit
    def gen():
        kf = jax.random.normal(k_, (L, B2, H, S, D), jnp.bfloat16)
        vf = jax.random.normal(v_, (L, B2, H, S, D), jnp.bfloat16)
        q = jax.random.normal(q_, (L, B2, H, D), jnp.bfloat16)
        k8 = jnp.clip(jnp.round(kf.astype(jnp.float32) * 30), -127,
                      127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(vf.astype(jnp.float32) * 30), -127,
                      127).astype(jnp.int8)
        ks = jax.random.normal(ks_, (L, B2, H, S), jnp.bfloat16)
        vs = jax.random.normal(vs_, (L, B2, H, S), jnp.bfloat16)
        return kf, vf, q, k8, v8, ks, vs

    kb, vb, q, k8, v8, ks, vs = jax.block_until_ready(gen())

    def scan_layers(body):
        def run(*args):
            def step(acc, xs):
                return acc + body(*xs), None
            acc0 = jnp.zeros((B2, H, D), jnp.float32)
            for _ in range(ITERS):
                acc0, _ = jax.lax.scan(step, acc0, args)
            return acc0
        return run

    # variant 1: shipped path — int8 -> bf16 convert, bf16 einsum, scale mul
    def v1(k8l, v8l, ksl, vsl, ql):
        fk = k8l.astype(jnp.bfloat16)
        fv = v8l.astype(jnp.bfloat16)
        s = jnp.einsum("bhd,bhsd->bhs", ql, fk,
                       preferred_element_type=jnp.float32)
        s = s * ksl.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        p = (p * vsl.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhsd->bhd", p, fv,
                          preferred_element_type=jnp.float32)

    # variant 2: int8 q, int8 x int8 -> int32 QK dot
    def v2(k8l, v8l, ksl, vsl, ql):
        qa = jnp.max(jnp.abs(ql), axis=-1, keepdims=True).astype(jnp.float32)
        q8 = jnp.clip(jnp.round(ql.astype(jnp.float32) / qa * 127), -127,
                      127).astype(jnp.int8)
        s32 = jnp.einsum("bhd,bhsd->bhs", q8, k8l,
                         preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * (qa / 127.0) * ksl.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        p = (p * vsl.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhsd->bhd", p, v8l.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    # variant 3: bf16 cache, no scales
    def v3(kbl, vbl, ql):
        s = jnp.einsum("bhd,bhsd->bhs", ql, kbl,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhsd->bhd", p, vbl,
                          preferred_element_type=jnp.float32)

    # variant 4: int8 QK + int8 PV (probs quantized per row to int8)
    def v4(k8l, v8l, ksl, vsl, ql):
        qa = jnp.max(jnp.abs(ql), axis=-1, keepdims=True).astype(jnp.float32)
        q8 = jnp.clip(jnp.round(ql.astype(jnp.float32) / qa * 127), -127,
                      127).astype(jnp.int8)
        s32 = jnp.einsum("bhd,bhsd->bhs", q8, k8l,
                         preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * (qa / 127.0) * ksl.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        pv = p * vsl.astype(jnp.float32)
        pa = jnp.max(jnp.abs(pv), axis=-1, keepdims=True) + 1e-9
        p8 = jnp.clip(jnp.round(pv / pa * 127), -127, 127).astype(jnp.int8)
        o32 = jnp.einsum("bhs,bhsd->bhd", p8, v8l,
                         preferred_element_type=jnp.int32)
        return o32.astype(jnp.float32) * (pa / 127.0)

    # variant 5: int8 QK (current shipped) + bf16 V read directly
    def v5(k8l, vbl, ksl, ql):
        qa = jnp.max(jnp.abs(ql), axis=-1, keepdims=True).astype(jnp.float32)
        q8 = jnp.clip(jnp.round(ql.astype(jnp.float32) / qa * 127), -127,
                      127).astype(jnp.int8)
        s32 = jnp.einsum("bhd,bhsd->bhs", q8, k8l,
                         preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * (qa / 127.0) * ksl.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhsd->bhd", p, vbl,
                          preferred_element_type=jnp.float32)

    # variant 6: cache stored transposed [.., D, S] — the OOM/layout dumps
    # show XLA relayouts the [.., S, D] cache to a D-minor (8,128)-tiled
    # copy that pads D 64 -> 128 lanes (2x bytes read + 2x VPU converts).
    # With S minor the natural compact layout is what the dots read.
    k8t = jnp.swapaxes(k8, -1, -2).copy()   # [L, B2, H, D, S]
    v8t = jnp.swapaxes(v8, -1, -2).copy()
    jax.block_until_ready((k8t, v8t))

    def v6(k8l, v8l, ksl, vsl, ql):
        qa = jnp.max(jnp.abs(ql), axis=-1, keepdims=True).astype(jnp.float32)
        q8 = jnp.clip(jnp.round(ql.astype(jnp.float32) / qa * 127), -127,
                      127).astype(jnp.int8)
        s32 = jnp.einsum("bhd,bhds->bhs", q8, k8l,
                         preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * (qa / 127.0) * ksl.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        p = (p * vsl.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhds->bhd", p, v8l.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    # variant 7: transposed cache, bf16 QK (no int8 q quant)
    def v7(k8l, v8l, ksl, vsl, ql):
        s = jnp.einsum("bhd,bhds->bhs", ql, k8l.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s * ksl.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        p = (p * vsl.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.einsum("bhs,bhds->bhd", p, v8l.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    # --- engine-faithful variants: bisect what triggers the D-minor
    # (8,128) relayout copy the real decode chunk makes (pads D 64->128,
    # doubling every step's KV read) ---
    C = 32
    ring_k8 = jnp.zeros((L, B2, H, C, D), jnp.int8)
    ring_v8 = jnp.zeros((L, B2, H, C, D), jnp.int8)
    ring_ks = jnp.ones((L, B2, H, C), jnp.bfloat16)
    ring_vs = jnp.ones((L, B2, H, C), jnp.bfloat16)
    flen = jnp.full((B2,), S - 7, jnp.int32)
    jax.block_until_ready((ring_k8, ring_v8))

    def qquant(ql):
        # engine form: q [B,1,H,D] -> bthd einsum
        q4 = ql[:, None]                          # [B2, 1, H, D]
        qf = q4.astype(jnp.float32)
        qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9
        q8 = jnp.clip(jnp.round(qf / qa * 127.0), -127, 127).astype(jnp.int8)
        return q4, q8, qa

    # v8a: engine einsum forms (singleton t), no mask, no ring
    def v8a(k8l, v8l, ksl, vsl, ql):
        q4, q8, qa = qquant(ql)
        s32 = jnp.einsum("bthd,bhsd->bhts", q8, k8l,
                         preferred_element_type=jnp.int32)
        sf = (s32.astype(jnp.float32)
              * (qa.transpose(0, 2, 1, 3) / (127.0 * 8.0))
              * ksl.astype(jnp.float32)[:, :, None, :])
        p = jax.nn.softmax(sf, axis=-1)
        p = (p * vsl.astype(jnp.float32)[:, :, None, :]).astype(jnp.bfloat16)
        o = jnp.einsum("bhts,bhsd->bthd", p, v8l.astype(jnp.bfloat16))
        return o[:, 0]

    # v8b: + frozen_len mask
    def v8b(k8l, v8l, ksl, vsl, ql):
        q4, q8, qa = qquant(ql)
        s32 = jnp.einsum("bthd,bhsd->bhts", q8, k8l,
                         preferred_element_type=jnp.int32)
        sf = (s32.astype(jnp.float32)
              * (qa.transpose(0, 2, 1, 3) / (127.0 * 8.0))
              * ksl.astype(jnp.float32)[:, :, None, :])
        f_valid = (jnp.arange(S)[None, :] < flen[:, None])[:, None, None, :]
        sf = jnp.where(f_valid, sf, -1e30)
        p = jax.nn.softmax(sf, axis=-1)
        p = (p * vsl.astype(jnp.float32)[:, :, None, :]).astype(jnp.bfloat16)
        o = jnp.einsum("bhts,bhsd->bthd", p, v8l.astype(jnp.bfloat16))
        return o[:, 0]

    # v8c: + ring segment with joint softmax (full engine decode form)
    def v8c(k8l, v8l, ksl, vsl, rkl, rvl, rksl, rvsl, ql):
        q4, q8, qa = qquant(ql)
        s32 = jnp.einsum("bthd,bhsd->bhts", q8, k8l,
                         preferred_element_type=jnp.int32)
        sf = (s32.astype(jnp.float32)
              * (qa.transpose(0, 2, 1, 3) / (127.0 * 8.0))
              * ksl.astype(jnp.float32)[:, :, None, :])
        rk = rkl.astype(jnp.bfloat16)
        rv = rvl.astype(jnp.bfloat16)
        sr = jnp.einsum("bthd,bhcd->bhtc", q4, rk,
                        preferred_element_type=jnp.float32) / 8.0
        sr = sr * rksl.astype(jnp.float32)[:, :, None, :]
        f_valid = (jnp.arange(S)[None, :] < flen[:, None])[:, None, None, :]
        r_valid = (jnp.arange(C)[None, :] <= 7)[:, None, None, :]
        sf = jnp.where(f_valid, sf, -1e30)
        sr = jnp.where(r_valid, sr, -1e30)
        mm = jnp.maximum(jnp.max(sf, axis=-1, keepdims=True),
                         jnp.max(sr, axis=-1, keepdims=True))
        ef, er = jnp.exp(sf - mm), jnp.exp(sr - mm)
        den = jnp.sum(ef, -1, keepdims=True) + jnp.sum(er, -1, keepdims=True)
        pf = ((ef / den) * vsl.astype(jnp.float32)[:, :, None, :]).astype(jnp.bfloat16)
        pr = ((er / den) * rvsl.astype(jnp.float32)[:, :, None, :]).astype(jnp.bfloat16)
        o = (jnp.einsum("bhts,bhsd->bthd", pf, v8l.astype(jnp.bfloat16))
             + jnp.einsum("bhtc,bhcd->bthd", pr, rv))
        return o[:, 0]

    def scan_layers_r(body):
        def run(k8_, v8_, ks_, vs_, rk_, rv_, rks_, rvs_, q_):
            def step(acc, xs):
                return acc + body(*xs), None
            acc0 = jnp.zeros((B2, H, D), jnp.float32)
            for _ in range(ITERS):
                acc0, _ = jax.lax.scan(
                    step, acc0, (k8_, v8_, ks_, vs_, rk_, rv_, rks_, rvs_, q_))
            return acc0
        return run

    def report_copies(name, fn, *args):
        txt = jax.jit(fn).lower(*args).compile().as_text()
        import re as _re
        dmin = sorted(set(_re.findall(r"s8\[\d+,\d+,\d+,\d+,64\]\{4,[0-9,]+",
                                      txt)))
        print(f"{name}: D-minor s8 layouts: {len(dmin)}", file=sys.stderr)
        for ln in dmin[:4]:
            print("   " + ln, file=sys.stderr)

    timeit("v1 shipped int8->bf16 + scale",
           scan_layers(v1), k8, v8, ks, vs, q)
    timeit("v2 int8xint8 QK (int32 MXU)",
           scan_layers(v2), k8, v8, ks, vs, q)
    timeit("v3 bf16 cache", scan_layers(v3), kb, vb, q)
    timeit("v4 int8 QK + int8 PV", scan_layers(v4), k8, v8, ks, vs, q)
    timeit("v5 int8 QK + bf16 V direct", scan_layers(v5), k8, vb, ks, q)
    timeit("v6 transposed [D,S] cache int8 QK",
           scan_layers(v6), k8t, v8t, ks, vs, q)
    timeit("v7 transposed [D,S] cache bf16 QK",
           scan_layers(v7), k8t, v8t, ks, vs, q)
    # --- packed-heads layout: K/V as [L, B2, S, H*D] (heads folded into
    # lanes; 1024 = 8x128 exact tiles, so the dot-preferred "D-minor" layout
    # is compact — no 64->128 pad).  QK uses a block-diagonal q [H, H*D]
    # (M=16 MXU matmul; the 16x MAC waste is free next to the saved
    # bytes/converts), PV is a real [H, S] x [S, H*D] matmul with a
    # block-diagonal extraction of the output. ---
    kp = (jnp.swapaxes(k8, 2, 3)                      # [L,B2,S,H,D]
          .reshape(L, B2, S, H * D).copy())
    vp = (jnp.swapaxes(v8, 2, 3).reshape(L, B2, S, H * D).copy())
    eye = jnp.eye(H, dtype=jnp.int8)
    eyeb = jnp.eye(H, dtype=jnp.bfloat16)
    jax.block_until_ready((kp, vp))

    def v9(kpl, vpl, ksl, vsl, ql):
        # int8 blockdiag QK on MXU, bf16 PV matmul with diag extract
        qf = ql.astype(jnp.float32)
        qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9
        q8 = jnp.clip(jnp.round(qf / qa * 127), -127, 127).astype(jnp.int8)
        qbd = (q8[:, :, None, :] * eye[None, :, :, None]).reshape(B2, H, H * D)
        s32 = jnp.einsum("bhD,bsD->bhs", qbd, kpl,
                         preferred_element_type=jnp.int32)
        s = (s32.astype(jnp.float32) * (qa / 127.0)
             * ksl.astype(jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        p = (p * vsl.astype(jnp.float32)).astype(jnp.bfloat16)
        o = jnp.einsum("bhs,bsD->bhD", p, vpl.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        o4 = o.reshape(B2, H, H, D)
        return jnp.einsum("bhgd,hg->bhd", o4, eyeb.astype(jnp.float32))

    # v10: packed + int8 PV (per-row requant, v_scale folded pre-quant)
    def v10(kpl, vpl, ksl, vsl, ql):
        qf = ql.astype(jnp.float32)
        qa = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9
        q8 = jnp.clip(jnp.round(qf / qa * 127), -127, 127).astype(jnp.int8)
        qbd = (q8[:, :, None, :] * eye[None, :, :, None]).reshape(B2, H, H * D)
        s32 = jnp.einsum("bhD,bsD->bhs", qbd, kpl,
                         preferred_element_type=jnp.int32)
        s = (s32.astype(jnp.float32) * (qa / 127.0)
             * ksl.astype(jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        pv = p * vsl.astype(jnp.float32)
        pa = jnp.max(pv, axis=-1, keepdims=True) + 1e-9
        p8 = jnp.clip(jnp.round(pv / pa * 127), 0, 127).astype(jnp.int8)
        o32 = jnp.einsum("bhs,bsD->bhD", p8, vpl,
                         preferred_element_type=jnp.int32)
        o = o32.astype(jnp.float32) * (pa / 127.0)
        o4 = o.reshape(B2, H, H, D)
        return jnp.einsum("bhgd,hg->bhd", o4, jnp.eye(H, dtype=jnp.float32))

    timeit("v8a engine einsum forms (t dim)",
           scan_layers(v8a), k8, v8, ks, vs, q)
    timeit("v8b + frozen_len mask",
           scan_layers(v8b), k8, v8, ks, vs, q)
    timeit("v8c + ring joint softmax",
           scan_layers_r(v8c), k8, v8, ks, vs, ring_k8, ring_v8,
           ring_ks, ring_vs, q)
    timeit("v9 packed-heads int8 QK + bf16 PV",
           scan_layers(v9), kp, vp, ks, vs, q)
    timeit("v10 packed-heads int8 QK + int8 PV",
           scan_layers(v10), kp, vp, ks, vs, q)
    report_copies("v2", scan_layers(v2), k8, v8, ks, vs, q)
    report_copies("v8a", scan_layers(v8a), k8, v8, ks, vs, q)
    report_copies("v8b", scan_layers(v8b), k8, v8, ks, vs, q)
    report_copies("v8c", scan_layers_r(v8c), k8, v8, ks, vs, ring_k8,
                  ring_v8, ring_ks, ring_vs, q)


if __name__ == "__main__":
    main()
