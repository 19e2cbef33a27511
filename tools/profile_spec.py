"""Profile the speculative-decode chunk vs the plain decode chunk on-chip.

The spec path at alpha=1 measures ~0.2x of plain where the cost model says
~1.0x (docs/PERF.md round-3 spec notes); two hypothesized causes (per-layer
ring writes, f32 ring-insert einsum / einsum-form relayouts) were fixed
with no effect — this tool captures jax.profiler device traces of a few
chunks of each path so tools/xprof.py can say where the time actually goes.

Usage: python tools/profile_spec.py [out_dir]   (default /tmp/r3/spec_prof)
"""
import dataclasses
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
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params
    from chatterbox_tpu.runtime.engine import Request, T3Engine

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3/spec_prof"
    B, S, chunk = 48, 576, 32
    rng = jax.random.PRNGKey(0)
    rs = np.random.default_rng(0)
    base_cfg = T3ModelConfig()
    cfg = dataclasses.replace(base_cfg, quant_weights=True)
    model = T3Model(cfg)
    params = jax.jit(lambda r: T3Model(base_cfg).init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    params = quantize_t3_params(jax.tree.map(np.asarray, params))
    params = jax.tree.map(
        lambda x: jnp.asarray(x).astype(jnp.bfloat16)
        if jnp.asarray(x).dtype == jnp.float32 else jnp.asarray(x), params)
    jax.block_until_ready(params)
    log("params ready")

    reqs = []
    for i in range(B):
        text = rs.integers(1, cfg.text_vocab_size, size=130).astype(np.int32)
        cond = (0.02 * rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size))).astype(np.float32)
        reqs.append(Request(text_ids=text, cond_emb=cond,
                            max_new_tokens=400, temperature=0.0, top_p=1.0,
                            uid=i))

    def run_variant(name, eng):
        engine = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(1))
        engine.precompile(needs_top_p=False)
        # admit everything, run a few chunks to steady state
        engine._ttft = {}
        engine._admit(reqs[:16], list(range(16)))
        engine._admit(reqs[16:32], list(range(16, 32)))
        engine._admit(reqs[32:48], list(range(32, 48)))

        class _Sched:  # minimal: advance() upper bound + uniform caps
            def __init__(self):
                self.pos = 200
            def advance(self, n):
                self.pos = min(S, self.pos + n)
                return self.pos
            def pos_caps(self):
                # uniform positions: the pool split never engages, so the
                # traced path is the plain full-batch dispatch
                return np.full((B,), self.pos, np.int32)
        sched = _Sched()
        for _ in range(4):  # warm steady state
            engine._dispatch_decode(sched, needs_top_p=False)
        jax.block_until_ready(engine.state.tokens)
        t0 = time.time()
        d = os.path.join(out, name)
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            for _ in range(4):
                engine._dispatch_decode(sched, needs_top_p=False)
            np.asarray(engine.state.n_generated)
        dt = time.time() - t0
        ngen = int(np.asarray(engine.state.n_generated).sum())
        log(f"{name}: 4 dispatches in {dt:.2f}s; n_generated total {ngen}; "
            f"trace -> {d}")
        del engine

    run_variant("plain", EngineConfig(
        max_batch_size=B, max_model_len=S, decode_chunk=chunk,
        kv_dtype="int8"))
    run_variant("spec", EngineConfig(
        max_batch_size=B, max_model_len=S, decode_chunk=chunk,
        kv_dtype="int8", spec_decode=True,
        spec_draft_layers=base_cfg.n_layers, spec_tokens=3))
    # k=10: the real operating depth.  Random weights give near-zero
    # acceptance for a truncated draft, so tok/s is meaningless here — but
    # the COST per cycle (4 dispatches = 32 cycles) is exactly what the
    # machinery multiplier needs: cost model says ~(1 + M*k/30) plain
    # steps per cycle = 2 at k=10/M=3.
    run_variant("spec_k10", EngineConfig(
        max_batch_size=B, max_model_len=S, decode_chunk=chunk,
        kv_dtype="int8", spec_decode=True,
        spec_draft_layers=10, spec_tokens=3))
    log("done; inspect with: python tools/xprof.py <trace_dir> 25 --group")


if __name__ == "__main__":
    main()
