"""Multi-host SPMD dry run: N processes x M virtual CPU devices each.

Validates the jax.distributed path (SURVEY §2.9 / §5.8, BASELINE config 5)
without pod hardware: each worker process initializes jax.distributed
against a local coordinator, the global mesh lays the dp axis DCN-major
(build_mesh dcn_dp), and BOTH the sharded training step and the sharded
serving engine run SPMD across the process boundary — with greedy-token
equality against a single-device engine computed locally in every process.

Launcher (parent): python tools/dryrun_multihost.py
Worker:            python tools/dryrun_multihost.py worker <pid> <nproc> <port> <ndev>
"""
import os
import sys


def worker(process_id: int, num_processes: int, port: int, n_local: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")   # sitecustomize forces axon
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from chatterbox_tpu.parallel.distributed import init_distributed

    info = init_distributed(coordinator_address=f"localhost:{port}",
                            num_processes=num_processes,
                            process_id=process_id)
    assert info["process_count"] == num_processes, info
    n_global = len(info["global_devices"])
    assert n_global == num_processes * n_local, info
    log = lambda *a: print(f"[mh p{process_id}]", *a, file=sys.stderr,
                           flush=True)
    log(f"{n_global} global devices over {num_processes} processes")

    import dataclasses
    from chatterbox_tpu.config import (EngineConfig, MeshConfig,
                                       T3ModelConfig)
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.parallel.sharding import build_mesh
    from chatterbox_tpu.parallel.train import make_train_step
    from chatterbox_tpu.runtime.engine import Request, T3Engine

    cfg = dataclasses.replace(
        T3ModelConfig(), hidden_size=128, n_layers=2, n_heads=8,
        n_kv_heads=8, head_dim=16, intermediate_size=256, text_vocab_size=64,
        speech_vocab_size=80, start_speech_token=72, stop_speech_token=73,
        speaker_embed_size=32, perceiver_n_queries=4, perceiver_n_heads=2,
        cond_len=6)
    model = T3Model(cfg)
    Tt = 8
    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, cfg.speaker_embed_size)),
        jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
        jnp.zeros((1, Tt), jnp.int32), jnp.full((1,), Tt, jnp.int32),
        method=lambda m, *a: m.init_all(*a)))(rng)
    params = jax.tree.map(np.asarray, params)   # identical host copies

    # ---- sharded training step over the FULL global mesh, dp across DCN
    tp = max(1, n_local // 2)
    dp = n_global // tp                      # dcn-major: spans processes
    mesh = build_mesh(MeshConfig(dp=dp, sp=1, tp=tp, dcn_dp=num_processes))
    init_fn, step_fn = make_train_step(model, mesh)
    state = init_fn(params)
    B = max(dp, 2)
    cond = np.zeros((B, cfg.cond_len, cfg.hidden_size), np.float32)
    text = np.zeros((B, Tt), np.int32)
    speech = np.ones((B, 8), np.int32)
    slen = np.full((B,), 8, np.int32)
    state, loss = step_fn(state, cond, text, speech, slen)
    loss = float(loss)
    assert np.isfinite(loss), loss
    log(f"train step over (dp={dp} [dcn x{num_processes}], tp={tp}): "
        f"loss={loss:.4f} OK")

    # ---- serving: sharded engine over a cross-process (dp, tp) mesh,
    # greedy parity vs a local single-device engine
    eng = EngineConfig(max_batch_size=4, max_model_len=96, decode_chunk=4,
                       prefill_buckets=(8, 16), tokens_max=12,
                       kv_dtype="int8")
    rs = np.random.default_rng(0)
    reqs = [Request(
        text_ids=rs.integers(0, cfg.text_vocab_size,
                             size=5 + i).astype(np.int32),
        cond_emb=rs.standard_normal(
            (cfg.cond_len, cfg.hidden_size)).astype(np.float32),
        max_new_tokens=5 + i, temperature=0.0, uid=i) for i in range(6)]
    single = T3Engine(model, jax.tree.map(jnp.asarray, params), cfg, eng,
                      rng=jax.random.PRNGKey(7))
    ref = single.generate(reqs)

    serve_mesh = build_mesh(
        MeshConfig(dp=num_processes, sp=1, tp=tp,
                   dcn_dp=num_processes),
        # tp devices per process: first tp local devices of each process
        [d for p in range(num_processes)
         for d in sorted((dd for dd in jax.devices()
                          if dd.process_index == p), key=lambda x: x.id)[:tp]])
    sharded = T3Engine(model, params, cfg, eng, rng=jax.random.PRNGKey(7),
                       mesh=serve_mesh)
    out = sharded.generate(reqs)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a.tokens, b.tokens)
    log(f"sharded serving (dp={num_processes} across processes, tp={tp}, "
        "int8 KV): greedy tokens == single-device OK")

    # ---- cross-host request routing: only rank 0 HAS the requests; the
    # router broadcasts the wave so every rank feeds the SPMD engine the
    # identical batch (runtime/multihost.py; SURVEY §5.8 "host-side
    # request routing instead of NCCL broadcast")
    from chatterbox_tpu.runtime.multihost import MultiHostRouter
    router = MultiHostRouter(max_batch=8, text_max=16,
                             cond_len=cfg.cond_len,
                             hidden=cfg.hidden_size)
    assert router.is_leader == (process_id == 0)
    wave = router.sync_wave(reqs if router.is_leader else None)
    assert wave is not None and len(wave) == len(reqs)
    out2 = sharded.generate(wave)
    for a, b in zip(ref, out2):
        np.testing.assert_array_equal(a.tokens, b.tokens)
    # empty wave = idle/shutdown signal
    assert router.sync_wave([] if router.is_leader else None) is None
    log("multi-host request router: leader-only ingestion -> identical "
        "SPMD waves -> greedy parity OK")
    print(f"MULTIHOST_OK p{process_id}", flush=True)


def launch(num_processes: int = 2, n_local: int = 4,
           timeout_s: float = 900.0) -> None:
    import socket
    import subprocess
    import time

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(pid), str(num_processes), str(port), str(n_local)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env))
    t0 = time.time()
    outs = []
    for p in procs:
        remaining = max(5.0, timeout_s - (time.time() - t0))
        try:
            out, err = p.communicate(timeout=remaining)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError("multihost dryrun timed out")
        sys.stderr.buffer.write(err)
        outs.append((p.returncode, out.decode()))
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"process {i} rc={rc}"
        assert f"MULTIHOST_OK p{i}" in out, f"process {i}: {out!r}"
    print(f"[dryrun_multihost] {num_processes} processes x {n_local} "
          f"devices: SPMD train + sharded serving greedy parity OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
               int(sys.argv[5]))
    else:
        launch()
