"""Layer-skip self-draft acceptance probe for speculative multi-token decode.

Speculative decode is the only way to amortize the decode matvec wall into
MXU matmuls (docs/PERF.md roadmap): draft M tokens with the first k trunk
layers, verify all M+1 in one full pass (nearly free — the dense
projections are weight-read-bound, so M extra rows cost ~nothing).  Whether
it WINS depends entirely on the draft's acceptance rate, which cannot be
guessed: an untrained layer-skip draft of a 30-layer 520M speech-token LM
may agree with the full model 90% of the time or 5%.

This tool measures it.  Given the REAL t3 checkpoint (CHATTERBOX_CKPT_DIR
or argv[1]), it:
  1. generates greedy trajectories with the full engine (deterministic);
  2. teacher-forces each trajectory through the trunk at full depth and at
     draft depths k, under the same CFG combine;
  3. reports per-depth argmax agreement = greedy acceptance rate, and the
     projected end-to-end speedup for M in 1..4 under the measured decode
     cost model (docs/PERF.md: step ~= 5.3 ms fixed [~3.4 ms dense] +
     6.9 us x s_active; draft step ~= (k/30) of that; verify ~= 1 step).

Decision rule (PERF.md "Speculative decode" section): build the engine
integration only if some (k, M) projects >1.15x — below that the added
pipeline complexity is not worth it (cf. the measured dispatch-batching and
Pallas dead ends).

Without a checkpoint it runs on random weights to exercise the mechanics;
the acceptance number is then meaningless (prints a warning).
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Speech synthesis turns written language into audible speech.",
    "It was a bright cold day in April, and the clocks were striking "
    "thirteen.",
    "Performance engineering is the art of removing work.",
]

DEPTHS = (6, 10, 15, 20)


def seq_cfg_argmax(model, params, cond_emb, text_ids, speech, cfg_scale=0.5):
    """Teacher-forced CFG argmax at every speech position (B=1, no padding).

    cond_emb [34, H]; text_ids [Tt]; speech [Ts].  Position i's logits
    (sequence index P-1+i) predict speech[i]; returns argmax [Ts]."""
    from chatterbox_tpu.runtime.engine import nn_apply

    cond_emb = jnp.asarray(cond_emb)[None]
    text_ids = jnp.asarray(text_ids, jnp.int32)[None]
    speech = jnp.asarray(speech, jnp.int32)[None]
    tlen = jnp.full((1,), text_ids.shape[1], jnp.int32)

    def fn(m):
        embeds, prompt_len = m.build_prompt_embeds(cond_emb, text_ids, tlen)
        Ts = speech.shape[1]
        sp_e = m.speech_emb(speech) + m.speech_pos_emb(
            jnp.arange(1, Ts + 1))[None]
        sp2 = jnp.repeat(sp_e[:, None], 2, axis=1)          # same both lanes
        x = jnp.concatenate([embeds.astype(sp2.dtype), sp2], axis=2)
        B, _, T, H = x.shape
        xf = x.reshape(B * 2, T, H)
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B * 2, T))
        lens = jnp.full((B * 2,), T, jnp.int32)
        hidden, _ = m.backbone(xf, positions, lens, mode="block")
        P = embeds.shape[2]
        h = hidden.reshape(B, 2, T, -1)[:, :, P - 1: P - 1 + Ts]
        logits = m.speech_head(h).astype(jnp.float32)       # [B, 2, Ts, V]
        cond, unc = logits[:, 0], logits[:, 1]
        mixed = cond + cfg_scale * (cond - unc)
        # same invalid-id mask as the engine (codes + EOS sampleable only)
        V = mixed.shape[-1]
        ar = jnp.arange(V)
        allow = (ar < m.cfg.start_speech_token) | \
            (ar == m.cfg.stop_speech_token)
        mixed = jnp.where(allow[None, None, :], mixed, -jnp.inf)
        return jnp.argmax(mixed, axis=-1)[0]                # [Ts]

    return np.asarray(nn_apply(model, params, fn))


def truncate_params(params, k):
    """First-k-layers param tree for a draft trunk (scan leaves are [L,...])."""
    out = jax.tree.map(lambda x: x, params)
    layers = out["params"]["backbone"]["layers"]

    def cut(tree):
        return jax.tree.map(lambda x: x[:k], tree)

    out["params"]["backbone"]["layers"] = cut(layers)
    return out


def main():
    from chatterbox_tpu.config import EngineConfig, T3ModelConfig
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.runtime.engine import Request, T3Engine

    ckpt = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("CHATTERBOX_CKPT_DIR")
    if not ckpt or os.environ.get("CHATTERBOX_CPU"):
        # this environment's sitecustomize force-selects the axon TPU
        # platform regardless of JAX_PLATFORMS; the no-checkpoint mechanics
        # run must work off-chip (cf. tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    cfg = T3ModelConfig()

    if ckpt:
        from pathlib import Path

        from chatterbox_tpu.api.tts import ChatterboxTTS
        tts = ChatterboxTTS.from_local(Path(ckpt))
        tok = tts.tokenizer
        conds = tts.default_conds
        cond_emb = np.asarray(conds.cond_emb, np.float32)
        # from_local does not quantize (quant_weights defaults off), but
        # the teacher-forced pass wants a float tree either way; re-convert
        # below if the attr is absent
        fparams = tts._t3_params_float if hasattr(tts, "_t3_params_float") \
            else None
        engine = tts.engine
        model = tts.engine.model
        text_ids = [np.asarray(tok.text_to_tokens(
            "[START]" + t + "[STOP]"), np.int32) for t in TEXTS]
        if fparams is None:
            # re-convert float params for the teacher-forced pass
            from chatterbox_tpu.models.t3.weights import (convert_t3_params,
                                                          load_safetensors)
            name = "t3_cfg.safetensors"
            fparams = convert_t3_params(
                load_safetensors(Path(ckpt) / name), cfg)
    else:
        print("WARNING: no checkpoint (CHATTERBOX_CKPT_DIR) — tiny random "
              "model; acceptance numbers are MEANINGLESS, tool-mechanics "
              "run only.", file=sys.stderr)
        cfg = T3ModelConfig.tiny()
        global DEPTHS
        DEPTHS = tuple(sorted({k for k in (1, 2, cfg.n_layers - 1)
                               if 0 < k < cfg.n_layers}))
        rng = jax.random.PRNGKey(0)
        model = T3Model(cfg)
        fparams = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, cfg.speaker_embed_size)),
            jnp.zeros((1, 4), jnp.int32), 0.5 * jnp.ones((1, 1)),
            jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
            method=lambda m, *a: m.init_all(*a)))(rng)
        eng = EngineConfig(max_batch_size=4, max_model_len=96,
                           decode_chunk=4, prefill_buckets=(8, 16),
                           tokens_max=32, kv_dtype="float32")
        engine = T3Engine(model, fparams, cfg, eng,
                          rng=jax.random.PRNGKey(1))
        cond_emb = np.zeros((cfg.cond_len, cfg.hidden_size), np.float32)
        rs = np.random.default_rng(0)
        text_ids = [rs.integers(0, cfg.text_vocab_size, (12,)).astype(np.int32)
                    for _ in TEXTS]

    # --- 1. greedy trajectories ------------------------------------------
    max_new = 120 if ckpt else 24
    reqs = [Request(text_ids=t, cond_emb=cond_emb, max_new_tokens=max_new,
                    temperature=0.0, top_p=1.0, min_p=0.0,
                    repetition_penalty=1.0, cfg_scale=0.5, uid=i)
            for i, t in enumerate(text_ids)]
    results = engine.generate(reqs)
    trajs = []
    for r, t in zip(results, text_ids):
        toks = np.asarray(r.tokens, np.int64)
        if len(toks) >= 8:
            trajs.append((t, toks))
    if not trajs:
        print("no trajectories long enough; aborting", file=sys.stderr)
        return
    print(f"{len(trajs)} trajectories, lengths "
          f"{[len(s) for _, s in trajs]}", file=sys.stderr)

    # --- 2. teacher-forced agreement per depth ---------------------------
    full = [seq_cfg_argmax(model, fparams, cond_emb, t, s)
            for t, s in trajs]
    # sanity: the argmax slice starts at the SOS position, so full[i]
    # re-predicts trajectory token i; full-depth agreement should be ~1.0
    # (up to quantized-engine vs float-trunk drift)
    selfagree = np.mean([np.mean(f == s)
                         for f, (_, s) in zip(full, trajs)])
    print(f"full-depth self-consistency vs engine trajectory: "
          f"{selfagree:.3f} (quantized-engine vs float-trunk drift)",
          file=sys.stderr)

    if ckpt:
        print(f"{'k':>4} {'accept':>8} " +
              " ".join(f"M={m:<2}" for m in (1, 2, 3, 4)), file=sys.stderr)
    else:
        # random-weights run: acceptance is meaningless, and the projected
        # speedup columns were misreadable as real (ADVICE r2) — print the
        # acceptance only, clearly labeled mechanics-check
        print(f"{'k':>4} {'accept':>8}  (mechanics check — projections "
              "suppressed without a checkpoint)", file=sys.stderr)
    for k in DEPTHS:
        dmodel = T3Model(dataclasses.replace(cfg, n_layers=k))
        dparams = truncate_params(fparams, k)
        draft = [seq_cfg_argmax(dmodel, dparams, cond_emb, t, s)
                 for t, s in trajs]
        acc = float(np.mean([np.mean(d == f)
                             for d, f in zip(draft, full)]))
        if not ckpt:
            print(f"{k:>4} {acc:>8.3f}", file=sys.stderr)
            continue
        # projected speedup: E[tokens/cycle] / cycle cost in full-step units
        # (PERF.md cost model at s_active=384: step = 5.3 fixed + 2.65 attn;
        # draft step = (k/n_layers)·step; verify(M+1 rows) ≈ 1 step)
        step = 5.3 + 2.65
        proj = []
        for M in (1, 2, 3, 4):
            e_tok = (1 - acc ** (M + 1)) / (1 - acc) if acc < 1 else M + 1
            cost = (M * (k / float(cfg.n_layers)) * step + step) / step
            proj.append(e_tok / cost)
        print(f"{k:>4} {acc:>8.3f} " +
              " ".join(f"{p:5.2f}" for p in proj), file=sys.stderr)


if __name__ == "__main__":
    main()
