"""Quality-parity evaluation harness: quantization Δ vs the float path.

The north star gates on "output audio matches reference WER /
speaker-similarity within the stated Δ at the same bit-width"
(BASELINE.json).  The reference establishes quality by ear
(/root/reference/README.md:33 + docs/audio-sample mp3s); this harness makes
the comparison mechanical:

  * synthesize a fixed text set DETERMINISTICALLY (greedy T3 + the fixed
    CFM noise buffer, reference flow_matching.py:198-228) under each quant
    variant: bf16 reference, w8 (int8 weight-only trunk), w8a8, w8+int8 KV,
    w8+int4 KV;
  * per variant, compute vs the bf16 reference:
      - speaker-similarity: cosine between CAMPPlus x-vector embeddings of
        the output audio (the same in-repo model S3Gen conditions on,
        models/s3gen/xvector.py — reference xvector.py:340-428);
      - token-WER proxy: re-tokenize the output audio with the in-repo S3
        speech tokenizer and compute normalized Levenshtein distance over
        the discrete speech tokens (an intelligibility proxy that needs no
        external ASR checkpoint — the S3 codes are what the TTS itself
        treats as the transcript-bearing representation);
      - T3 token agreement: exact prefix/stream agreement of the generated
        speech-token ids (greedy decode, so any divergence is pure
        numerics);
      - duration ratio.
  * optional TRUE WER: set CHATTERBOX_ASR_DIR to a local HF CTC ASR
    checkpoint dir (e.g. wav2vec2) and the harness transcribes both wavs
    with `transformers` and reports word-level WER (zero-egress
    environments skip this automatically).

Thresholds (the "stated Δ" this repo publishes; checked when --gate):
    w8 / w8+int8 KV:  speaker_cos >= 0.95, token_wer <= 0.15,
                      asr WER Δ <= 0.03 (when ASR available)
    w8a8 / w8+int4:   speaker_cos >= 0.90, token_wer <= 0.25

On random weights (no CHATTERBOX_CKPT_DIR) the harness still runs as an
invariance smoke: the variants share identical underlying float weights, so
large deltas flag a quantization-path bug even without real checkpoints.

Usage:
    python tools/eval_quality.py [--tiny] [--gate] [--out report.json]
    CHATTERBOX_CKPT_DIR=... python tools/eval_quality.py --gate
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Quantization must not change what the listener hears.",
    "Numbers like nineteen eighty four still matter today.",
    "A short one.",
]

THRESHOLDS = {
    "w8":     {"speaker_cos": 0.95, "token_wer": 0.15},
    "w8_kv8": {"speaker_cos": 0.95, "token_wer": 0.15},
    "w8a8":   {"speaker_cos": 0.90, "token_wer": 0.25},
    "w8_kv4": {"speaker_cos": 0.90, "token_wer": 0.25},
    # segmented streaming vocode (ChatterboxTTS.vocode_stream) vs the fused
    # vocode on IDENTICAL bf16 tokens — only the NSF noise restart at
    # segment boundaries + crossfades may differ, so the gate is tight
    "streamed_vocode": {"speaker_cos": 0.95, "token_wer": 0.15},
}


def levenshtein(a, b) -> int:
    """Edit distance over two token sequences (numpy DP, O(len(a)*len(b)))."""
    a, b = list(a), list(b)
    if not a:
        return len(b)
    prev = np.arange(len(b) + 1)
    for i, x in enumerate(a, 1):
        cur = np.empty(len(b) + 1, np.int64)
        cur[0] = i
        for j, y in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (x != y))
        prev = cur
    return int(prev[-1])


def _variant_engine_cfg(base_eng, kv_dtype: str):
    return dataclasses.replace(base_eng, kv_dtype=kv_dtype,
                               deterministic=True)


def build_variants(base_tts):
    """(name, ChatterboxTTS) list sharing the base's float weights and all
    non-T3 components; T3 trunk re-quantized per variant."""
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.models.t3.model import T3Model
    from chatterbox_tpu.ops.quant import quantize_t3_params

    cfg = base_tts.cfg
    fp_params = jax.tree.map(np.asarray, base_tts.t3_params)
    q_params = quantize_t3_params(fp_params)
    q_params = jax.tree.map(jnp.asarray, q_params)

    variants = []

    def mk(name, t3_over, kv_dtype, params):
        t3c = dataclasses.replace(cfg.t3, **t3_over)
        c = dataclasses.replace(cfg, t3=t3c,
                                engine=_variant_engine_cfg(cfg.engine,
                                                           kv_dtype))
        tts = ChatterboxTTS(
            c, T3Model(t3c), params, base_tts.s3gen, base_tts.s3gen_params,
            base_tts.campplus, base_tts.campplus_params, base_tts.ve,
            base_tts.ve_params, base_tts.s3tok, base_tts.s3tok_params,
            base_tts.tokenizer, base_tts.default_conds, base_tts.variant)
        variants.append((name, tts))

    mk("bf16", {}, "bfloat16", base_tts.t3_params)
    mk("w8", {"quant_weights": True}, "bfloat16", q_params)
    mk("w8a8", {"quant_weights": True, "quant_act": True}, "bfloat16",
       q_params)
    mk("w8_kv8", {"quant_weights": True}, "int8", q_params)
    mk("w8_kv4", {"quant_weights": True}, "int4", q_params)
    return variants


def speaker_embed(tts, wav24: np.ndarray) -> np.ndarray:
    """CAMPPlus x-vector of a 24 kHz wav (mirrors conditionals_from_wav)."""
    import jax
    import jax.numpy as jnp
    from chatterbox_tpu.audio import dsp
    from chatterbox_tpu.config import S3GEN_SR, S3_SR

    wav16 = dsp.resample(np.asarray(wav24, np.float32), S3GEN_SR, S3_SR)
    if len(wav16) < 4000:                     # pad ultra-short outputs
        wav16 = np.pad(wav16, (0, 4000 - len(wav16)))
    fbank = dsp.kaldi_fbank(wav16)
    fbank = fbank - fbank.mean(axis=0, keepdims=True)
    emb = jax.jit(lambda p, f: tts.campplus.apply(p, f))(
        tts.campplus_params, jnp.asarray(fbank[None]))
    return np.asarray(emb[0], np.float32)


def s3_tokens_of_wav(tts, wav24: np.ndarray) -> np.ndarray:
    from chatterbox_tpu.audio import dsp
    from chatterbox_tpu.config import S3GEN_SR, S3_SR

    wav16 = dsp.resample(np.asarray(wav24, np.float32), S3GEN_SR, S3_SR)
    if len(wav16) < 4000:
        wav16 = np.pad(wav16, (0, 4000 - len(wav16)))
    return tts.s3_tokenize(wav16)


def asr_transcribe(wavs24):
    """Optional true-WER leg: local CTC checkpoint via transformers
    (CHATTERBOX_ASR_DIR); returns None when unavailable (zero egress)."""
    asr_dir = os.environ.get("CHATTERBOX_ASR_DIR")
    if not asr_dir or not os.path.isdir(asr_dir):
        return None
    try:
        import torch
        from transformers import AutoModelForCTC, AutoProcessor
        from chatterbox_tpu.audio import dsp
        from chatterbox_tpu.config import S3GEN_SR

        proc = AutoProcessor.from_pretrained(asr_dir)
        model = AutoModelForCTC.from_pretrained(asr_dir)
        outs = []
        for w in wavs24:
            w16 = dsp.resample(np.asarray(w, np.float32), S3GEN_SR, 16_000)
            inp = proc(w16, sampling_rate=16_000, return_tensors="pt")
            with torch.no_grad():
                logits = model(**inp).logits
            ids = logits.argmax(-1)[0]
            outs.append(proc.decode(ids).lower().split())
        return outs
    except Exception as e:                     # noqa: BLE001
        print(f"[eval] ASR leg unavailable: {e}", file=sys.stderr)
        return None


def evaluate(base_tts, texts=TEXTS, diffusion_steps: int = 5,
             max_tokens: int = 200) -> dict:
    report = {"texts": texts, "variants": {}}
    outputs = {}
    for name, tts in build_variants(base_tts):
        wavs, toks = tts.generate_with_conds(
            texts, tts.default_conds, diffusion_steps=diffusion_steps,
            max_tokens=max_tokens, return_tokens=True)
        outputs[name] = (wavs, toks)
        print(f"[eval] {name}: {[len(w) for w in wavs]} samples",
              file=sys.stderr)

    ref_wavs, ref_toks = outputs["bf16"]
    ref_embs = [speaker_embed(base_tts, w) for w in ref_wavs]
    ref_s3 = [s3_tokens_of_wav(base_tts, w) for w in ref_wavs]
    ref_asr = asr_transcribe(ref_wavs)

    # streamed-vocode leg: the SAME bf16 token streams through
    # vocode_stream (flow once + segmented HiFT with crossfades) — bounds
    # the perceptual cost of the streaming path the moment real
    # checkpoints exist (the segment noise restart is the only delta)
    stream_wavs = []
    for t in ref_toks:
        pieces = list(base_tts.vocode_stream(
            np.asarray(t, np.int32), base_tts.default_conds,
            diffusion_steps=diffusion_steps))
        stream_wavs.append(np.concatenate(pieces) if pieces
                           else np.zeros(1, np.float32))
    outputs["streamed_vocode"] = (stream_wavs, ref_toks)
    print(f"[eval] streamed_vocode: {[len(w) for w in stream_wavs]} samples",
          file=sys.stderr)

    for name, (wavs, toks) in outputs.items():
        embs = [speaker_embed(base_tts, w) for w in wavs]
        s3 = [s3_tokens_of_wav(base_tts, w) for w in wavs]
        cos = [float(np.dot(a, b) /
                     (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
               for a, b in zip(ref_embs, embs)]
        twer = [levenshtein(a, b) / max(1, len(a))
                for a, b in zip(ref_s3, s3)]
        t3_agree = [float(np.mean(np.asarray(a[:min(len(a), len(b))]) ==
                                  np.asarray(b[:min(len(a), len(b))])))
                    if min(len(a), len(b)) else 1.0
                    for a, b in zip(ref_toks, toks)]
        dur = [len(b) / max(1, len(a))
               for a, b in zip(ref_wavs, wavs)]
        entry = {
            "speaker_cos": round(float(np.mean(cos)), 4),
            "speaker_cos_min": round(float(np.min(cos)), 4),
            "token_wer": round(float(np.mean(twer)), 4),
            "t3_token_agreement": round(float(np.mean(t3_agree)), 4),
            "duration_ratio": round(float(np.mean(dur)), 4),
        }
        if ref_asr is not None:
            hyp = asr_transcribe(wavs)
            wers = [levenshtein(r, h) / max(1, len(r))
                    for r, h in zip(ref_asr, hyp)]
            entry["asr_wer_vs_bf16"] = round(float(np.mean(wers)), 4)
        report["variants"][name] = entry
    return report


def check_gates(report: dict) -> list:
    fails = []
    for name, th in THRESHOLDS.items():
        got = report["variants"].get(name)
        if not got:
            continue
        if got["speaker_cos"] < th["speaker_cos"]:
            fails.append(f"{name}: speaker_cos {got['speaker_cos']} "
                         f"< {th['speaker_cos']}")
        if got["token_wer"] > th["token_wer"]:
            fails.append(f"{name}: token_wer {got['token_wer']} "
                         f"> {th['token_wer']}")
    return fails


def main():
    tiny = "--tiny" in sys.argv
    gate = "--gate" in sys.argv
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    from chatterbox_tpu.api.tts import ChatterboxTTS
    ckpt = os.environ.get("CHATTERBOX_CKPT_DIR")
    if ckpt and os.path.isdir(ckpt):
        base = ChatterboxTTS.from_local(ckpt, deterministic=True,
                                        max_batch_size=4,
                                        max_model_len=640)
        report_src = "real checkpoints"
    else:
        from chatterbox_tpu.config import (ChatterboxConfig, EngineConfig,
                                           S3GenConfig, T3ModelConfig)
        if tiny:
            from chatterbox_tpu.models.s3tokenizer.model import \
                S3TokenizerConfig
            cfg = ChatterboxConfig(
                t3=T3ModelConfig.tiny(), s3gen=S3GenConfig.tiny(),
                engine=EngineConfig(max_batch_size=4, max_model_len=128,
                                    decode_chunk=4, prefill_buckets=(32, 64),
                                    tokens_max=48, deterministic=True))
            base = ChatterboxTTS.from_random(
                cfg=cfg, s3tok_cfg=S3TokenizerConfig.tiny())
        else:
            from chatterbox_tpu.config import ChatterboxConfig
            cfg = ChatterboxConfig(
                engine=EngineConfig(max_batch_size=4, max_model_len=640,
                                    deterministic=True))
            base = ChatterboxTTS.from_random(cfg=cfg)
        report_src = "random weights (invariance smoke)"

    report = evaluate(base, max_tokens=48 if tiny else 200,
                      diffusion_steps=2 if tiny else 5)
    report["source"] = report_src
    fails = check_gates(report)
    report["gate_failures"] = fails
    txt = json.dumps(report, indent=1)
    print(txt)
    if out:
        with open(out, "w") as f:
            f.write(txt)
    if gate and fails and ckpt:
        # gates are binding only on real checkpoints; random-weight runs
        # report but do not fail (numerics without trained structure)
        sys.exit(1)


if __name__ == "__main__":
    main()
