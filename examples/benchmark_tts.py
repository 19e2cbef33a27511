"""End-to-end benchmark CLI (reference benchmark.py): chunk a long text at
sentence boundaries (<=400 chars), synthesize all chunks in one batched
generate, stitch, and report wall-clock timings."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.io import wavfile

from chatterbox_tpu.api.tts import ChatterboxTTS
from chatterbox_tpu.audio.text import split_text_by_sentence


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text-file", default=None)
    ap.add_argument("--max-chars", type=int, default=400)
    ap.add_argument("--max-batch-size", type=int, default=16)
    ap.add_argument("--max-model-len", type=int, default=1000)
    ap.add_argument("--diffusion-steps", type=int, default=10)
    ap.add_argument("--out", default="benchmark-tts.wav")
    args = ap.parse_args()

    if args.text_file:
        text = open(args.text_file, encoding="utf-8").read()
    else:
        text = " ".join(
            f"This is benchmark sentence number {i}, spoken at a steady pace "
            f"to exercise the batched decoding pipeline." for i in range(120))

    chunks = split_text_by_sentence(text, args.max_chars)
    print(f"[BENCHMARK] {len(text)} chars -> {len(chunks)} chunks")

    t0 = time.time()
    ckpt = os.environ.get("CHATTERBOX_CKPT_DIR")
    if ckpt:
        model = ChatterboxTTS.from_local(
            ckpt, max_batch_size=args.max_batch_size,
            max_model_len=args.max_model_len)
    else:
        print("[BENCHMARK] CHATTERBOX_CKPT_DIR unset -> random-weight model")
        import dataclasses
        from chatterbox_tpu.config import ChatterboxConfig, EngineConfig
        cfg = ChatterboxConfig(engine=EngineConfig(
            max_batch_size=args.max_batch_size,
            max_model_len=args.max_model_len))
        model = ChatterboxTTS.from_random(cfg=cfg)
        # dev tokenizer: fall back to reference assets if available
    print(f"[BENCHMARK] model load: {time.time() - t0:.1f}s")

    t0 = time.time()
    wavs = model.generate(chunks, diffusion_steps=args.diffusion_steps)
    gen_time = time.time() - t0
    full = np.concatenate(wavs) if wavs else np.zeros(1, np.float32)
    audio_s = len(full) / model.sr
    print(f"[BENCHMARK] generated {audio_s:.1f}s audio in {gen_time:.1f}s "
          f"-> {audio_s / gen_time:.1f}x realtime")
    wavfile.write(args.out, model.sr,
                  (np.clip(full, -1, 1) * 32767).astype(np.int16))
    print(f"[BENCHMARK] wrote {args.out}")


if __name__ == "__main__":
    main()
