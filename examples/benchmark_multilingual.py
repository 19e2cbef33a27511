"""Multilingual end-to-end benchmark CLI.

Parity target: the reference's benchmark-multilingual-fr.py /
benchmark-multilingual-zh.py — chunk a long non-English text at sentence
boundaries (French <=400 chars, Chinese <=50 chars to respect the tighter
token budget of Cangjie-expanded text), synthesize all chunks in one batched
generate on the multilingual model, stitch, and report wall-clock timings.

Usage:
  CHATTERBOX_CKPT_DIR=... python examples/benchmark_multilingual.py --language fr
  python examples/benchmark_multilingual.py --language zh   # random weights
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.io import wavfile

from chatterbox_tpu.api.tts import ChatterboxTTS
from chatterbox_tpu.audio.text import split_text_by_sentence

FR_TEXT = " ".join(
    f"Voici la phrase numéro {i} de ce test de synthèse vocale, prononcée "
    f"d'une voix posée pour mesurer le débit du pipeline de décodage par "
    f"lots." for i in range(60))

ZH_TEXT = "".join(
    f"这是语音合成基准测试的第{i}句话，用来测量批量解码管线的吞吐量。"
    for i in range(80))

MAX_CHARS = {"fr": 400, "zh": 50}   # reference uses 400 / 50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--language", choices=("fr", "zh"), default="fr")
    ap.add_argument("--text-file", default=None)
    ap.add_argument("--max-batch-size", type=int, default=16)
    ap.add_argument("--max-model-len", type=int, default=1000)
    ap.add_argument("--diffusion-steps", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    lang = args.language
    text = (open(args.text_file, encoding="utf-8").read() if args.text_file
            else (FR_TEXT if lang == "fr" else ZH_TEXT))
    chunks = split_text_by_sentence(text, MAX_CHARS[lang])
    print(f"[BENCHMARK] {lang}: {len(text)} chars -> {len(chunks)} chunks")

    t0 = time.time()
    ckpt = os.environ.get("CHATTERBOX_CKPT_DIR")
    if ckpt:
        model = ChatterboxTTS.from_local(
            ckpt, variant="multilingual",
            max_batch_size=args.max_batch_size,
            max_model_len=args.max_model_len)
    else:
        print("[BENCHMARK] CHATTERBOX_CKPT_DIR unset -> random weights")
        model = ChatterboxTTS.from_random(variant="multilingual")
    print(f"[BENCHMARK] model load: {time.time() - t0:.1f}s")

    t0 = time.time()
    wavs = model.generate(chunks, language_id=lang,
                          diffusion_steps=args.diffusion_steps)
    gen_time = time.time() - t0
    audio = np.concatenate([np.asarray(w) for w in wavs])
    audio_s = len(audio) / model.sr
    print(f"[BENCHMARK] {audio_s:.1f}s audio in {gen_time:.1f}s "
          f"-> {audio_s / gen_time:.1f}x realtime")

    out = args.out or f"benchmark-{lang}.wav"
    wavfile.write(out, model.sr,
                  (np.clip(audio, -1, 1) * 32767).astype(np.int16))
    print(f"[BENCHMARK] wrote {out}")


if __name__ == "__main__":
    main()
