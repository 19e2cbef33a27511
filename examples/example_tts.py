"""Canonical API usage (reference example-tts.py): text -> wav files.

With CHATTERBOX_CKPT_DIR set, loads real weights; otherwise runs the
random-weight dev model (produces noise, exercises the full pipeline)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.io import wavfile

from chatterbox_tpu.api.tts import ChatterboxTTS


def main():
    ckpt = os.environ.get("CHATTERBOX_CKPT_DIR")
    if ckpt:
        model = ChatterboxTTS.from_local(ckpt)
    else:
        print("CHATTERBOX_CKPT_DIR unset -> random-weight dev model")
        model = ChatterboxTTS.from_random()

    prompts = [
        "Hello! This is the TPU-native Chatterbox speaking.",
        "Continuous batching makes short work of long scripts.",
    ]
    wavs = model.generate(prompts, exaggeration=0.5, diffusion_steps=10)
    for i, w in enumerate(wavs):
        wavfile.write(f"example-tts-{i}.wav", model.sr,
                      (np.clip(w, -1, 1) * 32767).astype(np.int16))
        print(f"wrote example-tts-{i}.wav ({len(w) / model.sr:.2f}s)")


if __name__ == "__main__":
    main()
