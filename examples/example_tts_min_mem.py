"""Conditional-reuse workflow (reference example-tts-min-vram.py): compute a
voice's conditionals once, save them to disk, and synthesize later runs from
the saved file — no voice-encoder / S3 tokenizer / CAMPPlus work per request,
and no reference wav needed at serving time."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy.io import wavfile

from chatterbox_tpu.api.tts import ChatterboxTTS
from chatterbox_tpu.utils.checkpoint import (load_conditionals,
                                             save_conditionals)


def main():
    ckpt = os.environ.get("CHATTERBOX_CKPT_DIR")
    model = (ChatterboxTTS.from_local(ckpt) if ckpt
             else ChatterboxTTS.from_random())

    conds_path = "voice-conds.npz"
    voice_wav = os.environ.get("CHATTERBOX_VOICE_WAV")
    if os.path.exists(conds_path):
        print(f"loading cached conditionals from {conds_path}")
        conds = load_conditionals(conds_path)
    else:
        # one-time conditioning pass (reference tts.py:215-247)
        conds = model.get_audio_conditionals(voice_wav)
        save_conditionals(conds_path, conds)
        print(f"saved conditionals to {conds_path}")

    wavs = model.generate_with_conds(
        ["Synthesis from pre-computed conditionals.",
         "The reference audio is no longer needed."],
        conds, exaggeration=0.6, diffusion_steps=10)
    for i, w in enumerate(wavs):
        wavfile.write(f"example-min-mem-{i}.wav", model.sr,
                      (np.clip(np.asarray(w), -1, 1) * 32767).astype(np.int16))
        print(f"wrote example-min-mem-{i}.wav "
              f"({len(w) / model.sr:.2f}s @ {model.sr} Hz)")


if __name__ == "__main__":
    main()
