"""Streaming synthesis example: first audio in well under a second.

Two levels of streaming are available:

1. HTTP: POST /v1/audio/speech with {"stream": true} returns chunked
   PCM16 frames (see examples/stream_benchmark_client.py for a client
   that measures TTFA).  The server prefetches each next text chunk's
   synthesis while the current one streams and vocodes incrementally.

2. Library: ChatterboxTTS.vocode_stream — run T3 once for a text chunk,
   then receive wav pieces as each ~2 s HiFT segment finishes instead of
   waiting for the whole utterance (the CFM flow runs once up front;
   reference openai_tts_server.py:438-528 vocodes chunks monolithically).

Usage:  CHATTERBOX_CKPT_DIR=... python examples/example_streaming.py
(or no env for a random-weight dev model)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from chatterbox_tpu.api.tts import ChatterboxTTS

    ckpt = os.environ.get("CHATTERBOX_CKPT_DIR")
    if ckpt:
        tts = ChatterboxTTS.from_local(ckpt)
    else:
        print("CHATTERBOX_CKPT_DIR unset -> random-weight dev model")
        tts = ChatterboxTTS.from_random()

    text = ("Streaming synthesis sends the first seconds of audio while "
            "the rest is still being generated.")
    conds = tts.get_audio_conditionals(None)

    t0 = time.time()
    tokens = tts.generate_with_conds([text], conds, vocode=False)[0]
    print(f"T3: {len(tokens)} speech tokens in {time.time() - t0:.2f}s")

    pieces = []
    for i, piece in enumerate(tts.vocode_stream(tokens, conds,
                                                diffusion_steps=10)):
        pieces.append(piece)
        print(f"  piece {i}: {len(piece) / 24000:.2f}s audio at "
              f"t={time.time() - t0:.2f}s")
    wav = np.concatenate(pieces)
    print(f"total {len(wav) / 24000:.2f}s audio in {time.time() - t0:.2f}s")

    out = os.environ.get("CHATTERBOX_OUT", "streamed.wav")
    from chatterbox_tpu.api.server import wav_bytes
    with open(out, "wb") as f:
        f.write(wav_bytes(wav))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
