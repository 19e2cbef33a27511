"""Streaming TTS benchmark client (reference stream_tts_benchmark.py):
measures time-to-headers, time-to-first-audio and steady throughput against
the OpenAI-compatible server using stdlib http.client."""
import argparse
import http.client
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--text", default="Hello there! This is a streaming "
                    "latency benchmark for the TPU-native Chatterbox server. "
                    "It measures how quickly the first audio frame arrives "
                    "and the sustained audio throughput afterwards.")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    ok = 0
    for run in range(args.runs):
        conn = http.client.HTTPConnection(args.host, args.port, timeout=600)
        body = json.dumps({"model": "chatterbox", "input": args.text,
                           "stream": True, "response_format": "pcm"})
        t0 = time.time()
        try:
            conn.request("POST", "/v1/audio/speech", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            t_headers = time.time() - t0
            if resp.status != 200:
                print(f"run {run}: HTTP {resp.status}: "
                      f"{resp.read(500)!r}")
                continue
            first_audio = None
            total = 0
            while True:
                chunk = resp.read(4096)
                if not chunk:
                    break
                if first_audio is None and len(chunk) > 0:
                    first_audio = time.time() - t0
                total += len(chunk)
            t_done = time.time() - t0
            if first_audio is None or total == 0:
                print(f"run {run}: stream ended with no audio "
                      f"(server-side synthesis failure?)")
                continue
            audio_s = total / 2 / 24000
            print(f"run {run}: headers {t_headers * 1000:.0f}ms, "
                  f"TTFA {first_audio * 1000:.0f}ms, "
                  f"{audio_s:.1f}s audio in {t_done:.1f}s "
                  f"({audio_s / t_done:.2f}x RT)")
            ok += 1
        except Exception as e:
            print(f"run {run}: FAILED {type(e).__name__}: {e}")
        finally:
            conn.close()
    print(f"{ok}/{args.runs} runs succeeded")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
