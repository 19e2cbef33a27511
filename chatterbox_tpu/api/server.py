"""OpenAI-compatible TTS HTTP server (stdlib; no FastAPI dependency).

Parity target: reference openai_tts_server.py — POST /v1/audio/speech with
the same JSON schema (`model`, `input`, `voice`, `response_format`,
`stream`, plus the reference's extension knobs: `exaggeration`,
`temperature`, `diffusion_steps`, `language`, `first_chunk_chars`,
`frame_ms`), WAV / raw-PCM16 output, and a chunked-streaming mode that
splits text for low first-audio latency (:144-217), synthesizes per chunk
and emits fixed-size PCM frames (:438-528).  Startup warmup synthesis
(:533-605) and health endpoint included.

Implementation: ThreadingHTTPServer + chunked transfer encoding.  Synthesis
is serialized through an engine lock (one continuous-batching engine instance
serves all connections; batching happens inside the engine across the
request list of a call — cross-request batching at the HTTP layer is a
round-2 item).
"""
from __future__ import annotations

import io
import json
import os
import re
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterator, List, Optional

import numpy as np

from ..audio.text import detect_language
from ..config import S3GEN_SR


def pcm16_bytes(wav: np.ndarray) -> bytes:
    x = np.clip(wav, -1.0, 1.0)
    return (x * 32767.0).astype("<i2").tobytes()


def wav_bytes(wav: np.ndarray, sr: int = S3GEN_SR) -> bytes:
    """Minimal RIFF/WAVE PCM16 container (reference :117-141)."""
    pcm = pcm16_bytes(wav)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 1, sr,
        sr * 2, 2, 16, b"data", len(pcm))
    return hdr + pcm


# strong phrase punctuation: ASCII + CJK + Arabic (reference :155)
_PHRASE_PUNCT = re.compile(r"([\.!\?;:。！？；，、،؛؟…])")
# boundary punctuation that should attach to the PREVIOUS chunk (ref :233)
_LEADING_PUNCT = re.compile(
    r"^[\s\.,!\?\;:\-—–…\)\]\}"
    r"。！？、，،؛؟]+")
_TRAILING_PUNCT = re.compile(r"[\s\.,!\?\;:\-—–…\)\]\}]+$")
# function words that sound wrong at a chunk join (reference :276-278)
_WEAK_END_WORDS = frozenset(
    "a an the to of in on at and or but for nor so".split())


def split_phrases(text: str, max_chars: int = 120) -> List[str]:
    """Phrase-level chunking for streaming: split on strong punctuation
    (ASCII/CJK/Arabic), greedily pack phrases up to max_chars, then enforce
    max_chars by whitespace or fixed-width slicing (reference
    _split_text_for_low_latency :144-217)."""
    text = text.strip()
    if not text:
        return []
    parts = _PHRASE_PUNCT.split(text)
    phrases, cur = [], ""
    for i in range(0, len(parts), 2):
        seg = parts[i].strip()
        if not seg:
            continue
        punc = parts[i + 1] if i + 1 < len(parts) else ""
        piece = (seg + punc).strip()
        if cur and len(cur) + 1 + len(piece) <= max_chars:
            cur = f"{cur} {piece}"
        elif not cur and len(piece) <= max_chars:
            cur = piece
        else:
            if cur:
                phrases.append(cur)
            cur = piece
    if cur:
        phrases.append(cur)
    if not phrases:
        return [text]

    out: List[str] = []
    for c in phrases:
        if len(c) <= max_chars:
            out.append(c)
            continue
        words = c.split()
        if len(words) <= 1:   # no whitespace (CJK run): fixed-width slices
            out.extend(c[i: i + max_chars] for i in range(0, len(c), max_chars))
            continue
        cur = ""
        for w in words:
            if len(w) > max_chars:
                if cur:
                    out.append(cur)
                    cur = ""
                out.extend(w[i: i + max_chars]
                           for i in range(0, len(w), max_chars))
            elif not cur:
                cur = w
            elif len(cur) + 1 + len(w) <= max_chars:
                cur = f"{cur} {w}"
            else:
                out.append(cur)
                cur = w
        if cur:
            out.append(cur)
    return [c for c in out if c]


def repair_chunk_boundaries(chunks: List[str]) -> List[str]:
    """No chunk may start with punctuation — attach it to the previous chunk
    so the pause lands with the preceding phrase (reference :220-259)."""
    repaired: List[str] = []
    for idx, c in enumerate(chunks):
        if idx == 0:
            repaired.append(c.strip())
            continue
        m = _LEADING_PUNCT.match(c)
        if m:
            lead = m.group(0)
            c = c[len(lead):].lstrip()
            if lead.strip() and repaired:
                repaired[-1] = (repaired[-1].rstrip() + lead).rstrip()
        c = c.strip()
        if c:
            repaired.append(c)
    return [c for c in repaired if c]


def avoid_weak_endings(chunks: List[str]) -> List[str]:
    """Never end a chunk (except the last) on a weak function word — move it
    to the next chunk so it binds with what follows (reference :262-327)."""
    out = list(chunks)
    i = 0
    while i < len(out) - 1:
        cur, nxt = out[i].strip(), out[i + 1].strip()
        if not cur or not nxt:
            i += 1
            continue
        body = _TRAILING_PUNCT.sub("", cur)
        words = body.split()
        if words and words[-1].lower() in _WEAK_END_WORDS:
            idx = body.rfind(words[-1])
            trailing = cur[len(body):]
            new_cur = (body[:idx].rstrip() + trailing).rstrip()
            out[i + 1] = f"{words[-1]} {nxt}".strip()
            if new_cur:
                out[i] = new_cur
                continue              # re-check: weak words can stack
            out[i] = ""
            out[i + 1] = (trailing.strip() + " " + out[i + 1]).strip()
            del out[i]
            continue
        i += 1
    return [c for c in out if c and c.strip()]


def split_for_low_latency(text: str, first_chunk_chars: int = 30,
                          max_chars: int = 120) -> List[str]:
    """Small first chunk for TTFA, larger follow-ups, then prosody repairs
    (reference :473-491: first split at first_chunk_chars, remainder at
    chunk_chars, boundary repair, weak-ending avoidance)."""
    text = text.strip()
    if not text:
        return []
    if first_chunk_chars and first_chunk_chars > 0:
        fchunks = split_phrases(text, max_chars=first_chunk_chars)
        chunks = []
        if fchunks:
            first = fchunks[0]
            chunks.append(first)
            rest = text[len(first):].strip()
            if rest:
                chunks.extend(split_phrases(rest, max_chars=max_chars))
    else:
        chunks = split_phrases(text, max_chars=max_chars)
    return avoid_weak_endings(repair_chunk_boundaries(chunks))


def apply_watermark(wav: np.ndarray, sr: int) -> np.ndarray:
    """No-op watermark hook (parity: reference openai_tts_server.py:342-350
    keeps a disabled perth watermarker slot).  Plug a real watermarker here;
    the server routes every synthesized wav through it.  CONTRACT NOTE: the
    segmented streaming path invokes this per ~2 s vocode segment, so a real
    implementation must be stateless per call (sample-level marking) or be
    given a streaming-capable interface first — frame-stateful watermarkers
    would restart at segment boundaries."""
    return wav


class _Job:
    __slots__ = ("text", "kw", "done", "wav", "error", "t0")

    def __init__(self, text, kw):
        self.text, self.kw = text, kw
        self.done = threading.Event()
        self.wav = None
        self.error = None
        self.t0 = time.time()

    def call_key(self):
        """Jobs sharing this key can run in one engine wave (everything else
        is per-request in the engine/vocoder).  A seeded job runs alone —
        set_seed mutates global engine RNG state."""
        kw = self.kw
        if kw.get("seed") is not None:
            return ("solo", id(self))
        if kw.get("_tokens_only"):
            # T3-only jobs never touch the vocoder — diffusion_steps must
            # not split otherwise-coalescable waves
            return (kw.get("voice_path"), "tokens")
        return (kw.get("voice_path"), kw.get("diffusion_steps", 10), False)


class TTSService:
    """Wraps a ChatterboxTTS session behind a coalescing request queue.

    Concurrent HTTP requests are drained into one ``generate_with_conds``
    call with per-prompt parameter lists, so they share the engine's
    continuous-batching decode waves and the batched vocoder instead of
    serializing on a lock (the reference gets this from vLLM's engine
    concurrency, openai_tts_server.py:661)."""

    def __init__(self, tts, warmup_text: Optional[str] = None,
                 max_coalesce: int = 8):
        import queue as _q
        self.tts = tts
        self.max_coalesce = max_coalesce
        self._q = _q.Queue()
        self.stats = {"requests": 0, "errors": 0, "audio_s": 0.0,
                      "synth_s": 0.0, "batches": 0, "batched_requests": 0,
                      "started_at": time.time()}
        # streaming handlers mutate stats from their own threads
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._worker_loop, daemon=True)
        self._worker.start()
        if warmup_text:
            try:
                t0 = time.time()
                # compile EVERY (alloc level, s_active) decode pair an
                # open-ended request mix can hit — a single warmup request
                # only covers its own shapes, and the first long request
                # would otherwise grow the cache allocation and pay fresh
                # compiles for every smaller window mid-request (advisor
                # r3 finding; the persistent XLA cache makes this a
                # once-per-machine cost)
                eng = getattr(self.tts, "engine", None)
                if eng is not None:
                    eng.precompile(verbose=True)
                print(f"[Server] decode precompile: {time.time() - t0:.1f}s")
                t0 = time.time()
                self.synthesize(warmup_text)
                print(f"[Server] warmup synthesis: {time.time() - t0:.1f}s")
                # warm the COALESCED shapes concurrent clients hit: a
                # 4-wide wave compiles the m<=4 prefill bucket and the
                # 4-batch vocode (measured: 3 concurrent cold streams paid
                # ~75 s of in-run compiles without this)
                if hasattr(self.tts, "generate_with_conds") and \
                        hasattr(self.tts, "get_audio_conditionals"):
                    t0 = time.time()
                    conds = self.tts.get_audio_conditionals(None)
                    self.tts.generate_with_conds(
                        [warmup_text] * 4, conds, vocode=False)
                    self.tts.generate_with_conds([warmup_text] * 4, conds)
                    print(f"[Server] warmup coalesced wave: "
                          f"{time.time() - t0:.1f}s")
                # warm the STREAMING path too (flow_only + segmented-HiFT
                # jits compile separately; the first streamed request
                # otherwise pays 20-40 s of compiles mid-stream).  Repeat
                # the text past one full-size chunk so both the small
                # first-chunk and the 120-char follow-up shapes compile.
                t0 = time.time()
                reps = max(1, -(-150 // max(1, len(warmup_text))))
                for _ in self.stream_pcm_frames(" ".join([warmup_text] * reps)):
                    pass
                print(f"[Server] warmup streaming: {time.time() - t0:.1f}s")
            except Exception as e:  # warmup failure tolerated (ref :602-603)
                print(f"[Server] warmup failed: {e}")

    def synthesize(self, text: str, **kw) -> np.ndarray:
        """Blocking single-text synthesis; internally queued and coalesced
        with whatever else is in flight.  kw: language, exaggeration,
        temperature, diffusion_steps, voice_path, top_p, min_p,
        repetition_penalty, cfg_scale, seed."""
        lang = kw.get("language")
        if lang and hasattr(self.tts, "get_supported_languages") and \
                lang.lower() not in self.tts.get_supported_languages():
            raise ValueError(f"Unsupported language '{lang}'")
        job = _Job(text, kw)
        self._q.put(job)
        job.done.wait()
        if job.error is not None:
            raise job.error
        return job.wav

    def synthesize_tokens(self, text: str, **kw) -> np.ndarray:
        """T3 speech tokens only (no vocode) — queued/coalesced like
        synthesize; the streaming path vocodes them incrementally via
        ChatterboxTTS.vocode_stream."""
        job = _Job(text, dict(kw, _tokens_only=True))
        self._q.put(job)
        job.done.wait()
        if job.error is not None:
            raise job.error
        return job.wav

    # -- worker ---------------------------------------------------------
    def _worker_loop(self):
        import queue as _q
        while True:
            jobs = [self._q.get()]
            while len(jobs) < self.max_coalesce:
                try:
                    jobs.append(self._q.get_nowait())
                except _q.Empty:
                    break
            groups: dict = {}
            for j in jobs:
                groups.setdefault(j.call_key(), []).append(j)
            for grp in groups.values():
                self._run_group(grp)

    def _run_group(self, jobs):
        sr = getattr(self.tts, "sr", 24000)
        try:
            kw0 = jobs[0].kw
            tokens_only = bool(kw0.get("_tokens_only"))
            if kw0.get("seed") is not None:
                self.tts.set_seed(int(kw0["seed"]))
            if hasattr(self.tts, "generate_with_conds"):
                conds = self.tts.get_audio_conditionals(kw0.get("voice_path"))
                per = lambda name, dv: [j.kw.get(name, dv) for j in jobs]
                wavs = self.tts.generate_with_conds(
                    [j.text for j in jobs], conds,
                    language_id=per("language", "en"),
                    exaggeration=per("exaggeration", 0.5),
                    temperature=per("temperature", 0.8),
                    top_p=per("top_p", 1.0), min_p=per("min_p", 0.05),
                    repetition_penalty=per("repetition_penalty", 2.0),
                    cfg_scale=per("cfg_scale", None),
                    diffusion_steps=int(kw0.get("diffusion_steps", 10)),
                    vocode=not tokens_only)
            else:  # minimal tts object (tests / custom backends)
                tokens_only = False
                wavs = self.tts.generate([j.text for j in jobs])
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["batched_requests"] += len(jobs)
            for j, w in zip(jobs, wavs):
                if tokens_only:
                    j.wav = np.asarray(w)          # speech tokens, not audio
                else:
                    j.wav = apply_watermark(np.asarray(w), sr)
                with self._stats_lock:
                    self.stats["requests"] += 1
                    if not tokens_only:
                        self.stats["audio_s"] += len(j.wav) / sr
                    self.stats["synth_s"] += time.time() - j.t0
                j.done.set()
        except Exception as e:
            import sys
            import traceback
            print(f"[Server] synthesis batch failed: {e}", file=sys.stderr)
            traceback.print_exc()
            with self._stats_lock:
                self.stats["errors"] += len(jobs)
            for j in jobs:
                j.error = e
                j.done.set()

    def metrics(self) -> dict:
        with self._stats_lock:
            s = dict(self.stats)
        s["uptime_s"] = round(time.time() - s.pop("started_at"), 1)
        s["realtime_factor"] = round(
            s["audio_s"] / s["synth_s"], 2) if s["synth_s"] else None
        return s

    def stream_pcm_frames(self, text: str, frame_ms: int = 20,
                          first_chunk_chars: int = 30,
                          chunk_chars: int = 120,
                          primer_silence_ms: int = 0,
                          first_chunk_diff_steps: Optional[int] = 5,
                          stream_vocode: bool = True,
                          seg_frames: int = 100,
                          **kw) -> Iterator[bytes]:
        """Chunked PCM16 streaming (reference :438-528): optional primer
        silence so headers/first bytes flush immediately, a small first text
        chunk at reduced diffusion steps for TTFA (default 5 — the
        reference documents 5 as audibly indistinguishable, tts.py:300-303;
        pass first_chunk_diff_steps=None to disable), prosody-repaired
        follow-up chunks, 5 ms tail fade to 0.95 per chunk.

        Two pipeline improvements over the reference's per-chunk
        synchronous design (VERDICT r4 item 4):

        * chunk k+1's synthesis is PREFETCHED on a worker thread while
          chunk k's frames stream out, so inter-chunk gaps collapse;
        * when the backing session supports it, each chunk runs T3 once
          (tokens only) and then vocodes via ChatterboxTTS.vocode_stream —
          flow once + HiFT on ``seg_frames``-frame segments — so a long
          chunk's first audio leaves after one small HiFT call instead of
          after the whole chunk's vocode (``stream_vocode=False`` restores
          the monolithic path)."""
        from concurrent.futures import ThreadPoolExecutor
        frame_len = int(S3GEN_SR * frame_ms / 1000) * 2  # bytes
        fade = int(S3GEN_SR * 0.005)
        can_seg = (stream_vocode
                   and hasattr(self.tts, "vocode_stream")
                   and hasattr(self.tts, "generate_with_conds")
                   and hasattr(self.tts, "get_audio_conditionals"))
        chunks = split_for_low_latency(text, first_chunk_chars, chunk_chars)

        def chunk_kw(idx):
            ckw = dict(kw)
            if idx == 0 and first_chunk_diff_steps is not None:
                ckw["diffusion_steps"] = max(1, int(first_chunk_diff_steps))
            return ckw

        def produce(idx):
            ckw = chunk_kw(idx)
            if can_seg:
                return self.synthesize_tokens(chunks[idx], **ckw)
            return self.synthesize(chunks[idx], **ckw)

        def chunk_pieces(idx, produced):
            """Yield this chunk's audio as one or more float32 pieces with
            the RMS tail trim + 5 ms tail fade applied to the chunk's
            final samples (same post-processing the non-streamed path
            gets from postprocess_wav; hard alignment is inherent — the
            vocoder emits exactly gen_frames*480 samples)."""
            if can_seg:
                from ..audio.postprocess import rms_tail_trim
                ckw = chunk_kw(idx)
                conds = self.tts.get_audio_conditionals(kw.get("voice_path"))
                post = getattr(getattr(self.tts, "cfg", None), "post", None)
                t_voc = time.time()
                # hold back a tail window so the chunk-final RMS trim can
                # run before those samples leave; track the peak frame RMS
                # of emitted audio for the trim's relative threshold
                hold_n = int(S3GEN_SR * 0.8)
                win = max(1, int(S3GEN_SR * (post.rms_window_ms / 1000)
                                 if post is not None else 0.05))
                pending = np.empty(0, np.float32)
                peak = 0.0
                for piece in self.tts.vocode_stream(
                        produced, conds,
                        diffusion_steps=int(ckw.get("diffusion_steps", 10)),
                        seg_frames=seg_frames):
                    piece = apply_watermark(np.asarray(piece, np.float32),
                                            S3GEN_SR)
                    pending = np.concatenate([pending, piece])
                    if len(pending) > hold_n:
                        out, pending = pending[:-hold_n], pending[-hold_n:]
                        nfr = len(out) // win
                        if nfr:
                            fr = out[: nfr * win].reshape(nfr, win)
                            peak = max(peak, float(
                                np.sqrt((fr ** 2).mean(axis=1)).max()))
                        with self._stats_lock:
                            self.stats["audio_s"] += len(out) / S3GEN_SR
                        yield out
                tail = pending
                if post is not None:
                    tail = rms_tail_trim(tail, post, peak=peak)
                tail = tail.copy()
                n = min(fade, len(tail))
                if n:   # 5 ms tail fade (ref :509-518)
                    tail[-n:] *= np.linspace(1.0, 0.95, n, dtype=np.float32)
                with self._stats_lock:
                    self.stats["audio_s"] += len(tail) / S3GEN_SR
                    # tokens-only jobs record only T3 time in _run_group;
                    # add the vocode wall so realtime_factor stays honest
                    self.stats["synth_s"] += time.time() - t_voc
                yield tail
            else:
                wav = produced
                if len(wav) > fade:  # 5 ms tail fade (ref :509-518)
                    wav = wav.copy()
                    wav[-fade:] *= np.linspace(1.0, 0.95, fade,
                                               dtype=np.float32)
                yield wav

        if primer_silence_ms > 0:
            yield pcm16_bytes(
                np.zeros(int(S3GEN_SR * primer_silence_ms / 1000), np.float32))
        ex = ThreadPoolExecutor(max_workers=1)
        try:
            fut = ex.submit(produce, 0)
            for idx in range(len(chunks)):
                produced = fut.result()
                if idx + 1 < len(chunks):     # prefetch the next chunk
                    fut = ex.submit(produce, idx + 1)
                buf = b""
                for piece in chunk_pieces(idx, produced):
                    buf += pcm16_bytes(piece)
                    while len(buf) >= frame_len:
                        yield buf[:frame_len]
                        buf = buf[frame_len:]
                if buf:                        # flush at chunk boundary
                    yield buf
        finally:
            ex.shutdown(wait=False)




# Browser UI with the reference gradio app's knobs (gradio_tts_app.py:26-120:
# text box, exaggeration / temperature / seed / diffusion-steps / min_p /
# top_p / repetition-penalty sliders) served as a static page over the same
# stdlib server — no gradio dependency.
UI_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>chatterbox-tpu</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:720px;margin:2rem auto;padding:0 1rem;background:#111;color:#eee}
 textarea{width:100%;height:7rem;background:#1c1c1c;color:#eee;border:1px solid #444;border-radius:6px;padding:.5rem}
 label{display:flex;justify-content:space-between;margin:.6rem 0 .1rem;font-size:.9rem;color:#bbb}
 input[type=range]{width:100%}
 button{margin-top:1rem;padding:.6rem 2rem;font-size:1rem;border-radius:6px;border:0;background:#4a7dff;color:#fff;cursor:pointer}
 button:disabled{background:#555}
 #status{margin-left:1rem;color:#9a9}
 audio{width:100%;margin-top:1rem}
</style></head><body>
<h2>chatterbox-tpu TTS</h2>
<textarea id="text">Now let's make my mum's favourite. So three mars bars into the pan. Then we add the tuna and just stir for a bit.</textarea>
<div id="sliders"></div>
<label>language <select id="language"><option>en</option><option>fr</option><option>de</option><option>es</option><option>it</option><option>pt</option><option>zh</option><option>ja</option><option>ko</option><option>ru</option><option>ar</option><option>hi</option></select></label>
<button id="go">Generate</button><span id="status"></span>
<audio id="player" controls></audio>
<script>
const S=[["exaggeration",.25,2,.05,.5],["temperature",.05,5,.05,.8],
 ["seed",0,9999,1,0],["diffusion_steps",2,25,1,10],["min_p",0,1,.01,.05],
 ["top_p",0,1,.01,1],["repetition_penalty",1,3,.05,2]];
const box=document.getElementById("sliders");
for(const [n,lo,hi,st,dv] of S){
 box.insertAdjacentHTML("beforeend",
  `<label>${n}<span id="${n}_v">${dv}</span></label>
   <input type="range" id="${n}" min="${lo}" max="${hi}" step="${st}" value="${dv}"
    oninput="document.getElementById('${n}_v').textContent=this.value">`);}
document.getElementById("go").onclick=async()=>{
 const b=document.getElementById("go"),st=document.getElementById("status");
 b.disabled=true;st.textContent="generating\u2026";
 const req={input:document.getElementById("text").value,
  language:document.getElementById("language").value};
 for(const [n] of S) req[n]=parseFloat(document.getElementById(n).value);
 try{
  const t0=performance.now();
  const r=await fetch("/v1/audio/speech",{method:"POST",
   headers:{"Content-Type":"application/json"},body:JSON.stringify(req)});
  if(!r.ok) throw new Error((await r.json()).error||r.status);
  const blob=await r.blob();
  document.getElementById("player").src=URL.createObjectURL(blob);
  document.getElementById("player").play();
  st.textContent=`done in ${((performance.now()-t0)/1000).toFixed(1)}s`;
 }catch(e){st.textContent="error: "+e.message}
 b.disabled=false;};
</script></body></html>"""


def make_handler(service: TTSService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            print(f"[Server] {self.address_string()} {fmt % args}")

        def do_GET(self):
            if self.path in ("/", "/ui"):
                body = UI_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path in ("/metrics", "/v1/metrics"):
                body = json.dumps(service.metrics()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path in ("/health", "/v1/health"):
                body = json.dumps({"status": "ok"}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/v1/audio/speech":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req.get("input", "")
                if not text:
                    raise ValueError("'input' is required")
                fmt = req.get("response_format", "wav")
                stream = bool(req.get("stream", False))
                kw = dict(
                    # explicit language wins; otherwise detect from Unicode
                    # script ranges (reference openai_tts_server.py:355-381)
                    language=req.get("language")
                    or detect_language(text) or "en",
                    exaggeration=float(req.get("exaggeration", 0.5)),
                    temperature=float(req.get("temperature", 0.8)),
                    diffusion_steps=int(req.get("diffusion_steps", 10)),
                    top_p=float(req.get("top_p", 1.0)),
                    min_p=float(req.get("min_p", 0.05)),
                    repetition_penalty=float(
                        req.get("repetition_penalty", 2.0)),
                )
                if req.get("cfg_scale") is not None:
                    kw["cfg_scale"] = float(req["cfg_scale"])
                if req.get("seed") is not None:
                    kw["seed"] = int(req["seed"])
                voice = req.get("voice")
                if voice and voice not in ("alloy", "default") and os.path.isfile(voice):
                    kw["voice_path"] = voice
            except Exception as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return

            headers_sent = False
            try:
                if stream:
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/pcm")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    headers_sent = True
                    stream_kw = {}
                    # only forward knobs the request sets, so
                    # stream_pcm_frames' defaults (e.g. the 5-step first
                    # chunk) stay in charge otherwise
                    if req.get("first_chunk_diff_steps") is not None:
                        stream_kw["first_chunk_diff_steps"] = \
                            int(req["first_chunk_diff_steps"])
                    if req.get("stream_vocode") is not None:
                        stream_kw["stream_vocode"] = \
                            bool(req["stream_vocode"])
                    if req.get("seg_frames") is not None:
                        stream_kw["seg_frames"] = int(req["seg_frames"])
                    for frame in service.stream_pcm_frames(
                            text,
                            frame_ms=int(req.get("frame_ms", 20)),
                            first_chunk_chars=int(req.get("first_chunk_chars", 30)),
                            chunk_chars=int(req.get("chunk_chars", 120)),
                            primer_silence_ms=int(req.get("primer_silence_ms", 0)),
                            **stream_kw, **kw):
                        self.wfile.write(f"{len(frame):x}\r\n".encode())
                        self.wfile.write(frame)
                        self.wfile.write(b"\r\n")
                    self.wfile.write(b"0\r\n\r\n")
                else:
                    wav = service.synthesize(text, **kw)
                    body = (pcm16_bytes(wav) if fmt == "pcm"
                            else wav_bytes(wav))
                    ctype = "audio/pcm" if fmt == "pcm" else "audio/wav"
                    self.send_response(200)
                    self.send_header("Content-Type", ctype)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
            except BrokenPipeError:
                pass
            except ValueError as e:
                # client errors (unsupported language, prompt beyond the
                # engine's capacity — the reference/vLLM rejects
                # > max_model_len the same way) map to 400, not 500
                if not headers_sent:
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(400)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    try:
                        self.wfile.write(b"0\r\n\r\n")
                    except Exception:
                        pass
                    self.close_connection = True
            except Exception as e:
                import sys
                import traceback
                print(f"[Server] request failed: {e}", file=sys.stderr)
                traceback.print_exc()
                if headers_sent:
                    # a 200 + chunked stream is already on the wire; writing
                    # a second status line would corrupt the chunk framing
                    # (the client then parses 'HTTP/1.1 500' as a chunk
                    # size).  Terminate the stream and drop the connection.
                    try:
                        self.wfile.write(b"0\r\n\r\n")
                    except Exception:
                        pass
                    self.close_connection = True
                    return
                try:
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                except Exception:
                    pass

    return Handler


def serve(tts, host: str = "0.0.0.0", port: int = 8000,
          warmup_text: Optional[str] = None):
    # Warmup is ON by default like the reference server (its startup
    # synthesizes a warmup sentence, openai_tts_server.py:533-605) — the
    # first real request otherwise pays every T3/S3Gen compile (minutes on
    # a cold cache).  CHATTERBOX_WARMUP_TEXT overrides the text; set it
    # empty ("") to skip.
    wt = os.environ.get("CHATTERBOX_WARMUP_TEXT")
    if wt is None:
        wt = warmup_text if warmup_text is not None else \
            "Warm up the synthesis pipeline before serving."
    service = TTSService(tts, warmup_text=wt or None)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"[Server] listening on {host}:{port}")
    httpd.serve_forever()


def main():
    from .tts import ChatterboxTTS
    variant = os.environ.get("CHATTERBOX_VARIANT", "english")
    ckpt = os.environ.get("CHATTERBOX_CKPT_DIR")
    if ckpt:
        tts = ChatterboxTTS.from_local(ckpt, variant=variant)
    else:
        print("[Server] CHATTERBOX_CKPT_DIR unset -> random-weight dev model")
        tts = ChatterboxTTS.from_random(variant=variant)
    serve(tts, port=int(os.environ.get("PORT", 8000)))


if __name__ == "__main__":
    main()
