"""Quality-parity harness unit tests (tools/eval_quality.py).

The full tiny-model harness run is exercised by
``CHATTERBOX_RUN_SLOW=1 python tools/eval_quality.py --tiny`` (it
synthesizes 4 texts x 5 quant variants, ~minutes on CPU); these tests cover
the metric and gating logic hermetically.
"""
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import eval_quality as eq  # noqa: E402


def test_levenshtein():
    assert eq.levenshtein([], []) == 0
    assert eq.levenshtein([1, 2, 3], [1, 2, 3]) == 0
    assert eq.levenshtein([1, 2, 3], [1, 3]) == 1          # deletion
    assert eq.levenshtein([1, 2], [1, 9, 2]) == 1          # insertion
    assert eq.levenshtein([1, 2, 3], [1, 9, 3]) == 1       # substitution
    assert eq.levenshtein([], [5, 6]) == 2
    assert eq.levenshtein("kitten", "sitting") == 3


def test_check_gates():
    ok = {"variants": {
        "w8": {"speaker_cos": 0.99, "token_wer": 0.01},
        "w8_kv4": {"speaker_cos": 0.91, "token_wer": 0.2},
    }}
    assert eq.check_gates(ok) == []
    bad = {"variants": {
        "w8": {"speaker_cos": 0.80, "token_wer": 0.5},
    }}
    fails = eq.check_gates(bad)
    assert len(fails) == 2
    assert any("speaker_cos" in f for f in fails)
    assert any("token_wer" in f for f in fails)


@pytest.mark.skipif(not os.environ.get("CHATTERBOX_RUN_SLOW"),
                    reason="set CHATTERBOX_RUN_SLOW=1 for the full tiny "
                           "harness run (~minutes)")
def test_tiny_harness_invariance():
    from chatterbox_tpu.api.tts import ChatterboxTTS
    from chatterbox_tpu.config import (ChatterboxConfig, EngineConfig,
                                       S3GenConfig, T3ModelConfig)
    from chatterbox_tpu.models.s3tokenizer.model import S3TokenizerConfig

    cfg = ChatterboxConfig(
        t3=T3ModelConfig.tiny(), s3gen=S3GenConfig.tiny(),
        engine=EngineConfig(max_batch_size=4, max_model_len=128,
                            decode_chunk=4, prefill_buckets=(32, 64),
                            tokens_max=48, deterministic=True))
    base = ChatterboxTTS.from_random(cfg=cfg,
                                     s3tok_cfg=S3TokenizerConfig.tiny())
    report = eq.evaluate(base, texts=eq.TEXTS[:2], diffusion_steps=2,
                         max_tokens=32)
    assert set(report["variants"]) == {"bf16", "w8", "w8a8", "w8_kv8",
                                       "w8_kv4", "streamed_vocode"}
    ref = report["variants"]["bf16"]
    assert ref["speaker_cos"] == 1.0 and ref["token_wer"] == 0.0
    for v in report["variants"].values():
        assert np.isfinite(v["speaker_cos"])
    # same tokens through the segmented vocode: identical duration, high
    # speaker similarity even on random weights (the noise branch differs)
    sv = report["variants"]["streamed_vocode"]
    # streamed output is the raw gen_frames*480; the reference wav may have
    # been tail-trimmed, so the ratio is >= 1 and close to it
    assert 1.0 <= sv["duration_ratio"] < 1.2
    assert sv["t3_token_agreement"] == 1.0
