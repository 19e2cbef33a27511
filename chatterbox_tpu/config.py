"""Typed configuration tree for the TPU-native Chatterbox engine.

Replaces the reference's ad-hoc env-var sprawl (reference: tts.py:337-343,
372-377, 501-502, 544; t3.py:343) with one dataclass tree.  The same
``CHATTERBOX_*`` env knob names are honoured as *overrides* for parity testing
(see :func:`apply_env_overrides`).
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional


# ---------------------------------------------------------------------------
# Pipeline rate constants (reference: models/s3tokenizer/s3tokenizer.py:14-19,
# models/s3gen/const.py:1, models/s3gen/utils/mel.py:33)
# ---------------------------------------------------------------------------
S3_SR = 16_000          # sample rate into the speech tokenizer
S3_HOP = 160            # 100 mel frames / sec at 16 kHz
S3_TOKEN_RATE = 25      # speech tokens / sec
S3GEN_SR = 24_000       # output sample rate
MEL_FRAME_RATE = 50     # 24 kHz mel frames / sec (hop 480)
SPEECH_VOCAB_SIZE = 6561  # 3**8 (FSQ); SOS/EOS live above this


@dataclass(frozen=True)
class T3ModelConfig:
    """T3 speech-token LM hyperparameters.

    Mirrors the reference T3Config (t3/modules/t3_config.py:1-35) plus the
    Llama_520M backbone dims from t3-model/config.json (hidden size stored
    there is doubled to 2048 for the reference's CFG hack; here it is the true
    per-stream width, 1024).
    """
    text_vocab_size: int = 704              # 2454 for multilingual
    speech_vocab_size: int = 8194           # 6561 codes + SOS 6561 + EOS 6562 + pad
    start_text_token: int = 255
    stop_text_token: int = 0
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    max_text_tokens: int = 2048
    max_speech_tokens: int = 4096
    speech_cond_prompt_len: int = 150
    cond_len: int = 34                      # 1 speaker + 32 perceiver + 1 emotion

    # Llama backbone (t3-model/config.json)
    hidden_size: int = 1024
    n_layers: int = 30
    n_heads: int = 16
    n_kv_heads: int = 16
    head_dim: int = 64
    intermediate_size: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500_000.0
    # llama3 rope scaling
    rope_scaling_factor: float = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 8192

    # Conditioning encoder
    speaker_embed_size: int = 256
    perceiver_n_queries: int = 32
    perceiver_n_heads: int = 4
    emotion_adv: bool = True

    # INT8 weight-only trunk (ops/quant.py); halves the dominant per-step
    # HBM weight read during decode
    quant_weights: bool = False
    # W8A8: additionally quantize trunk-dense activations per row and run
    # the projections as int8 x int8 -> int32 on the MXU (skips the
    # int8->bf16 weight convert; needs quant_weights)
    quant_act: bool = False
    # (A `fused_decode` Pallas decode-attention path existed through round
    # 3; removed as a documented negative result — two kernel designs both
    # lost 3-4x to XLA's packed-heads einsum fusions, docs/PERF.md.)

    # Decode-attention implementation for the packed int8 frozen cache:
    # "xla" = block-diagonal einsum over the full s_active window (masked),
    # "ragged" = Pallas kernel that physically skips S-blocks beyond each
    # lane's frozen_len (ops/ragged_decode.py; requires int8 KV, Hq ==
    # Hkv, align_enabled off, falls back to "xla" otherwise).  MEASURED
    # NEGATIVE on v5e: Pallas HBM streaming caps at ~0.6x of XLA's
    # effective bandwidth (pure-copy probe), so skipping cannot pay at
    # realistic fills — docs/PERF.md "round 5 ragged".  Kept for
    # platforms/toolchains where that ceiling lifts.
    decode_kernel: str = "xla"

    # Alignment stream (original Chatterbox safeguard the reference drops,
    # reference README.md:99): expose head-mean attention of one mid layer
    # over the frozen prefix during decode so the engine can track text
    # alignment and stop hallucinated tails / suppress premature EOS.
    align_enabled: bool = False
    align_layer: int = 9            # original alignment_stream_analyzer layer

    @property
    def is_multilingual(self) -> bool:
        return self.text_vocab_size == 2454

    @classmethod
    def multilingual(cls) -> "T3ModelConfig":
        # align_enabled: the multilingual checkpoint is the one missing the
        # original Chatterbox EOS safeguard (reference README.md:99) — the
        # engine's alignment-stream stopping stands in for it (see
        # EngineConfig.align_stop, flipped on by api.tts.from_local for this
        # variant; evaluation note in docs/PERF.md)
        return dataclasses.replace(cls(), text_vocab_size=2454,
                                   align_enabled=True)

    @classmethod
    def tiny(cls) -> "T3ModelConfig":
        """Small config for CPU unit tests."""
        return dataclasses.replace(
            cls(), hidden_size=64, n_layers=2, n_heads=4, n_kv_heads=4,
            head_dim=16, intermediate_size=128, text_vocab_size=32,
            speech_vocab_size=70, start_speech_token=64, stop_speech_token=65,
            speaker_embed_size=16, perceiver_n_queries=4, perceiver_n_heads=2,
            cond_len=6,  # 1 speaker + 4 queries + 1 emotion
        )


@dataclass(frozen=True)
class S3GenConfig:
    """S3Gen (token -> mel -> wav) hyperparameters.

    Mirrors the reference module wiring in s3gen/s3gen.py:59-100 and
    hifigan/flow defaults.
    """
    speech_vocab_size: int = 6561
    token_frame_rate: int = 25
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    n_mels: int = 80
    spk_embed_dim: int = 192

    # Upsample conformer encoder (s3gen.py:59-74)
    enc_dim: int = 512
    enc_heads: int = 8
    enc_ffn_dim: int = 2048
    enc_blocks: int = 6
    enc_up_blocks: int = 4

    # CFM estimator U-Net (s3gen.py:76-87)
    est_in_channels: int = 320
    est_channels: int = 256
    est_n_blocks: int = 4          # transformer blocks per resnet stage
    est_mid_blocks: int = 12
    est_heads: int = 8
    est_head_dim: int = 64

    # CFM solver (s3gen.py:88-95)
    sigma_min: float = 1e-6
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10
    # Pallas flash attention in the estimator (TPU only; XLA fallback
    # elsewhere).  With bq=256 / bk=1024 blocks it takes the batch-16
    # vocoder from 47x to 102x realtime on v5e — the materialized
    # [2B, H, T, T] f32 score tensors are the single biggest S3Gen cost.
    use_flash_attention: bool = True

    # HiFTNet (s3gen.py:237-245, hifigan.py defaults)
    hift_base_channels: int = 512
    hift_nb_harmonics: int = 8
    upsample_rates: tuple = (8, 5, 3)
    upsample_kernel_sizes: tuple = (16, 11, 7)
    source_resblock_kernel_sizes: tuple = (7, 7, 11)
    source_resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    istft_n_fft: int = 16
    istft_hop: int = 4
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    audio_limit: float = 0.99
    lrelu_slope: float = 0.1
    f0_cond_channels: int = 512

    @classmethod
    def tiny(cls) -> "S3GenConfig":
        return dataclasses.replace(
            cls(), speech_vocab_size=64, enc_dim=32, enc_heads=2,
            enc_ffn_dim=64, enc_blocks=1, enc_up_blocks=1,
            est_in_channels=16 * 4, est_channels=32, est_n_blocks=1,
            est_mid_blocks=1, est_heads=2, est_head_dim=16, n_mels=16,
            spk_embed_dim=12, hift_base_channels=32, hift_nb_harmonics=2,
            f0_cond_channels=16,
        )


@dataclass(frozen=True)
class EngineConfig:
    """Continuous-batching decode engine knobs (replaces vLLM engine args,
    reference tts.py:130-140 + the CHATTERBOX_* sampling/trim env family)."""
    max_batch_size: int = 16
    max_model_len: int = 1000
    decode_chunk: int = 24          # decode steps per jitted chunk (host
    # sync cadence).  24 measured best for serving latency: the on-chip
    # streaming server's first-chunk T3 dropped 0.9 -> 0.65 s (TTFA 1.08
    # -> 0.89 s) vs the old default 8 — fewer harvest RTTs per request;
    # bench.py uses 32 for pure batched throughput.  Env override:
    # CHATTERBOX_DECODE_CHUNK.
    chunks_per_dispatch: int = 1    # (decode chunk + merge) pairs enqueued
    # back-to-back per harvest sync; >1 pays the host<->device sync cost
    # once per k chunks (bitwise-identical tokens) at the price of
    # slot-recycling / admission latency at k-chunk granularity
    # (docs/PERF.md round-2 notes)
    pipelined_harvest: bool = False  # async one-chunk-late harvest (see
    # T3Engine.generate; wins when host<->device sync RTT is high)
    rtt_adaptive: bool = False      # probe the host<->device sync RTT at
    # engine construction and apply runtime.engine.rtt_policy overrides
    # (chunks_per_dispatch=2, but only on an extreme >= 40 ms link — the
    # round-3 A/B data showed every sync-reduction knob LOSES at the
    # measured 23-29 ms RTTs, so the policy fires beyond them) — makes the
    # recorded score resilient to the tunnel's RTT lottery (VERDICT r2
    # item 2) instead of hostage to it
    compact_tail: bool = True       # once the queue is empty, halve the
    # live batch by gathering survivors into a compacted cache/state and
    # decode at the smaller batch (per-step cost scales with lanes); greedy
    # streams are bit-identical, stochastic streams stay correctly
    # distributed but differ (batch-shaped gumbel draw)
    compact_min: int = 6            # don't compact below this batch (6 =
    # one extra halving vs the round-4 default 8: the parity trace's
    # <=B/2 drain runs 7 of its 10 chunks with <=6 live lanes at B=12,
    # paying the ~0.68x-of-full fixed dispatch cost for dead lanes)
    pool_split: bool = False        # age-grouped two-pool dispatch: decode
    # the younger half of the slots at its own (smaller) s_active bucket.
    # Greedy bit-identical, but MEASURED OFF by default: two half-batch
    # dispatches cost 1.36x of one full dispatch at the same window
    # (tools/ubench_pool.py on v5e — the ~4 ms/step fixed cost per dispatch
    # does not scale with lanes and swamps the window saving; docs/PERF.md
    # round-4).  Kept for topologies with cheaper dispatch or much larger
    # position spreads.
    pool_margin: int = 192          # minimum bucketed-window spread (in
    # positions) between the pool maxima before a split is attempted
    admission_order: str = "shortest"  # pending-queue order: "shortest"
    # (ascending prompt_len — minimal padding within a prefill bucket) or
    # "lpt" (descending prompt_len + max_new — longest-processing-time
    # first, the classic makespan rule: the last-admitted requests are the
    # shortest, so the final drain tail stays near-full occupancy)
    admit_min_free: int = 0         # admission-wave hysteresis: admit only
    # when at least this many slots are free (0 -> scheduler default,
    # n_slots/4).  Smaller waves start requests sooner (TTFT, occupancy)
    # at the cost of more prefill dispatches.
    admit_wave: int = 24            # max requests per admission wave (and
    # the largest prefill m_bucket used during fill).  Wider waves fill
    # B=64 slots in fewer prefill dispatches; clean A/B/B/A at 27 ms RTT
    # (tools/ab_wave.py, parity workload): 24-wide 3489/3518 tok/s,
    # p50 4.81/4.84 s, p95 11.70/11.84 s vs 16-wide 3332/3388 tok/s,
    # p50 4.97/4.98, p95 12.11/12.32 — wins every axis (VERDICT r4 item
    # 3).  Cost: a bigger prefill block-KV transient (~[L, 2m, P, H, D])
    # and one compile shape per text bucket.
    admit_interleave: bool = False  # admit at most one prefill wave per
    # decode chunk instead of draining the whole admission queue first —
    # the first wave's requests start decoding ~2 prefill waves sooner
    # (TTFT), at the cost of a few partially-occupied chunks at startup
    # (VERDICT round-1 item 10).  Greedy streams are bit-identical either
    # way (lanes are independent).
    prefill_buckets: tuple = (64, 128, 192, 256, 512, 1024)
    # (192 added round 4: the parity workload's 120-180-token texts all
    # landed in the 256 bucket, padding every prefill 1.4-2x)
    cfg_scale: float = 0.5          # default; per-request override supported
    kv_dtype: str = "bfloat16"      # or "int8" / "int4" (nibble-packed)
    param_dtype: str = "bfloat16"
    # Sampling defaults (reference tts.py:259-311 + clamps at tts.py:349-356)
    temperature: float = 0.8
    top_p: float = 1.0
    min_p: float = 0.05
    repetition_penalty: float = 2.0
    max_tokens: int = 1000
    # Token budget pre-cap family (tts.py:372-377)
    tokens_per_char: float = 2.2
    tokens_min: int = 64
    tokens_max: int = 1200
    tokens_guard_mult: float = 1.6
    pre_guard_margin: int = 16
    deterministic: bool = False
    # Alignment-stream stopping (needs T3ModelConfig.align_enabled): force
    # EOS once decode attention has consumed the text and stalled for
    # `align_stall_patience` steps; suppress EOS while alignment is more than
    # `align_end_margin` text tokens from the end.
    align_stop: bool = False
    align_stall_patience: int = 24   # ~1 s of speech tokens
    align_end_margin: int = 2
    # Speculative multi-token decode (docs/PERF.md "Speculative multi-token
    # decode"): a layer-skip self-draft (first `spec_draft_layers` trunk
    # layers + the shared norm/speech head) proposes `spec_tokens` tokens
    # per cycle; the full trunk verifies all of them in ONE multi-query
    # attention pass (M+1 q-rows amortize the dominant frozen-KV read), and
    # the longest prefix whose verify samples match the draft is committed
    # (plus the bonus verify token).  Greedy streams with
    # spec_draft_layers == n_layers reproduce the plain path bit-for-bit
    # (test_spec_decode.py); with a truncated draft the committed stream is
    # still exactly the verify sampler's distribution — only throughput
    # depends on the draft's acceptance rate (measure with
    # tools/probe_draft.py on real checkpoints before enabling).
    spec_decode: bool = False
    spec_draft_layers: int = 10
    spec_tokens: int = 3             # M drafted tokens per cycle


@dataclass(frozen=True)
class PostProcessConfig:
    """Audio post-processing knobs (reference tts.py:337-343, 501-502, 544)."""
    tail_crop_tokens: int = 2
    tail_trim: bool = True
    tail_trim_db: float = -42.0
    tail_trim_db_rel: float = -35.0
    tail_trim_safety_ms: int = 50
    rms_window_ms: int = 50
    rms_hop_ms: int = 20
    align_hard: bool = True
    align_safety_ms: int = 0
    vad_trim: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / sharding layout for multi-chip serving / training.

    Axes: dp = data (request/batch) parallel, sp = sequence parallel
    (training activations sharded along time; XLA all-gathers around
    attention), tp = tensor parallel (Megatron column/row splits) over ICI.
    Pipeline parallel is deliberately absent: a 0.5 B-param dense trunk fits
    a single chip with room to spare, so pp would only add bubble overhead;
    expert parallel does not apply (no MoE layers in the model family —
    the reference's MoEFFNLayer is dead code, positionwise_feed_forward.py:58).
    """
    dp: int = 1        # data (request) parallel axis
    sp: int = 1        # sequence parallel axis (training)
    tp: int = 1        # tensor parallel axis over ICI
    axis_names: tuple = ("dp", "sp", "tp")
    # Multi-host: number of process (host) replicas laid DCN-major along the
    # dp axis.  dp must be divisible by dcn_dp; each host contributes
    # dp/dcn_dp local dp groups.  Keeping hosts on dp means the only
    # cross-DCN collective is the (tiny, replicated) slot-state all-reduce —
    # tp/sp collectives stay on ICI (scaling-book recipe; SURVEY §5.8).
    dcn_dp: int = 1


@dataclass(frozen=True)
class ChatterboxConfig:
    t3: T3ModelConfig = field(default_factory=T3ModelConfig)
    s3gen: S3GenConfig = field(default_factory=S3GenConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    post: PostProcessConfig = field(default_factory=PostProcessConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    debug: bool = False


def _env(name: str, default=None):
    return os.environ.get(name, default)


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")


def apply_env_overrides(cfg: ChatterboxConfig) -> ChatterboxConfig:
    """Honour the reference's CHATTERBOX_* env knobs as overrides for parity
    testing (reference reads these ad-hoc throughout tts.py / t3.py)."""
    eng = cfg.engine
    eng = dataclasses.replace(
        eng,
        cfg_scale=float(_env("CHATTERBOX_CFG_SCALE", eng.cfg_scale)),
        deterministic=_env_bool("CHATTERBOX_DETERMINISTIC", eng.deterministic),
        max_batch_size=int(_env("CHATTERBOX_MAX_BATCH_SIZE",
                                eng.max_batch_size)),
        decode_chunk=int(_env("CHATTERBOX_DECODE_CHUNK", eng.decode_chunk)),
        tokens_per_char=float(_env("CHATTERBOX_TOKENS_PER_CHAR", eng.tokens_per_char)),
        tokens_min=int(_env("CHATTERBOX_TOKENS_MIN", eng.tokens_min)),
        tokens_max=int(_env("CHATTERBOX_TOKENS_MAX", eng.tokens_max)),
        tokens_guard_mult=float(_env("CHATTERBOX_TOKENS_GUARD_MULT", eng.tokens_guard_mult)),
        pre_guard_margin=int(_env("CHATTERBOX_PRE_GUARD_MARGIN", eng.pre_guard_margin)),
        admit_interleave=_env_bool("CHATTERBOX_ADMIT_INTERLEAVE",
                                   eng.admit_interleave),
        admit_wave=int(_env("CHATTERBOX_ADMIT_WAVE", eng.admit_wave)),
        rtt_adaptive=_env_bool("CHATTERBOX_RTT_ADAPTIVE", eng.rtt_adaptive),
        spec_decode=_env_bool("CHATTERBOX_SPEC_DECODE", eng.spec_decode),
        spec_draft_layers=int(_env("CHATTERBOX_SPEC_DRAFT_LAYERS",
                                   eng.spec_draft_layers)),
        spec_tokens=int(_env("CHATTERBOX_SPEC_TOKENS", eng.spec_tokens)),
    )
    post = cfg.post
    post = dataclasses.replace(
        post,
        tail_crop_tokens=int(_env("CHATTERBOX_TAIL_CROP_TOKENS", post.tail_crop_tokens)),
        tail_trim=_env_bool("CHATTERBOX_TAIL_TRIM", post.tail_trim),
        tail_trim_db=float(_env("CHATTERBOX_TAIL_TRIM_DB", post.tail_trim_db)),
        tail_trim_db_rel=float(_env("CHATTERBOX_TAIL_TRIM_DB_REL", post.tail_trim_db_rel)),
        tail_trim_safety_ms=int(_env("CHATTERBOX_TAIL_TRIM_SAFETY_MS", post.tail_trim_safety_ms)),
        rms_window_ms=int(_env("CHATTERBOX_RMS_WINDOW_MS", post.rms_window_ms)),
        rms_hop_ms=int(_env("CHATTERBOX_RMS_HOP_MS", post.rms_hop_ms)),
        align_hard=_env_bool("CHATTERBOX_ALIGN_HARD", post.align_hard),
        align_safety_ms=int(_env("CHATTERBOX_ALIGN_SAFETY_MS", post.align_safety_ms)),
        vad_trim=_env_bool("CHATTERBOX_VAD_TRIM", post.vad_trim),
    )
    return dataclasses.replace(
        cfg, engine=eng, post=post,
        debug=_env_bool("CHATTERBOX_DEBUG", cfg.debug),
    )
