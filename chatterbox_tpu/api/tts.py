"""ChatterboxTTS session API — the user-facing orchestrator.

Parity target: reference tts.py (ChatterboxTTS) / mtl_tts.py — same method
surface: ``from_local`` / ``from_pretrained``, ``get_audio_conditionals``,
``update_exaggeration``, ``generate`` / ``generate_with_conds``,
``shutdown``, ``.sr``; same defaults (temp 0.8, top_p clamped to 0.5 with a
language id, min_p 0.05, rep 2.0, diffusion_steps 10, ENC 6 s / DEC 10 s ref
windows, lru-cached conditionals).

TPU pipeline differences:
  * T3 decode runs on the in-repo continuous-batching engine
    (runtime/engine.py), not vLLM;
  * S3Gen vocoding is **batched** with shape bucketing (the reference loops
    batch-1 per utterance, tts.py:489-493 — its dominant cost);
  * conditioning DSP is host-side numpy (audio/dsp.py), model parts jitted.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Any, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (ChatterboxConfig, EngineConfig, S3GEN_SR, S3_SR,
                      S3_TOKEN_RATE, T3ModelConfig, apply_env_overrides)
from ..audio import dsp
from ..audio.postprocess import postprocess_wav
from ..audio.text import SUPPORTED_LANGUAGES, estimate_token_cap, punc_norm
from ..audio.tokenizer import EnTokenizer, MTLTokenizer
from ..models.s3gen.flow import fixed_noise
from ..models.s3gen.s3gen import S3Gen
from ..models.s3gen.xvector import CAMPPlus
from ..models.s3tokenizer.model import S3TokenizerConfig, S3TokenizerV2
from ..models.t3.model import T3Model
from ..models.voice_encoder.model import (VoiceEncoder, mel_to_partials,
                                          pool_partial_embeds)
from ..runtime.engine import Request, T3Engine

ENC_COND_LEN = 6 * S3_SR       # tts.py:65
DEC_COND_LEN = 10 * S3GEN_SR   # tts.py:66


@dataclasses.dataclass
class Conditionals:
    """(T3 cond embedding, S3Gen ref dict) pair (reference tts.py:31-61)."""
    cond_emb: np.ndarray              # [34, H]
    prompt_token: np.ndarray          # [Tp]
    prompt_feat: np.ndarray           # [Fp, 80]
    embedding: np.ndarray             # [192]


def _bucket_len(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


class ChatterboxTTS:
    def __init__(self, cfg: ChatterboxConfig, t3_model: T3Model, t3_params,
                 s3gen: S3Gen, s3gen_params, campplus: CAMPPlus,
                 campplus_params, ve: VoiceEncoder, ve_params,
                 s3tok: S3TokenizerV2, s3tok_params, tokenizer,
                 default_conds: Conditionals, variant: str = "english"):
        self.cfg = cfg
        self.t3_model = t3_model
        self.t3_params = t3_params
        self.s3gen = s3gen
        self.s3gen_params = s3gen_params
        self.campplus = campplus
        self.campplus_params = campplus_params
        self.ve = ve
        self.ve_params = ve_params
        self.s3tok = s3tok
        self.s3tok_params = s3tok_params
        self.tokenizer = tokenizer
        self.default_conds = default_conds
        self.variant = variant

        self.engine = T3Engine(t3_model, t3_params, cfg.t3, cfg.engine)
        self._noise = fixed_noise(cfg.s3gen.n_mels)
        self._s3gen_apply = jax.jit(
            lambda params, n, *a: self.s3gen.apply(params, *a, n_timesteps=n),
            static_argnums=(1,))
        # split stages for token-level streaming vocode (vocode_stream):
        # flow alone (S3Gen.flow_only) and HiFT alone on a mel segment
        self._flow_apply = jax.jit(
            lambda params, n, *a: self.s3gen.apply(
                params, *a, n_timesteps=n, method=S3Gen.flow_only),
            static_argnums=(1,))
        self._hift_apply = jax.jit(
            lambda params, mel, rngs, vf: self.s3gen.apply(
                params, mel, rngs, vf,
                method=lambda m, mel_, r_, vf_: m.mel2wav(
                    mel_, r_, valid_frames=vf_)))
        self._cond_cache: dict = {}

    # ------------------------------------------------------------------
    def set_seed(self, seed: int):
        """Deterministic sampling/noise reseed (reference
        gradio_tts_app.py:16-23 set_seed over torch/np/random)."""
        import jax
        self.engine.rng = jax.random.PRNGKey(seed)
        st = self.engine.state
        self.engine.state = st._replace(
            sampler=st.sampler._replace(rng=jax.random.PRNGKey(seed + 1)))

    @property
    def sr(self) -> int:
        return S3GEN_SR

    def get_supported_languages(self) -> dict:
        if self.variant == "multilingual":
            return dict(SUPPORTED_LANGUAGES)
        return {"en": "English"}

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    HF_REPO = "ResembleAI/chatterbox"
    # pinned revisions, reference tts.py:163 / tts.py:195
    HF_REVISION = {"english": "1b475dffa71fb191cb6d5901215eb6f55635a9b6",
                   "multilingual": "c819eeccdf99310da26bca3bc5ace120db93471a"}

    @classmethod
    def from_pretrained(cls, repo_id: Optional[str] = None,
                        variant: str = "english",
                        cache_dir: Optional[str] = None,
                        **kwargs) -> "ChatterboxTTS":
        """Download the reference checkpoint set from HF hub (pinned
        revision, reference tts.py:160-188) and build via :meth:`from_local`.
        Needs network access + ``huggingface_hub``; in air-gapped
        environments download the files out of band and use ``from_local``.
        """
        repo = repo_id or cls.HF_REPO
        # exact reference artifact lists: tts.py:165 (english) /
        # tts.py:197 (from_pretrained_multilingual)
        files = ["ve.safetensors", "s3gen.safetensors", "conds.pt"]
        if variant == "english":
            files += ["t3_cfg.safetensors", "tokenizer.json"]
        else:
            files += ["t3_23lang.safetensors", "mtl_tokenizer.json",
                      "Cangjie5_TC.json"]
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as e:
            raise RuntimeError(
                "from_pretrained needs the 'huggingface_hub' package; "
                "download the checkpoint files manually and use "
                f"ChatterboxTTS.from_local(<dir>). Files: {files}") from e
        rev = cls.HF_REVISION.get(variant)
        local = None
        for f in files:
            try:
                p = hf_hub_download(repo, f, revision=rev,
                                    cache_dir=cache_dir)
            except Exception as e:
                raise RuntimeError(
                    f"could not download {repo}/{f} (offline?); fetch the "
                    "checkpoint out of band and use from_local(<dir>)."
                ) from e
            local = Path(p).parent
        return cls.from_local(local, variant=variant, **kwargs)

    @classmethod
    def from_local(cls, ckpt_dir: Union[str, Path], variant: str = "english",
                   cfg: Optional[ChatterboxConfig] = None,
                   tokenizer_path: Optional[str] = None,
                   **engine_kwargs) -> "ChatterboxTTS":
        """Load from a checkpoint directory holding the reference's artifact
        set (tts.py:92-158: t3_cfg/t3_23lang.safetensors, ve.safetensors,
        s3gen.safetensors, conds.pt, tokenizer json)."""
        from ..models.t3.weights import convert_t3_params, load_safetensors
        from ..models.s3gen.weights import (convert_campplus_params,
                                            convert_s3gen_params)
        from ..models.voice_encoder.weights import convert_voice_encoder_params

        ckpt_dir = Path(ckpt_dir)
        base = cfg or ChatterboxConfig()
        if variant == "multilingual":
            base = dataclasses.replace(base, t3=T3ModelConfig.multilingual())
            if "align_stop" not in engine_kwargs:
                # default the EOS safeguard ON for the variant that lacks it
                # in the reference (README.md:99); engine_kwargs overrides
                base = dataclasses.replace(
                    base, engine=dataclasses.replace(base.engine,
                                                     align_stop=True))
        if engine_kwargs:
            base = dataclasses.replace(
                base, engine=dataclasses.replace(base.engine, **engine_kwargs))
        base = apply_env_overrides(base)

        t3_file = "t3_cfg.safetensors" if variant == "english" else "t3_23lang.safetensors"
        t3_sd = load_safetensors(str(ckpt_dir / t3_file))
        t3_params = jax.tree.map(jnp.asarray,
                                 convert_t3_params(t3_sd, base.t3))

        s3_sd = load_safetensors(str(ckpt_dir / "s3gen.safetensors"))
        s3gen_params = jax.tree.map(jnp.asarray,
                                    convert_s3gen_params(s3_sd, base.s3gen))
        campplus_params = jax.tree.map(jnp.asarray,
                                       convert_campplus_params(s3_sd))

        # the pretrained speech tokenizer rides inside s3gen.safetensors
        # under tokenizer.* (reference s3gen.py:55; its absence would make
        # audio-prompt conditioning produce garbage prompt tokens)
        from ..models.s3tokenizer.weights import (
            convert_s3tokenizer_params, has_s3tokenizer_weights)
        s3tok_params, s3tok_cfg = None, None
        if has_s3tokenizer_weights(s3_sd):
            s3tok_tree, s3tok_cfg = convert_s3tokenizer_params(s3_sd)
            s3tok_params = jax.tree.map(jnp.asarray, s3tok_tree)
        else:
            import sys
            print("[TTS] WARNING: s3gen.safetensors has no tokenizer.* keys —"
                  " the speech tokenizer is RANDOM-initialized and"
                  " audio-prompt voice cloning will not work", file=sys.stderr)

        ve_sd = load_safetensors(str(ckpt_dir / "ve.safetensors"))
        ve_params = jax.tree.map(jnp.asarray,
                                 convert_voice_encoder_params(ve_sd))

        if variant == "english":
            tokenizer = EnTokenizer.from_pretrained(
                tokenizer_path or str(ckpt_dir))
        else:
            tokenizer = MTLTokenizer.from_pretrained(
                tokenizer_path or str(ckpt_dir),
                cangjie_path=str(ckpt_dir / "Cangjie5_TC.json"))

        obj = cls._assemble(base, t3_params, s3gen_params, campplus_params,
                            ve_params, s3tok_params, tokenizer, variant,
                            s3tok_cfg=s3tok_cfg)
        conds_path = ckpt_dir / "conds.pt"
        if conds_path.exists():
            obj.default_conds = obj._load_default_conds(str(conds_path))
        return obj

    @classmethod
    def from_random(cls, cfg: Optional[ChatterboxConfig] = None,
                    tokenizer=None, seed: int = 0,
                    variant: str = "english",
                    s3tok_cfg: Optional[S3TokenizerConfig] = None
                    ) -> "ChatterboxTTS":
        """Random-weight instance (development / benchmarking without
        checkpoint access)."""
        base = apply_env_overrides(cfg or ChatterboxConfig())
        if tokenizer is None:
            tokenizer = cls._default_tokenizer_for(base, variant)
        rng = jax.random.PRNGKey(seed)
        t3c, s3c = base.t3, base.s3gen

        t3_model = T3Model(t3c)
        B = 1
        t3_params = jax.jit(lambda r: t3_model.init(
            r, jnp.zeros((B, t3c.speaker_embed_size)),
            jnp.zeros((B, 4), jnp.int32), 0.5 * jnp.ones((B, 1)),
            jnp.zeros((B, 4), jnp.int32), jnp.full((B,), 4, jnp.int32),
            method=lambda m, *a: m.init_all(*a)))(rng)

        s3gen = S3Gen(s3c)
        noise = fixed_noise(s3c.n_mels)
        s3gen_params = jax.jit(lambda r: s3gen.init(
            r, jnp.zeros((1, 8), jnp.int32), jnp.full((1,), 8, jnp.int32),
            jnp.zeros((1, 4, s3c.n_mels)), jnp.full((1,), 4, jnp.int32),
            jnp.zeros((1, s3c.spk_embed_dim)),
            jnp.broadcast_to(noise[:, :16], (1, 16, s3c.n_mels)),
            jax.random.split(r, 1), n_timesteps=1))(rng)

        campplus = CAMPPlus(embedding_size=s3c.spk_embed_dim)
        campplus_params = jax.jit(lambda r: campplus.init(
            r, jnp.zeros((1, 200, 80))))(rng)

        ve = VoiceEncoder(embed_size=t3c.speaker_embed_size)
        ve_params = jax.jit(lambda r: ve.init(r, jnp.zeros((1, 160, 40))))(rng)

        return cls._assemble(base, t3_params, s3gen_params, campplus_params,
                             ve_params, None, tokenizer, variant,
                             rng=rng, s3tok_cfg=s3tok_cfg)

    @classmethod
    def _default_tokenizer_for(cls, base, variant):
        """Tokenizer for a dev/random instance: the REAL vendored vocab
        assets (chatterbox_tpu/assets/, same data the reference bundles)
        whenever the config's text vocab can hold the real id space, so the
        production tokenizer path is what random-weight runs exercise;
        char_fallback survives only for tiny test configs."""
        import sys
        tok_cls = EnTokenizer if variant == "english" else MTLTokenizer
        try:
            tok = tok_cls.from_pretrained()
            if tok.vocab_size <= base.t3.text_vocab_size:
                return tok
            reason = (f"config text vocab ({base.t3.text_vocab_size}) too "
                      f"small for the bundled real vocab ({tok.vocab_size})")
        except FileNotFoundError:
            reason = "bundled vocab assets not found"
        print(f"[TTS] {reason} — using a char-level fallback",
              file=sys.stderr)
        return tok_cls.char_fallback()

    @classmethod
    def _assemble(cls, base, t3_params, s3gen_params, campplus_params,
                  ve_params, s3tok_params, tokenizer, variant, rng=None,
                  s3tok_cfg=None):
        t3_model = T3Model(base.t3)
        s3gen = S3Gen(base.s3gen)
        campplus = CAMPPlus(embedding_size=base.s3gen.spk_embed_dim)
        ve = VoiceEncoder(embed_size=base.t3.speaker_embed_size)
        s3tok_cfg = s3tok_cfg or S3TokenizerConfig()
        s3tok = S3TokenizerV2(s3tok_cfg)
        if s3tok_params is None:
            r = rng if rng is not None else jax.random.PRNGKey(0)
            s3tok_params = jax.jit(lambda r: s3tok.init(
                r, jnp.zeros((1, 100, s3tok_cfg.n_mels)),
                jnp.full((1,), 100, jnp.int32)))(r)

        default = cls._synthetic_default_conds(base)
        return cls(base, t3_model, t3_params, s3gen, s3gen_params, campplus,
                   campplus_params, ve, ve_params, s3tok, s3tok_params,
                   tokenizer, default, variant)

    @staticmethod
    def _synthetic_default_conds(base: ChatterboxConfig) -> Conditionals:
        """Placeholder default voice when conds.pt is unavailable."""
        t3c = base.t3
        return Conditionals(
            cond_emb=np.zeros((t3c.cond_len, t3c.hidden_size), np.float32),
            prompt_token=np.zeros((50,), np.int32),
            prompt_feat=np.zeros((100, base.s3gen.n_mels), np.float32),
            embedding=np.zeros((base.s3gen.spk_embed_dim,), np.float32),
        )

    def _load_default_conds(self, path: str) -> Conditionals:
        """Load the packaged default voice (reference Conditionals.load,
        tts.py:58-61; torch pickle with {'t3': ..., 'gen': ...})."""
        import torch
        kw = torch.load(path, weights_only=True, map_location="cpu")
        t3 = kw["t3"]
        gen = kw["gen"]
        speaker = np.asarray(t3["speaker_emb"], np.float32).reshape(1, -1)
        ptoks = np.atleast_2d(np.asarray(t3["cond_prompt_speech_tokens"]))
        emo = np.asarray(t3.get("emotion_adv", 0.5 * np.ones((1, 1))),
                         np.float32).reshape(1, 1)
        cond_emb = self._encode_conditionals(speaker, ptoks.astype(np.int32),
                                             emo)
        return Conditionals(
            cond_emb=cond_emb,
            prompt_token=np.asarray(gen["prompt_token"], np.int64
                                    ).reshape(-1).astype(np.int32),
            prompt_feat=np.asarray(gen["prompt_feat"], np.float32)[0],
            embedding=np.asarray(gen["embedding"], np.float32).reshape(-1),
        )

    # ------------------------------------------------------------------
    # Conditioning (reference tts.py:215-257)
    # ------------------------------------------------------------------
    def _encode_conditionals(self, speaker_emb, prompt_tokens, emotion_adv):
        out = jax.jit(lambda p, s, t, e: self.t3_model.apply(
            p, s, t, e, method=lambda m, *a: m.encode_conditionals(*a)))(
            self.t3_params, jnp.asarray(speaker_emb),
            jnp.asarray(prompt_tokens), jnp.asarray(emotion_adv))
        return np.asarray(out[0])

    def get_audio_conditionals(self, wav_fpath: Optional[str] = None,
                               exaggeration: float = 0.5) -> Conditionals:
        key = (wav_fpath, exaggeration)
        if key in self._cond_cache:
            return self._cond_cache[key]
        if wav_fpath is None:
            conds = self.default_conds
            if exaggeration != 0.5:
                conds = self.update_exaggeration(conds, exaggeration)
            self._cond_cache[key] = conds
            return conds

        wav24 = load_audio(wav_fpath, S3GEN_SR)
        conds = self.conditionals_from_wav(wav24, exaggeration)
        if len(self._cond_cache) >= 10:   # lru_cache(10) parity, tts.py:215
            self._cond_cache.pop(next(iter(self._cond_cache)))
        self._cond_cache[key] = conds
        return conds

    def s3_tokenize(self, wav16: np.ndarray) -> np.ndarray:
        """16 kHz wav -> S3 speech-token ids (reference S3Tokenizer.forward,
        s3tokenizer.py:90-126).  Exposed for token-id goldens/diagnostics."""
        mel = dsp.s3_tokenizer_mel(wav16, self.s3tok.cfg.n_mels)
        if not hasattr(self, "_s3tok_jit"):   # cache: a fresh lambda per
            # call would recompile the tokenizer forward every invocation
            self._s3tok_jit = jax.jit(
                lambda p, m, l: self.s3tok.apply(p, m, l))
        toks, tlen = self._s3tok_jit(
            self.s3tok_params, jnp.asarray(mel[None]),
            jnp.asarray([mel.shape[0]], jnp.int32))
        return np.asarray(toks[0, : int(tlen[0])], np.int32)

    def conditionals_from_wav(self, wav24: np.ndarray,
                              exaggeration: float = 0.5) -> Conditionals:
        wav16 = dsp.resample(wav24, S3GEN_SR, S3_SR)

        # --- S3Gen reference (embed_ref, s3gen.py:120-170) ---
        ref24 = wav24[:DEC_COND_LEN]
        ref16 = dsp.resample(ref24, S3GEN_SR, S3_SR)
        prompt_feat = dsp.s3gen_mel(ref24, self.cfg.s3gen.n_mels)  # [Fp, n_mels]
        fbank = dsp.kaldi_fbank(ref16)
        fbank = fbank - fbank.mean(axis=0, keepdims=True)
        xvec = jax.jit(lambda p, f: self.campplus.apply(p, f))(
            self.campplus_params, jnp.asarray(fbank[None]))
        embedding = np.asarray(xvec[0])

        mel_tok = dsp.s3_tokenizer_mel(ref16, self.s3tok.cfg.n_mels)
        ptoks, plen = jax.jit(lambda p, m, l: self.s3tok.apply(p, m, l))(
            self.s3tok_params, jnp.asarray(mel_tok[None]),
            jnp.asarray([mel_tok.shape[0]], jnp.int32))
        prompt_token = np.asarray(ptoks[0, : int(plen[0])])
        # mel/token 2:1 consistency (s3gen.py:157-162)
        n = min(prompt_feat.shape[0] // 2, len(prompt_token))
        prompt_token, prompt_feat = prompt_token[:n], prompt_feat[: 2 * n]

        # --- T3 conditioning (tts.py:229-245) ---
        mel_tok6 = dsp.s3_tokenizer_mel(wav16[:ENC_COND_LEN], self.s3tok.cfg.n_mels)
        t3toks, t3len = jax.jit(lambda p, m, l: self.s3tok.apply(p, m, l))(
            self.s3tok_params, jnp.asarray(mel_tok6[None]),
            jnp.asarray([mel_tok6.shape[0]], jnp.int32))
        t3_prompt = np.asarray(
            t3toks[0, : int(t3len[0])])[: self.cfg.t3.speech_cond_prompt_len]

        ve_wav = dsp.trim_silence(wav16, 20.0)
        partials = mel_to_partials(dsp.voice_encoder_mel(ve_wav))
        pe = jax.jit(lambda p, m: self.ve.apply(p, m))(
            self.ve_params, jnp.asarray(partials))
        speaker = pool_partial_embeds(np.asarray(pe))[None]

        cond_emb = self._encode_conditionals(
            speaker, t3_prompt[None].astype(np.int32),
            exaggeration * np.ones((1, 1), np.float32))
        return Conditionals(cond_emb=cond_emb,
                            prompt_token=prompt_token.astype(np.int32),
                            prompt_feat=prompt_feat, embedding=embedding)

    def update_exaggeration(self, conds: Conditionals,
                            exaggeration: float) -> Conditionals:
        """Rewrite only the emotion row (reference tts.py:249-257)."""
        if exaggeration == 0.5:
            return conds
        kernel = np.asarray(
            self.t3_params["params"]["cond_enc"]["emotion_adv_fc"]["kernel"])
        new = conds.cond_emb.copy()
        new[-1] = exaggeration * kernel[0]
        return dataclasses.replace(conds, cond_emb=new)

    # ------------------------------------------------------------------
    # Generation (reference tts.py:259-562)
    # ------------------------------------------------------------------
    def _maybe_profile(self):
        """CHATTERBOX_PROFILE=<dir> wraps generation in a jax.profiler trace
        (analyze with tools/xprof.py <dir>) — the TPU-native upgrade of the
        reference's wall-clock print brackets (SURVEY §5.1)."""
        import contextlib
        import os as _os
        d = _os.environ.get("CHATTERBOX_PROFILE")
        if d:
            import jax as _jax
            return _jax.profiler.trace(d)
        return contextlib.nullcontext()

    def generate(self, prompts: Union[str, List[str]],
                 audio_prompt_path: Optional[str] = None,
                 language_id: Optional[str] = "en",
                 exaggeration: float = 0.5, **kwargs) -> List[np.ndarray]:
        conds = self.get_audio_conditionals(audio_prompt_path)
        return self.generate_with_conds(
            prompts, conds, language_id=language_id,
            exaggeration=exaggeration, **kwargs)

    def generate_with_conds(self, prompts, conds, **kwargs):
        with self._maybe_profile():
            return self._generate_with_conds_impl(prompts, conds, **kwargs)

    def _generate_with_conds_impl(
            self, prompts: Union[str, List[str]], conds,
            language_id="en", temperature=0.8,
            exaggeration=0.5, max_tokens: int = 1000,
            diffusion_steps: int = 10, top_p=1.0,
            min_p=0.05, repetition_penalty=2.0,
            cfg_scale=None, return_tokens: bool = False,
            vocode: bool = True) -> List[np.ndarray]:
        """``language_id`` / ``temperature`` / ``exaggeration`` / ``top_p`` /
        ``min_p`` / ``repetition_penalty`` / ``cfg_scale`` accept a scalar or
        a per-prompt list (reference mtl_tts.py:405-435 supports language_id
        lists; the from-scratch engine makes the rest per-request for free).
        ``conds`` may likewise be one Conditionals or a per-prompt list."""
        if isinstance(prompts, str):
            prompts = [prompts]
        n = len(prompts)

        def per(v, name):
            vs = list(v) if isinstance(v, (list, tuple)) else [v] * n
            if len(vs) != n:
                raise ValueError(
                    f"{name}: got {len(vs)} values for {n} prompts")
            return vs

        langs = per(language_id, "language_id")
        for lang in langs:
            if lang and lang.lower() not in self.get_supported_languages():
                raise ValueError(f"Unsupported language_id '{lang}'")
        temps = per(temperature, "temperature")
        exags = per(exaggeration, "exaggeration")
        top_ps = per(top_p, "top_p")
        min_ps = per(min_p, "min_p")
        rep_pens = per(repetition_penalty, "repetition_penalty")
        cfgs = per(cfg_scale, "cfg_scale")

        eng = self.cfg.engine
        conds_list = [self.update_exaggeration(c, e)
                      for c, e in zip(per(conds, "conds"), exags)]

        # sampling clamps (tts.py:349-362), per prompt
        temp_use = [min(t, 0.5) if lang else t
                    for t, lang in zip(temps, langs)]
        top_p_use = [min(p, 0.5) if lang else p
                     for p, lang in zip(top_ps, langs)]
        if eng.deterministic:
            temp_use = [0.0] * n
            top_p_use = [1.0] * n

        texts = ["[START]" + punc_norm(p) + "[STOP]" for p in prompts]
        if self.variant == "multilingual":
            texts = [f"<{(lang or 'en').lower()}>{t}"
                     for t, lang in zip(texts, langs)]

        reqs = []
        for i, t in enumerate(texts):
            ids = self.tokenizer.text_to_tokens(t, language_id=langs[i]) \
                if self.variant == "multilingual" \
                else self.tokenizer.text_to_tokens(t)
            cap = estimate_token_cap(
                t, eng.tokens_per_char, eng.tokens_min, eng.tokens_max,
                eng.tokens_guard_mult)
            cap = min(cap + eng.pre_guard_margin, max_tokens, eng.max_model_len)
            reqs.append(Request(
                text_ids=np.asarray(ids, np.int32),
                cond_emb=conds_list[i].cond_emb,
                max_new_tokens=max(1, cap),
                temperature=temp_use[i], top_p=top_p_use[i], min_p=min_ps[i],
                repetition_penalty=rep_pens[i],
                cfg_scale=eng.cfg_scale if cfgs[i] is None else cfgs[i],
                uid=i))

        t0 = time.time()
        results = self.engine.generate(reqs)
        print(f"[T3] Speech Token Generation time: {time.time() - t0:.2f}s")

        t0 = time.time()
        token_lists = []
        for i, r in enumerate(results):
            toks = r.tokens
            if r.finished_by_stop:
                toks = toks[:-1]                                # strip EOS
                crop = self.cfg.post.tail_crop_tokens
                if crop:
                    toks = toks[: max(0, len(toks) - crop)]
            toks = toks[toks < self.cfg.t3.start_speech_token]  # drop invalid
            guard = estimate_token_cap(
                texts[i], eng.tokens_per_char, eng.tokens_min, eng.tokens_max,
                eng.tokens_guard_mult)
            token_lists.append(toks[:guard])

        if not vocode:   # T3 only — caller vocodes (e.g. vocode_stream)
            return token_lists

        wavs = self.vocode_batch(token_lists, conds_list,
                                 diffusion_steps=diffusion_steps)
        out = [postprocess_wav(w, len(t), self.cfg.post)
               for w, t in zip(wavs, token_lists)]
        print(f"[S3Gen] Wavform Generation time: {time.time() - t0:.2f}s")
        if return_tokens:    # (tools/eval_quality.py: token-level parity)
            return out, token_lists
        return out

    # ------------------------------------------------------------------
    def vocode_batch(self, token_lists: List[np.ndarray], conds,
                     diffusion_steps: int = 10,
                     batch_bucket: int = 8) -> List[np.ndarray]:
        """Batched S3Gen vocoding with (batch, length) bucketing.

        ``conds`` is one Conditionals shared by every request or a
        per-request list — mixed voices batch together (each row carries its
        own prompt tokens/mels/x-vector; the flow is fully ragged), which the
        serving pool needs when coalescing concurrent HTTP requests."""
        n = len(token_lists)
        conds_l = list(conds) if isinstance(conds, (list, tuple)) \
            else [conds] * n
        if len(conds_l) != n:
            raise ValueError(f"{len(conds_l)} conds for {n} token lists")
        order = sorted(range(n), key=lambda i: len(token_lists[i]))
        out: dict = {}
        for start in range(0, len(order), batch_bucket):
            group = order[start: start + batch_bucket]
            B = len(group)
            Bp = 1 << (B - 1).bit_length()
            T = _bucket_len(max(len(conds_l[i].prompt_token)
                                + len(token_lists[i]) for i in group))
            # bucket the prompt-mel axis too: mixed voices would otherwise
            # recompile _s3gen_apply per distinct prompt length
            Fp = _bucket_len(max(conds_l[i].prompt_feat.shape[0]
                                 for i in group))
            n_mels = self.cfg.s3gen.n_mels
            emb_dim = len(conds_l[group[0]].embedding)
            tokens = np.zeros((Bp, T), np.int32)
            tlen = np.zeros((Bp,), np.int32)
            pfeat = np.zeros((Bp, Fp, n_mels), np.float32)
            pflen = np.zeros((Bp,), np.int32)
            emb = np.zeros((Bp, emb_dim), np.float32)
            for j, i in enumerate(group):
                c, g = conds_l[i], token_lists[i]
                Tp = len(c.prompt_token)
                tokens[j, :Tp] = c.prompt_token
                tokens[j, Tp: Tp + len(g)] = g
                tlen[j] = Tp + len(g)
                pfeat[j, : c.prompt_feat.shape[0]] = c.prompt_feat
                pflen[j] = c.prompt_feat.shape[0]
                emb[j] = c.embedding
            noise = jnp.broadcast_to(self._noise[:, : 2 * T],
                                     (Bp, 2 * T, self.cfg.s3gen.n_mels))
            rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(Bp))
            wav, wav_len = self._s3gen_apply(
                self.s3gen_params, diffusion_steps, jnp.asarray(tokens),
                jnp.asarray(tlen), jnp.asarray(pfeat), jnp.asarray(pflen),
                jnp.asarray(emb), noise, rngs)
            wav, wav_len = np.asarray(wav), np.asarray(wav_len)
            for j, i in enumerate(group):
                out[i] = wav[j, : wav_len[j]]
        return [out[i] for i in range(len(token_lists))]

    def vocode_stream(self, tokens, cond, diffusion_steps: int = 10,
                      seg_frames: int = 100, ctx_frames: int = 4):
        """Streaming vocode for ONE request: run the CFM flow once
        (S3Gen.flow_only), then vocode the generated mel in fixed-size
        segments with HiFT, yielding wav pieces as they are ready.

        First audio arrives after flow + ONE small HiFT call instead of
        flow + HiFT over the whole utterance (the reference server vocodes
        each text chunk synchronously, openai_tts_server.py:438-528).
        Each segment gets ``ctx_frames`` of left context (conv receptive
        field / NSF source warm-up) and joins the previous segment under a
        20 ms crossfade that masks the source-phase restart.  Total sample
        count equals the non-streamed vocode exactly (gen_frames * 480);
        tail trims are the caller's job (the server fades chunk tails).
        """
        up = S3GEN_SR // 50                                   # 480
        XF = up                                               # crossfade
        # a 1-frame segment leaves nothing to yield after the held
        # crossfade tail (held=None crash); 2 frames is the floor
        seg_frames = max(2, int(seg_frames))
        ctx_frames = max(1, int(ctx_frames))
        n_mels = self.cfg.s3gen.n_mels
        tokens = np.asarray(tokens, np.int32)
        Tp = len(cond.prompt_token)
        T = _bucket_len(Tp + len(tokens))
        toks = np.zeros((1, T), np.int32)
        toks[0, :Tp] = cond.prompt_token
        toks[0, Tp: Tp + len(tokens)] = tokens
        tlen = np.asarray([Tp + len(tokens)], np.int32)
        Fp = _bucket_len(cond.prompt_feat.shape[0])
        pfeat = np.zeros((1, Fp, n_mels), np.float32)
        pfeat[0, : cond.prompt_feat.shape[0]] = cond.prompt_feat
        pflen = np.asarray([cond.prompt_feat.shape[0]], np.int32)
        emb = np.asarray(cond.embedding, np.float32)[None]
        noise = jnp.broadcast_to(self._noise[:, : 2 * T], (1, 2 * T, n_mels))
        mel, mel_len = self._flow_apply(
            self.s3gen_params, diffusion_steps, jnp.asarray(toks),
            jnp.asarray(tlen), jnp.asarray(pfeat), jnp.asarray(pflen),
            jnp.asarray(emb), noise)
        mel = np.asarray(mel)[0]        # keep the flow's dtype (bf16 on TPU)
        n_gen = int(mel_len[0]) - int(pflen[0])
        if n_gen <= 0:
            return
        gen = mel[int(pflen[0]): int(pflen[0]) + n_gen]

        win = ctx_frames + seg_frames
        rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(1))
        held = None                      # previous segment's last XF samples
        starts = list(range(0, n_gen, seg_frames))
        for k, start in enumerate(starts):
            lo = max(0, start - ctx_frames)
            w = gen[lo: min(start + seg_frames, n_gen)]
            buf = np.zeros((1, win, n_mels), mel.dtype)
            buf[0, : len(w)] = w
            wav, _src = self._hift_apply(
                self.s3gen_params, jnp.asarray(buf), rngs,
                jnp.asarray([len(w)], np.int32))
            wav = np.asarray(wav, np.float32)[0]
            off = (start - lo) * up
            seg_wav = wav[off: len(w) * up].copy()
            if k == 0:
                # 20 ms fade-in, same shape as S3Gen.__call__
                n_trim = up
                t = np.arange(min(2 * n_trim, len(seg_wav)))
                ramp = (np.cos(np.linspace(np.pi, 0.0, n_trim)) + 1.0) / 2.0
                fade = np.where(t < n_trim, 0.0,
                                ramp[np.clip(t - n_trim, 0, n_trim - 1)])
                seg_wav[: len(t)] *= fade.astype(np.float32)
                out = seg_wav
            else:
                pre = wav[max(0, off - XF): off]    # overlaps previous tail
                n = min(len(held), len(pre))
                r = np.linspace(0.0, 1.0, n, dtype=np.float32)
                mixed = held[:n] * (1.0 - r) + pre[len(pre) - n:] * r
                out = np.concatenate([held[: len(held) - n] if n < len(held)
                                      else np.empty(0, np.float32),
                                      mixed, seg_wav])
            if k < len(starts) - 1 and len(out) > XF:
                held = out[-XF:]
                yield out[:-XF]
            else:
                held = None
                yield out

    def shutdown(self):
        self.engine = None


def load_audio(path: str, target_sr: int) -> np.ndarray:
    """Load an audio file to float32 mono at target_sr (wav via scipy;
    soundfile if available for other formats)."""
    try:
        import soundfile as sf
        data, sr = sf.read(path, dtype="float32", always_2d=True)
        mono = data.mean(axis=1)
    except Exception:
        from scipy.io import wavfile
        sr, data = wavfile.read(path)
        data = np.asarray(data)
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        elif data.dtype.kind == "u":
            data = (data.astype(np.float32) - 128.0) / 128.0
        mono = data.mean(axis=1) if data.ndim > 1 else data.astype(np.float32)
    return dsp.resample(mono, sr, target_sr)
