"""S3Gen composition root: speech tokens -> mel (CFM) -> wav (HiFTNet).

Parity target: reference s3gen/s3gen.py (S3Token2Mel/S3Token2Wav :47-317):
tokenizer + mel extractor + CAMPPlus + flow + HiFT, `embed_ref` building the
per-voice reference dict and `inference` running flow -> hift with a 20 ms
anti-spillover fade (s3gen.py:246-251).

TPU-native redesign: `inference` is **batched** over requests with ragged
lengths (the reference is batch-1 — S3Gen is 82% of its runtime,
README.md:152-153).  The generated mel region is extracted on device with a
roll-gather before vocoding, mirroring the reference's `feat[:, :, mel_len1:]`
slice (flow.py:286).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import S3GenConfig, S3GEN_SR, S3_SR
from ..s3tokenizer.model import S3TokenizerV2
from .flow import CausalFlow, fixed_noise
from .hifigan import HiFTGenerator
from .xvector import CAMPPlus


class RefDict(NamedTuple):
    """Per-voice reference conditioning (reference s3gen.py:164-170)."""
    prompt_token: np.ndarray      # [Tp] speech tokens of the reference clip
    prompt_feat: np.ndarray       # [Fp, 80] 24 kHz mels of the reference clip
    embedding: np.ndarray         # [192] CAMPPlus x-vector


class S3Gen(nn.Module):
    """flow + mel2wav; the host-side conditioning helpers live in
    api/tts.py (they need the tokenizer/xvector applies + numpy DSP)."""
    cfg: S3GenConfig

    def setup(self):
        self.flow = CausalFlow(self.cfg)
        self.mel2wav = HiFTGenerator(self.cfg)

    def __call__(self, tokens, token_len, prompt_feat, prompt_feat_len,
                 embedding, noise, rngs, n_timesteps: int = 10):
        """Batched token->wav.

        tokens: [B, T] = prompt_token ++ generated tokens (right-padded);
        token_len: [B]; prompt_feat: [B, Fp_max, 80]; prompt_feat_len: [B];
        embedding: [B, 192]; noise: [B, 2T, 80] CFM noise; rngs: [B]
        per-request keys for the NSF source.  Returns (wav [B, S_max],
        wav_len [B]) where request b's valid samples are wav[b, :wav_len[b]]
        — the generated region only.
        """
        c = self.cfg
        mel, mel_len = self.flow(tokens, token_len, prompt_feat,
                                 prompt_feat_len, embedding, noise,
                                 n_timesteps=n_timesteps)
        F = mel.shape[1]

        # Extract the generated region (roll left by the prompt-mel length,
        # matching the reference's slice at flow.py:286) before vocoding.
        gen_len = mel_len - prompt_feat_len                     # [B]
        idx = prompt_feat_len[:, None] + jnp.arange(F)[None, :]
        idx = jnp.clip(idx, 0, F - 1)
        gen_mel = jnp.take_along_axis(mel, idx[..., None], axis=1)
        valid = jnp.arange(F)[None, :] < gen_len[:, None]
        gen_mel = jnp.where(valid[..., None], gen_mel, 0.0)

        wav, _src = self.mel2wav(gen_mel, rngs, valid_frames=gen_len)
        up = S3GEN_SR // 50                                     # 480 samples/frame

        # 20 ms fade-in (s3gen.py:246-251, applied at s3gen.py:272)
        n_trim = S3GEN_SR // 50
        t = jnp.arange(2 * n_trim)
        fade = jnp.where(t < n_trim, 0.0,
                         (jnp.cos(jnp.linspace(jnp.pi, 0.0, n_trim))[
                             jnp.clip(t - n_trim, 0, n_trim - 1)] + 1.0) / 2.0)
        wav = wav.at[:, : 2 * n_trim].multiply(fade[None, :])

        wav_len = gen_len * up
        sample_valid = jnp.arange(wav.shape[1])[None, :] < wav_len[:, None]
        wav = jnp.where(sample_valid, wav, 0.0)
        return wav, wav_len

    def flow_only(self, tokens, token_len, prompt_feat, prompt_feat_len,
                  embedding, noise, n_timesteps: int = 10):
        """Expose the CFM stage alone (reference flow_inference,
        s3gen.py:277-288) for streaming/chunked vocoding."""
        return self.flow(tokens, token_len, prompt_feat, prompt_feat_len,
                         embedding, noise, n_timesteps=n_timesteps)
