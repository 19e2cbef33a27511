"""Token -> mel flow-matching module (CosyVoice2 causal CFM decoder).

Parity target: reference s3gen/flow.py (CausalMaskedDiffWithXvec.inference
:241-288) + s3gen/flow_matching.py (ConditionalCFM.solve_euler :82-133,
CausalConditionalCFM :198-228 with its fixed noise buffer).

TPU-native redesign:
  * fully batched with ragged lengths (the reference asserts batch==1 at
    flow.py:256 — vocoding dominates runtime, README.md:152-153, so batching
    here is the single biggest win);
  * the Euler loop is a lax.fori_loop over a precomputed cosine t-schedule;
    the CFM's own CFG runs as a 2B-lane batch through the estimator exactly
    like the reference's batch-2 stacking (flow_matching.py:105-126);
  * the 'fixed noise' determinism trick (flow_matching.py:201,223) is kept:
    noise is generated once from a fixed PRNG key at init.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import S3GenConfig
from ...utils.layers import make_length_mask
from .encoder import UpsampleConformerEncoder
from .estimator import ConditionalDecoder

MAX_NOISE_FRAMES = 15_000  # reference rand_noise buffer: [1, 80, 50*300]


def cosine_t_span(n_timesteps: int):
    t = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    return 1.0 - jnp.cos(t * 0.5 * jnp.pi)


class CausalFlow(nn.Module):
    """input_embedding -> upsample conformer encoder -> CFM euler solve."""
    cfg: S3GenConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.speech_vocab_size, c.enc_dim)
        self.spk_embed_affine_layer = nn.Dense(c.n_mels)
        self.encoder = UpsampleConformerEncoder(c)
        self.encoder_proj = nn.Dense(c.n_mels)
        self.estimator = ConditionalDecoder(c)

    def encode(self, tokens, token_len):
        """tokens: [B, T] (prompt tokens ++ generated tokens, right-padded);
        token_len: [B].  Returns (mu [B, 2T, n_mels], mel_len [B])."""
        c = self.cfg
        mask = make_length_mask(token_len, tokens.shape[1])[..., None]
        emb = self.input_embedding(jnp.clip(tokens, 0, c.speech_vocab_size - 1))
        emb = emb * mask.astype(emb.dtype)
        h, h_len = self.encoder(emb, token_len)
        return self.encoder_proj(h), h_len

    def estimate_cfg(self, x, mask, mu, t, spks, cond, cfg_rate, lengths=None):
        """One estimator evaluation with the CFM's internal CFG: lanes
        [cond | uncond] stacked on batch (flow_matching.py:105-126)."""
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        mask2 = jnp.concatenate([mask, mask], axis=0)
        mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        len2 = None if lengths is None else jnp.concatenate([lengths, lengths])
        v = self.estimator(x2, mask2, mu2, t2, spks2, cond2, len2)
        v_cond, v_uncond = v[:B], v[B:]
        return (1.0 + cfg_rate) * v_cond - cfg_rate * v_uncond

    def solve_euler(self, z, mu, mask, spks, cond, n_timesteps: int,
                    lengths=None):
        """Fixed-step Euler ODE solve (flow_matching.py:82-133)."""
        c = self.cfg
        t_span = cosine_t_span(n_timesteps).astype(z.dtype)

        if self.is_initializing():
            # flax params cannot be created inside lax control flow; one
            # estimator evaluation materializes them during init.
            t0 = jnp.zeros((z.shape[0],), z.dtype)
            return z + self.estimate_cfg(z, mask, mu, t0, spks, cond,
                                         c.inference_cfg_rate, lengths) * 0.0

        def body(i, x):
            t = jnp.broadcast_to(t_span[i], (x.shape[0],))
            dt = t_span[i + 1] - t_span[i]
            v = self.estimate_cfg(x, mask, mu, t, spks, cond,
                                  c.inference_cfg_rate, lengths)
            return (x + dt * v).astype(x.dtype)

        return jax.lax.fori_loop(0, n_timesteps, body, z)

    def __call__(self, tokens, token_len, prompt_feat, prompt_feat_len,
                 embedding, noise, n_timesteps: int = 10):
        """Full inference path (flow.py:241-288), batched.

        tokens: [B, T] prompt++generated speech tokens (right-padded);
        token_len: [B] total valid tokens;
        prompt_feat: [B, Fp_max, n_mels] reference mels (right-padded);
        prompt_feat_len: [B] valid prompt-mel frames (= 2 * prompt tokens);
        embedding: [B, spk_embed_dim] x-vector;
        noise: [B, 2T, n_mels] noise slice (fixed buffer, temperature-scaled).

        Returns mel [B, 2T, n_mels] — the *full* frame range; the generated
        region for request b is frames [prompt_feat_len[b] : 2*token_len[b]].
        """
        c = self.cfg
        emb = embedding / jnp.maximum(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-12)
        spks = self.spk_embed_affine_layer(emb)

        mu, mel_len = self.encode(tokens, token_len)
        F = mu.shape[1]

        frame_pos = jnp.arange(F)[None, :]
        mask = frame_pos < mel_len[:, None]                    # [B, F]

        # conds: reference mels on the prompt prefix, zero elsewhere
        Fp = prompt_feat.shape[1]
        pf = jnp.pad(prompt_feat, ((0, 0), (0, max(0, F - Fp)), (0, 0)))[:, :F]
        cond = jnp.where(frame_pos[..., None] < prompt_feat_len[:, None, None],
                         pf, 0.0).astype(mu.dtype)

        mel = self.solve_euler(noise[:, :F].astype(mu.dtype), mu, mask,
                               spks, cond, n_timesteps, lengths=mel_len)
        return mel, mel_len


def fixed_noise(n_mels: int, frames: int = MAX_NOISE_FRAMES, seed: int = 1986):
    """Deterministic noise buffer, generated once (mirrors the reference's
    rand_noise registered at CausalConditionalCFM init)."""
    return jax.random.normal(jax.random.PRNGKey(seed), (1, frames, n_mels))
