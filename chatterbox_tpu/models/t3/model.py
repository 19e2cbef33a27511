"""T3: Llama-backbone speech-token LM with CFG dual-lane decoding.

Parity target: reference models/t3/t3.py (T3VllmModel).  The reference smuggles
the CFG uncond stream through vLLM by doubling hidden_size to 2048 and
splitting inside forward (t3.py:742-778); here cond/uncond are explicit batch
lanes [B, 2, ...] flattened to 2B for the backbone, sharing one slot cache
layout.  Differences by design:

  * per-request cfg_scale (reference is engine-global via CHATTERBOX_CFG_SCALE,
    README.md:35) — it's a [B] vector folded into the logits combine;
  * learned *speech* positional embeddings ARE applied during decode (known
    reference gap: README.md:44, t3.py:766) — the decode step knows its
    speech index;
  * prompt assembly is a vectorized gather over [cond | text | SOS] segments,
    so ragged text lengths stay right-padded with a contiguous valid prefix
    (no sentinel-token state machine: t3.py:387-495 exists only because of
    vLLM's batch flattening).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import T3ModelConfig
from .backbone import KVCache, LlamaBackbone
from .cond_enc import T3CondEnc


class T3Model(nn.Module):
    """Full T3 stack: embeddings + cond encoder + Llama trunk + speech head."""
    cfg: T3ModelConfig

    def setup(self):
        cfg = self.cfg
        emb_init = nn.initializers.normal(stddev=0.02)
        self.text_emb = nn.Embed(cfg.text_vocab_size, cfg.hidden_size,
                                 embedding_init=emb_init)
        self.speech_emb = nn.Embed(cfg.speech_vocab_size, cfg.hidden_size,
                                   embedding_init=emb_init)
        # Learned position tables (t3/modules/learned_pos_emb.py; sizes from
        # tts.py:115 — speech table is max_speech_tokens + 2 + 2).
        self.text_pos_emb = nn.Embed(cfg.max_text_tokens + 2, cfg.hidden_size,
                                     embedding_init=emb_init)
        self.speech_pos_emb = nn.Embed(cfg.max_speech_tokens + 4, cfg.hidden_size,
                                       embedding_init=emb_init)
        self.cond_enc = T3CondEnc(cfg)
        self.backbone = LlamaBackbone(cfg)
        self.speech_head = nn.Dense(cfg.speech_vocab_size, use_bias=False)

    # ------------------------------------------------------------------
    # Conditioning (amortized per voice; reference tts.py:215-247)
    # ------------------------------------------------------------------
    def embed_cond_prompt_tokens(self, prompt_tokens):
        """speech_emb + speech_pos_emb of the 150 cond prompt tokens
        (tts.py:238)."""
        T = prompt_tokens.shape[-1]
        return self.speech_emb(prompt_tokens) + self.speech_pos_emb(jnp.arange(T))

    def encode_conditionals(self, speaker_emb, cond_prompt_tokens, emotion_adv):
        prompt_emb = self.embed_cond_prompt_tokens(cond_prompt_tokens)
        return self.cond_enc(speaker_emb, prompt_emb, emotion_adv)

    def init_all(self, speaker_emb, cond_prompt_tokens, emotion_adv,
                 text_ids, text_len):
        """Touch every submodule once so ``model.init`` creates the full
        parameter tree (cond encoder + embeddings + backbone + head)."""
        cond_emb = self.encode_conditionals(speaker_emb, cond_prompt_tokens,
                                            emotion_adv)
        embeds, prompt_len = self.build_prompt_embeds(cond_emb, text_ids, text_len)
        B = text_ids.shape[0]
        cfg_scale = jnp.full((B,), 0.5)
        logits, frozen = self.prefill(embeds, prompt_len, cfg_scale)
        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ring = KVCache.zeros(self.cfg, 2 * B, 4, frozen.k.dtype)
        logits = self.decode_step(toks, jnp.ones((B,), jnp.int32),
                                  prompt_len, frozen, prompt_len, ring,
                                  jnp.int32(0), cfg_scale)[0]
        return logits

    # ------------------------------------------------------------------
    # Prompt assembly
    # ------------------------------------------------------------------
    def build_prompt_embeds(self, cond_emb, text_ids, text_len):
        """Assemble [cond(34) | text + text_pos | SOS + speech_pos(0)] for the
        cond lane and the same with text zeroed for the uncond lane
        (reference t3.py:548-569).

        cond_emb: [B, 34, H]; text_ids: [B, Tt] right-padded; text_len: [B].
        Returns (embeds [B, 2, P, H], prompt_len [B]) with P = 34 + Tt + 1 and
        valid prefix length 34 + text_len + 1 (padding strictly trailing).
        """
        cfg = self.cfg
        B, Tt = text_ids.shape
        H = cfg.hidden_size
        P = cfg.cond_len + Tt + 1

        text_e = self.text_emb(text_ids) + self.text_pos_emb(jnp.arange(Tt))[None]
        cond_emb = cond_emb.astype(text_e.dtype)
        sos = jnp.full((B, 1), cfg.start_speech_token, dtype=text_ids.dtype)
        sos_e = self.speech_emb(sos) + self.speech_pos_emb(jnp.zeros((1,), jnp.int32))[None]

        pos = jnp.arange(P)[None, :]                        # [1, P]
        tlen = text_len[:, None]                            # [B, 1]
        in_cond = pos < cfg.cond_len
        in_text = (pos >= cfg.cond_len) & (pos < cfg.cond_len + tlen)
        is_sos = pos == cfg.cond_len + tlen

        # Gather indices (clamped; invalid lanes masked by the where below).
        cond_idx = jnp.clip(pos, 0, cfg.cond_len - 1)
        text_idx = jnp.clip(pos - cfg.cond_len, 0, Tt - 1)

        cond_part = jnp.take_along_axis(
            cond_emb, jnp.broadcast_to(cond_idx[..., None], (B, P, 1)), axis=1)
        text_part = jnp.take_along_axis(
            text_e, jnp.broadcast_to(text_idx[..., None], (B, P, 1)), axis=1)

        def assemble(text_block):
            out = jnp.where(in_cond[..., None], cond_part, 0.0)
            out = jnp.where(in_text[..., None], text_block, out)
            out = jnp.where(is_sos[..., None], sos_e, out)
            return out

        cond_lane = assemble(text_part)
        uncond_lane = assemble(jnp.zeros_like(text_part))
        embeds = jnp.stack([cond_lane, uncond_lane], axis=1)  # [B, 2, P, H]
        prompt_len = cfg.cond_len + text_len + 1
        return embeds, prompt_len

    # ------------------------------------------------------------------
    # Backbone passes
    # ------------------------------------------------------------------
    def prefill(self, embeds, prompt_len, cfg_scale):
        """Run the prompt through the trunk for both lanes.

        embeds: [B, 2, P, H]; prompt_len: [B].  Returns
        (logits [B, V], block_kv) where block_kv is the stacked
        [L, 2B, H, P, D] K/V of the prompt (lane-major: [b*2 + lane]) — it
        becomes the slots' frozen cache.  Logits are the CFG-combined
        next-token distribution at the SOS slot.
        """
        B, _, P, H = embeds.shape
        x = embeds.reshape(B * 2, P, H)
        positions = jnp.broadcast_to(jnp.arange(P)[None], (B * 2, P))
        lens2 = jnp.repeat(prompt_len, 2)                   # [2B]
        hidden, block_kv = self.backbone(x, positions, lens2, mode="block")
        # hidden state at the SOS position (= prompt_len - 1) predicts token 0
        last_idx = (prompt_len - 1)[:, None, None]
        hidden = hidden.reshape(B, 2, P, -1)
        h_last = jnp.take_along_axis(
            hidden, jnp.broadcast_to(last_idx[..., None], (B, 2, 1, hidden.shape[-1])),
            axis=2)[:, :, 0]                                # [B, 2, H]
        logits = self.cfg_logits(h_last, cfg_scale)
        return logits, block_kv

    def decode_step(self, tokens, speech_idx, global_pos, frozen: KVCache,
                    frozen_len, ring: KVCache, ring_idx, cfg_scale):
        """One decode step for all slots (frozen-prefix + ring attention).

        tokens: [B] previously sampled speech tokens (base vocab space);
        speech_idx: [B] speech position (the i-th generated token is fed at
        speech position i+1; SOS was 0); global_pos: [B] absolute RoPE
        position; frozen: read-only [L, 2B, H, S, D] prefix cache;
        frozen_len: [B] frozen valid length at chunk start; ring: [L, 2B, H,
        C, D] chunk-local cache; ring_idx: scalar chunk step.
        Returns (logits [B, V], new_ring), plus the cond-lane alignment
        attention [B, S] of layer ``align_layer`` when ``align_enabled``.
        """
        B = tokens.shape[0]
        emb = self.speech_emb(tokens) + self.speech_pos_emb(speech_idx)  # [B, H]
        x = jnp.repeat(emb[:, None, :], 2, axis=0).reshape(B * 2, 1, -1)
        positions = jnp.repeat(global_pos, 2)[:, None]
        flen2 = jnp.repeat(frozen_len, 2)
        hidden, new_ring, align = self.backbone(
            x, positions, flen2, mode="decode",
            frozen=frozen, ring=ring, ring_idx=ring_idx)
        h = hidden[:, 0].reshape(B, 2, -1)
        logits = self.cfg_logits(h, cfg_scale)
        if self.cfg.align_enabled:
            return logits, new_ring, align[self.cfg.align_layer, 0::2]
        return logits, new_ring

    def verify_step(self, tokens_block, speech_idx0, global_pos0,
                    frozen: KVCache, frozen_len, ring: KVCache, ring_base,
                    cfg_scale):
        """Multi-token decode for speculative draft/verify (docs/PERF.md):
        feed T tokens per slot at consecutive positions, attending
        frozen[:frozen_len] + committed ring[:ring_base] + a causal
        self-block.  The ring is READ-ONLY; the fed block's K/V is returned
        (head-major [L, 2B, Hkv, T, D]) and the engine commits the accepted
        prefix into the ring once per speculation cycle.

        tokens_block: [B, T] fed tokens (slot 0 = last committed token, then
        the draft proposals); speech_idx0 / global_pos0 / ring_base: [B]
        per-lane bases.  Returns (logits [B, T, V], block_kv) — logits[:, j]
        is the CFG-combined distribution of the token FOLLOWING fed slot j.
        The draft model re-feeds its growing proposal block through this
        same path (extra q-rows are ~free: dense is weight-read-bound and
        the frozen read amortizes over rows)."""
        B, T = tokens_block.shape
        sp_idx = speech_idx0[:, None] + jnp.arange(T)[None, :]
        emb = self.speech_emb(tokens_block) + self.speech_pos_emb(sp_idx)
        x = jnp.repeat(emb, 2, axis=0)                       # [2B, T, H]
        positions = jnp.repeat(global_pos0, 2)[:, None] + \
            jnp.arange(T)[None, :]
        flen2 = jnp.repeat(frozen_len, 2)
        base2 = jnp.repeat(ring_base, 2)
        hidden, block_kv, align = self.backbone(
            x, positions, flen2, mode="verify",
            frozen=frozen, ring=ring, ring_base=base2)
        h = hidden.reshape(B, 2, T, -1)
        logits = self.speech_head(h).astype(jnp.float32)     # [B, 2, T, V]
        cond, uncond = logits[:, 0], logits[:, 1]
        combined = cond + cfg_scale[:, None, None] * (cond - uncond)
        if self.cfg.align_enabled:
            # cond-lane alignment attention of the align layer, per fed
            # token ([B, T, S]) — drives align_stop in the spec commit loop
            return combined, block_kv, align[self.cfg.align_layer, 0::2]
        return combined, block_kv

    def training_forward(self, cond_emb, text_ids, speech_tokens, speech_len,
                         act_constraint=None):
        """Teacher-forced full-sequence forward for training / eval.

        cond_emb: [B, 34, H]; text_ids: [B, Tt] (uniform length — standard
        training padding); speech_tokens: [B, Ts] target speech tokens;
        speech_len: [B] valid speech lengths.  Returns per-token CE loss
        (mean over valid speech positions).

        Sequence layout: [cond | text | SOS | speech[:-1]] predicts
        [speech[0], ..., speech[Ts-1]] at the trailing Ts positions.
        """
        cfg = self.cfg
        B, Tt = text_ids.shape
        Ts = speech_tokens.shape[1]
        P_len = cfg.cond_len + Tt + 1

        text_e = self.text_emb(text_ids) + self.text_pos_emb(jnp.arange(Tt))[None]
        sos = jnp.full((B, 1), cfg.start_speech_token, jnp.int32)
        sos_e = self.speech_emb(sos) + self.speech_pos_emb(
            jnp.zeros((1,), jnp.int32))[None]
        sp_in = speech_tokens[:, :-1]
        sp_e = self.speech_emb(sp_in) + self.speech_pos_emb(
            jnp.arange(1, Ts))[None]

        x = jnp.concatenate([cond_emb.astype(text_e.dtype), text_e, sos_e,
                             sp_e], axis=1)
        if act_constraint is not None:
            # sequence-parallel hint: [B, T, H] -> P(dp, sp, None); XLA
            # all-gathers T around attention and re-shards elementwise work
            x = act_constraint(x)
        T = x.shape[1]
        positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        lens = jnp.full((B,), cfg.cond_len + Tt + 1, jnp.int32) + \
            jnp.maximum(speech_len - 1, 0)
        hidden, _ = self.backbone(x, positions, lens, mode="block")
        logits = self.speech_head(hidden[:, P_len - 1:]).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = jnp.take_along_axis(logp, speech_tokens[..., None], axis=-1)[..., 0]
        mask = (jnp.arange(Ts)[None, :] < speech_len[:, None]).astype(jnp.float32)
        return -(tgt * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    def cfg_logits(self, h_lanes, cfg_scale):
        """CFG combine over the speech head (reference t3.py:725-739):
        logits = cond + cfg_scale * (cond - uncond), per-request scale."""
        logits = self.speech_head(h_lanes).astype(jnp.float32)  # [B, 2, V]
        cond, uncond = logits[:, 0], logits[:, 1]
        return cond + cfg_scale[:, None] * (cond - uncond)
