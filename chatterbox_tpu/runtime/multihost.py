"""Cross-host request routing for SPMD multi-host serving (SURVEY §5.8).

The sharded engine runs single-program-multi-controller: every host
executes the same `T3Engine.generate` over a mesh that spans processes
(parallel/distributed.py), which requires every host to feed IDENTICAL
request batches.  The reference has no distributed serving at all (vLLM's
NCCL broadcast ships unused, SURVEY §2.9); this module supplies the
missing piece: process 0 owns the external request queue (e.g. its HTTP
frontend) and broadcasts each wave's request payload to all hosts, so
follower hosts need no frontend of their own.

Wire format: one fixed-shape pytree of numpy arrays per wave (ids padded
to ``text_max``), pushed through
``jax.experimental.multihost_utils.broadcast_one_to_all`` — a device
collective over DCN, no side channel to configure.  An empty wave
(n == 0) is the shutdown/idle signal.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .engine import Request


def pack_wave(requests: Sequence[Request], max_batch: int, text_max: int,
              cond_len: int, hidden: int) -> dict:
    """Requests -> fixed-shape numpy pytree (rank-0 side)."""
    n = len(requests)
    if n > max_batch:
        raise ValueError(f"wave of {n} > max_batch {max_batch}")
    out = {
        "n": np.asarray(n, np.int32),
        "text_ids": np.zeros((max_batch, text_max), np.int32),
        "text_len": np.zeros((max_batch,), np.int32),
        "cond_emb": np.zeros((max_batch, cond_len, hidden), np.float32),
        "max_new": np.zeros((max_batch,), np.int32),
        "temperature": np.zeros((max_batch,), np.float32),
        "top_p": np.ones((max_batch,), np.float32),
        "min_p": np.zeros((max_batch,), np.float32),
        "repetition_penalty": np.ones((max_batch,), np.float32),
        "cfg_scale": np.zeros((max_batch,), np.float32),
        "uid": np.full((max_batch,), -1, np.int64),
    }
    for i, r in enumerate(requests):
        L = min(len(r.text_ids), text_max)
        out["text_ids"][i, :L] = np.asarray(r.text_ids[:L], np.int32)
        out["text_len"][i] = L
        out["cond_emb"][i] = np.asarray(r.cond_emb, np.float32)
        out["max_new"][i] = r.max_new_tokens
        out["temperature"][i] = r.temperature
        out["top_p"][i] = r.top_p
        out["min_p"][i] = r.min_p
        out["repetition_penalty"][i] = r.repetition_penalty
        out["cfg_scale"][i] = r.cfg_scale
        out["uid"][i] = -1 if r.uid is None else int(r.uid)
    return out


def unpack_wave(wave: dict) -> List[Request]:
    """Fixed-shape pytree -> Request list (identical on every rank)."""
    n = int(wave["n"])
    reqs = []
    for i in range(n):
        L = int(wave["text_len"][i])
        reqs.append(Request(
            text_ids=np.asarray(wave["text_ids"][i, :L], np.int32),
            cond_emb=np.asarray(wave["cond_emb"][i], np.float32),
            max_new_tokens=int(wave["max_new"][i]),
            temperature=float(wave["temperature"][i]),
            top_p=float(wave["top_p"][i]),
            min_p=float(wave["min_p"][i]),
            repetition_penalty=float(wave["repetition_penalty"][i]),
            cfg_scale=float(wave["cfg_scale"][i]),
            uid=int(wave["uid"][i])))
    return reqs


class MultiHostRouter:
    """Rank 0 feeds waves; every rank receives the identical batch.

    Usage (same code on every host):
        router = MultiHostRouter(max_batch=48, text_max=256,
                                 cond_len=34, hidden=1024)
        while True:
            reqs = router.sync_wave(my_queue.pop() if router.is_leader
                                    else None)
            if reqs is None:        # leader signalled shutdown/idle
                break
            results = engine.generate(reqs)   # SPMD across hosts
            if router.is_leader:
                respond(results)
    """

    def __init__(self, max_batch: int, text_max: int, cond_len: int,
                 hidden: int):
        import jax
        self.max_batch = max_batch
        self.text_max = text_max
        self.cond_len = cond_len
        self.hidden = hidden
        self.is_leader = jax.process_index() == 0

    def sync_wave(self, requests: Optional[Sequence[Request]]
                  ) -> Optional[List[Request]]:
        """Broadcast the leader's wave to all ranks; followers pass None.
        Returns the identical Request list on every rank, or None for an
        empty wave (leader idle/shutdown)."""
        from jax.experimental import multihost_utils
        if self.is_leader:
            wave = pack_wave(requests or [], self.max_batch, self.text_max,
                             self.cond_len, self.hidden)
        else:
            wave = pack_wave([], self.max_batch, self.text_max,
                             self.cond_len, self.hidden)
        wave = multihost_utils.broadcast_one_to_all(wave)
        wave = {k: np.asarray(v) for k, v in wave.items()}
        reqs = unpack_wave(wave)
        return reqs if reqs else None
