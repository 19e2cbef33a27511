"""Device-mesh sharding layout for T3 (tensor + data parallel).

The reference has NO distributed parallelism of its own (SURVEY §2.9 — vLLM's
TP classes exist but are never configured).  This module is the TPU-native
design: a (dp, tp) Mesh over ICI, NamedSharding specs for the Llama trunk
(Megatron-style: qkv/gate/up column-split on tp, o/down row-split), batch
sharded on dp, KV cache sharded (batch -> dp, heads -> tp).  XLA inserts the
psum/all-gather collectives from the sharding propagation — no hand-written
NCCL-style calls.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig, T3ModelConfig


def build_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    """(dp, sp, tp) device mesh.  Multi-host (cfg.dcn_dp > 1): the dp axis
    is laid DCN-major — devices are grouped by process so each host's local
    devices form contiguous (dp_local, sp, tp) blocks and every tp/sp
    collective rides ICI; only dp-axis collectives (gradient all-reduce in
    training, the replicated slot-state in serving) cross DCN."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    dp, sp, tp = cfg.dp, getattr(cfg, "sp", 1), cfg.tp
    if dp * sp * tp != n:
        # auto-layout: fill tp first (ICI-friendly), dp with the rest
        sp = 1
        tp = min(tp if tp > 1 else n, n)
        while n % tp:
            tp -= 1
        dp = n // tp
    dcn = getattr(cfg, "dcn_dp", 1) or 1
    if dcn > 1:
        if dp % dcn:
            raise ValueError(f"dp={dp} not divisible by dcn_dp={dcn}")
        by_proc = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        procs = sorted(by_proc)
        if len(procs) != dcn:
            raise ValueError(
                f"dcn_dp={dcn} but devices span {len(procs)} processes")
        arr = np.stack([
            np.asarray(sorted(by_proc[p], key=lambda d: d.id))
            .reshape(dp // dcn, sp, tp) for p in procs
        ]).reshape(dp, sp, tp)
        return Mesh(arr, cfg.axis_names)
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, cfg.axis_names)


def t3_param_spec(cfg: T3ModelConfig) -> dict:
    """PartitionSpec tree matching T3Model's param tree.

    Trunk layout (leading axis = scanned layer axis, never sharded):
      q/k/v kernels [L, H, heads*hd]  -> split output dim on tp
      o_proj        [L, heads*hd, H]  -> split input dim on tp
      gate/up       [L, H, ffn]       -> split output dim on tp
      down          [L, ffn, H]       -> split input dim on tp
    Embeddings/head are replicated (8k x 1k is small); norms replicated.
    INT8 trunks (ops/quant.py) shard w_q like kernel; per-output scales
    follow the output dim (split for column-parallel, replicated for row).
    """
    if cfg.quant_weights:
        col = {"w_q": P(None, None, "tp"), "scale": P(None, "tp")}
        row = {"w_q": P(None, "tp", None), "scale": P(None, None)}
    else:
        col = {"kernel": P(None, None, "tp")}   # split last (output) dim
        row = {"kernel": P(None, "tp", None)}   # split middle (input) dim
    rep = P()

    def rep_tree(x):
        return jax.tree.map(lambda _: rep, x) if isinstance(x, dict) else rep

    layers = {
        "self_attn": {"q_proj": col, "k_proj": col, "v_proj": col,
                      "o_proj": row},
        "mlp": {"gate_proj": col, "up_proj": col, "down_proj": row},
        "input_layernorm": {"weight": P(None, None)},
        "post_attention_layernorm": {"weight": P(None, None)},
    }
    spec = {
        "text_emb": {"embedding": rep},
        "speech_emb": {"embedding": rep},
        "text_pos_emb": {"embedding": rep},
        "speech_pos_emb": {"embedding": rep},
        "speech_head": {"kernel": P(None, "tp")},
        "backbone": {"layers": layers, "norm": {"weight": rep}},
        "cond_enc": {
            "spkr_enc": {"kernel": rep, "bias": rep},
            "emotion_adv_fc": {"kernel": rep},
            "perceiver": {
                "pre_attention_query": rep,
                "attn": {
                    "norm": {"scale": rep, "bias": rep},
                    "to_q": {"kernel": rep, "bias": rep},
                    "to_k": {"kernel": rep, "bias": rep},
                    "to_v": {"kernel": rep, "bias": rep},
                    "proj_out": {"kernel": rep, "bias": rep},
                },
            },
        },
    }
    return {"params": spec}


def shard_params(params, mesh: Mesh, spec_tree) -> Any:
    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(place, params, spec_tree)


def kv_cache_spec(quantized: bool = False):
    """Packed-heads KV cache: values [L, B2, S, heads * hd] (lanes on dp,
    the folded heads*hd minor dim on tp), scales [L, B2, heads, S] (heads on
    tp).  Returns (value_spec, scale_spec)."""
    return (P(None, "dp", None, "tp"),
            P(None, "dp", "tp", None) if quantized else None)


def batch_spec() -> P:
    return P("dp")


def sharded_vocode_fn(s3gen, mesh: Mesh, n_timesteps: int = 10):
    """Jitted S3Gen vocode with the batch axis sharded over the mesh's dp
    axis (params replicated) — S3Gen is 82% of the reference's runtime
    (README.md:152-153) and batch-parallel by construction, so data
    parallelism over the vocode batch is the config-5 sharding
    (BASELINE.json: "tensor-sharded T3 + S3Gen across a multi-host v5e
    slice").  Every conv/attention inside flow+HiFT partitions trivially
    along batch; XLA inserts no collectives beyond the output gather.

    Returns fn(params, tokens, token_len, prompt_feat, prompt_feat_len,
    embedding, noise, rngs) -> (wav, wav_len); the batch must divide the
    dp axis size."""
    data = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    def fn(params, tokens, token_len, prompt_feat, prompt_feat_len,
           embedding, noise, rngs):
        args = (tokens, token_len, prompt_feat, prompt_feat_len,
                embedding, noise, rngs)
        args = tuple(jax.lax.with_sharding_constraint(a, data)
                     for a in args)
        return s3gen.apply(params, *args, n_timesteps=n_timesteps)

    data7 = jax.tree.map(lambda _: data, tuple(range(7)))
    return jax.jit(fn, in_shardings=(rep,) + data7,
                   out_shardings=(data, data))
