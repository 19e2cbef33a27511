"""T3 checkpoint loader: t3_cfg.safetensors (torch layout) -> flax params.

Key layout follows the reference's partial loads (tts.py:105-117: cond_enc.*,
speech_emb.*, speech_pos_emb.*) and T3VllmModel.load_weights routing
(t3.py:347-379: tfmr.* -> Llama trunk, plus text_emb/text_pos_emb/
speech_head).  Torch Linear weights [out, in] are transposed to flax Dense
kernels [in, out]; the 30 per-layer trunk tensors are stacked on a leading
layer axis for the nn.scan'd backbone.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ...config import T3ModelConfig


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


def _getter(sd, used):
    def get(key, transpose=False, optional=False):
        if key not in sd:
            if optional:
                return None
            raise KeyError(f"T3 checkpoint missing key: {key}")
        used.add(key)
        w = np.asarray(sd[key], np.float32)
        return _t(w) if transpose else w
    return get


def convert_t3_cond_enc(sd: Dict[str, np.ndarray]) -> dict:
    """Flax params for just the conditioning encoder — mirrors the
    reference's partial load (tts.py:105-117 loads only cond_enc.* /
    speech_emb / speech_pos_emb from t3_cfg.safetensors)."""
    return _cond_enc_tree(_getter(sd, set()))


def _cond_enc_tree(get):
    attn = {
        "norm": {"scale": get("cond_enc.perceiver.attn.norm.weight"),
                 "bias": get("cond_enc.perceiver.attn.norm.bias")},
        "to_q": {"kernel": get("cond_enc.perceiver.attn.to_q.weight", True),
                 "bias": get("cond_enc.perceiver.attn.to_q.bias")},
        "to_k": {"kernel": get("cond_enc.perceiver.attn.to_k.weight", True),
                 "bias": get("cond_enc.perceiver.attn.to_k.bias")},
        "to_v": {"kernel": get("cond_enc.perceiver.attn.to_v.weight", True),
                 "bias": get("cond_enc.perceiver.attn.to_v.bias")},
        "proj_out": {"kernel": get("cond_enc.perceiver.attn.proj_out.weight", True),
                     "bias": get("cond_enc.perceiver.attn.proj_out.bias")},
    }
    query = get("cond_enc.perceiver.pre_attention_query")
    if query.ndim == 3:
        query = query[0]
    return {
        "spkr_enc": {"kernel": get("cond_enc.spkr_enc.weight", True),
                     "bias": get("cond_enc.spkr_enc.bias")},
        "emotion_adv_fc": {"kernel": get("cond_enc.emotion_adv_fc.weight", True)},
        "perceiver": {"pre_attention_query": query, "attn": attn},
    }


def convert_t3_params(sd: Dict[str, np.ndarray], cfg: T3ModelConfig,
                      strict: bool = False) -> dict:
    """Build the flax param tree for T3Model from a torch state dict."""
    used = set()
    get = _getter(sd, used)

    p: dict = {}

    # Embeddings + learned positions (tts.py:111-117, t3.py:356-372)
    p["text_emb"] = {"embedding": get("text_emb.weight")}
    p["speech_emb"] = {"embedding": get("speech_emb.weight")}
    p["text_pos_emb"] = {"embedding": get("text_pos_emb.emb.weight")}
    p["speech_pos_emb"] = {"embedding": get("speech_pos_emb.emb.weight")}

    # Conditioning encoder (cond_enc.py:57-123, perceiver.py:116-215)
    p["cond_enc"] = _cond_enc_tree(get)

    # Llama trunk: stack per-layer tensors on axis 0 for nn.scan
    def stacked(fmt, transpose):
        return np.stack([get(fmt.format(i), transpose)
                         for i in range(cfg.n_layers)])

    p["backbone"] = {
        "layers": {
            "self_attn": {
                "q_proj": {"kernel": stacked("tfmr.layers.{}.self_attn.q_proj.weight", True)},
                "k_proj": {"kernel": stacked("tfmr.layers.{}.self_attn.k_proj.weight", True)},
                "v_proj": {"kernel": stacked("tfmr.layers.{}.self_attn.v_proj.weight", True)},
                "o_proj": {"kernel": stacked("tfmr.layers.{}.self_attn.o_proj.weight", True)},
            },
            "mlp": {
                "gate_proj": {"kernel": stacked("tfmr.layers.{}.mlp.gate_proj.weight", True)},
                "up_proj": {"kernel": stacked("tfmr.layers.{}.mlp.up_proj.weight", True)},
                "down_proj": {"kernel": stacked("tfmr.layers.{}.mlp.down_proj.weight", True)},
            },
            "input_layernorm": {"weight": stacked("tfmr.layers.{}.input_layernorm.weight", False)},
            "post_attention_layernorm": {"weight": stacked("tfmr.layers.{}.post_attention_layernorm.weight", False)},
        },
        "norm": {"weight": get("tfmr.norm.weight")},
    }

    p["speech_head"] = {"kernel": get("speech_head.weight", True)}

    unused = set(sd) - used
    # dummy vLLM-facing tensors the TPU build doesn't need
    benign = {k for k in unused if "embed_tokens" in k or "rotary" in k
              or k.endswith("speech_head.bias")}
    leftover = unused - benign
    if leftover and strict:
        raise KeyError(f"Unused T3 checkpoint keys: {sorted(leftover)[:10]}...")
    return {"params": p}
