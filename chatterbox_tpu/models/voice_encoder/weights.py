"""VoiceEncoder checkpoint loader: ve.safetensors -> flax params.

Torch LSTM layout (voice_encoder.py:126-129): weight_ih_l{k} [4H, in],
weight_hh_l{k} [4H, H], bias_ih_l{k} + bias_hh_l{k} (summed — jax scan cell
uses a single bias), gate order (i, f, g, o) preserved.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def convert_voice_encoder_params(sd: Dict[str, np.ndarray]) -> dict:
    p = {}
    for k in range(3):
        p[f"lstm_{k}"] = {
            "w_ih": np.ascontiguousarray(
                np.asarray(sd[f"lstm.weight_ih_l{k}"], np.float32).T),
            "w_hh": np.ascontiguousarray(
                np.asarray(sd[f"lstm.weight_hh_l{k}"], np.float32).T),
            "bias": (np.asarray(sd[f"lstm.bias_ih_l{k}"], np.float32)
                     + np.asarray(sd[f"lstm.bias_hh_l{k}"], np.float32)),
        }
    p["proj"] = {
        "kernel": np.ascontiguousarray(np.asarray(sd["proj.weight"], np.float32).T),
        "bias": np.asarray(sd["proj.bias"], np.float32),
    }
    return {"params": p}
