"""INT8 weight-only quantization for the T3 trunk.

TPU-native replacement for the reference's reliance on FP16 weights +
vLLM's fused CUDA dequant kernels (SURVEY §2.12).  Per-output-channel
symmetric int8: y = (x @ w_q) * scale, with the int8->bf16 convert fused by
XLA into the matmul operand read — halving the dominant per-step HBM traffic
(the 1 GB bf16 trunk read).

The param tree keeps the same topology: each quantized Dense kernel becomes
{"w_q": int8 [in, out], "scale": f32 [out]} under the same module path, so
checkpoint converters stay unchanged (quantize after conversion).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class QuantDense(nn.Module):
    """Drop-in no-bias Dense with int8 weights + per-channel scales.

    act_quant additionally quantizes the activation per row (symmetric
    int8, like the decode-attention QK path, backbone.py) and runs the dot
    as int8 x int8 -> int32 on the MXU — the int8->bf16 weight convert
    disappears and the MXU runs at its doubled int8 rate.  The activation
    quant noise is <=0.4%/element over a >=1024-wide dot; a tolerance test
    (tests/test_ops.py) bounds the end-to-end divergence."""
    features: int
    act_quant: bool = False

    @nn.compact
    def __call__(self, x):
        w_q = self.param("w_q", nn.initializers.zeros,
                         (x.shape[-1], self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        if self.act_quant:
            xf = x.astype(jnp.float32)
            xa = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) + 1e-9
            x8 = jnp.clip(jnp.round(xf / xa * 127.0), -127,
                          127).astype(jnp.int8)
            y32 = jnp.dot(x8, w_q, preferred_element_type=jnp.int32)
            return (y32.astype(jnp.float32) * (xa / 127.0)
                    * scale).astype(x.dtype)
        y = jnp.dot(x, w_q.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)


def quantize_kernel(w: jnp.ndarray):
    """[in, out] float kernel -> (w_q int8, scale f32[out])."""
    w = np.asarray(w, np.float32)
    amax = np.maximum(np.abs(w).max(axis=0), 1e-8)
    scale = (amax / 127.0).astype(np.float32)
    w_q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return w_q, scale


_TRUNK_DENSE = ("q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj")


def quantize_t3_params(params: dict) -> dict:
    """Quantize the Llama trunk kernels of a T3 param tree in place-shape.
    Embeddings / head / norms / cond encoder stay in their float dtype
    (small, and the head benefits from full precision)."""
    import copy
    out = jax.tree.map(lambda x: x, params)  # shallow structural copy
    layers = out["params"]["backbone"]["layers"]
    for grp in ("self_attn", "mlp"):
        for name, leaf in list(layers[grp].items()):
            if name in _TRUNK_DENSE and "kernel" in leaf:
                k = np.asarray(leaf["kernel"], np.float32)  # [L, in, out]
                w_qs, scales = [], []
                for li in range(k.shape[0]):
                    w_q, s = quantize_kernel(k[li])
                    w_qs.append(w_q)
                    scales.append(s)
                layers[grp][name] = {"w_q": jnp.asarray(np.stack(w_qs)),
                                     "scale": jnp.asarray(np.stack(scales))}
    return out


def dequantize_kernel(w_q, scale):
    return np.asarray(w_q, np.float32) * np.asarray(scale)[..., None, :]
