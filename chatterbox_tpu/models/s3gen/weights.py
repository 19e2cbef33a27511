"""S3Gen checkpoint loader: s3gen.safetensors (torch layout) -> flax params.

Handles the torch-isms at load time so the TPU graph stays clean:
  * weight-norm convs are folded (w = g * v / ||v||, both old ``weight_g`` /
    ``weight_v`` and new ``parametrizations.weight.original{0,1}`` key styles)
  * BatchNorm running stats are folded to (scale, bias) for the inference-only
    CAMPPlus (xvector.py FoldedBN)
  * torch Conv1d [out, in, k] -> flax [k, in, out]; ConvTranspose1d
    [in, out, k] -> [k, out, in]; Linear [out, in] -> [in, out]

Reference module tree: s3gen/s3gen.py:47-317 (flow.*, mel2wav.*,
speaker_encoder.*, tokenizer.*).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ...config import S3GenConfig


def _lin(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _conv(w):  # [out, in, k] -> [k, in, out]
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(2, 1, 0))


def _convT(w):  # torch ConvTranspose1d [in, out, k] -> [k, out, in]
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(2, 1, 0))


def _conv2d(w):  # [out, in, kh, kw] -> [kh, kw, in, out]
    return np.ascontiguousarray(np.asarray(w, np.float32).transpose(2, 3, 1, 0))


class SD:
    """State-dict accessor that tracks key usage and folds torch-isms."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used = set()

    def has(self, key):
        return self.prefix + key in self.sd

    def raw(self, key):
        full = self.prefix + key
        self.used.add(full)
        return np.asarray(self.sd[full], np.float32)

    def wn_conv(self, base):
        """Weight-norm folded conv kernel in flax layout."""
        if self.has(base + ".weight_g"):
            g, v = self.raw(base + ".weight_g"), self.raw(base + ".weight_v")
        elif self.has(base + ".parametrizations.weight.original0"):
            g = self.raw(base + ".parametrizations.weight.original0")
            v = self.raw(base + ".parametrizations.weight.original1")
        else:
            return _conv(self.raw(base + ".weight"))
        norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                    keepdims=True))
        return _conv(g.reshape(norm.shape) * v / np.maximum(norm, 1e-12))

    def conv(self, base, transposed=False):
        f = _convT if transposed else _conv
        out = {"conv": {"kernel": f(self.raw(base + ".weight"))}}
        if self.has(base + ".bias"):
            out["conv"]["bias"] = self.raw(base + ".bias")
        return out

    def dense(self, base, bias=True):
        out = {"kernel": _lin(self.raw(base + ".weight"))}
        if bias and self.has(base + ".bias"):
            out["bias"] = self.raw(base + ".bias")
        return out

    def ln(self, base):
        return {"scale": self.raw(base + ".weight"),
                "bias": self.raw(base + ".bias")}

    def bn_folded(self, base, eps=1e-5):
        mean = self.raw(base + ".running_mean")
        var = self.raw(base + ".running_var")
        if self.has(base + ".weight"):
            gamma, beta = self.raw(base + ".weight"), self.raw(base + ".bias")
        else:
            gamma, beta = np.ones_like(mean), np.zeros_like(mean)
        scale = gamma / np.sqrt(var + eps)
        return {"scale": scale, "bias": beta - mean * scale}


# ---------------------------------------------------------------------------
# Flow (encoder + estimator)
# ---------------------------------------------------------------------------
def _conformer_layer(s: SD, base: str) -> dict:
    return {
        "self_attn": {
            "linear_q": s.dense(base + ".self_attn.linear_q"),
            "linear_k": s.dense(base + ".self_attn.linear_k"),
            "linear_v": s.dense(base + ".self_attn.linear_v"),
            "linear_out": s.dense(base + ".self_attn.linear_out"),
            "linear_pos": s.dense(base + ".self_attn.linear_pos", bias=False),
            "pos_bias_u": s.raw(base + ".self_attn.pos_bias_u"),
            "pos_bias_v": s.raw(base + ".self_attn.pos_bias_v"),
        },
        "norm_mha": s.ln(base + ".norm_mha"),
        "norm_ff": s.ln(base + ".norm_ff"),
        "w_1": s.dense(base + ".feed_forward.w_1"),
        "w_2": s.dense(base + ".feed_forward.w_2"),
    }


def _encoder_params(s: SD, cfg: S3GenConfig) -> dict:
    p = {
        "embed_linear": s.dense("encoder.embed.out.0"),
        "embed_norm": s.ln("encoder.embed.out.1"),
        "up_embed_linear": s.dense("encoder.up_embed.out.0"),
        "up_embed_norm": s.ln("encoder.up_embed.out.1"),
        "after_norm": s.ln("encoder.after_norm"),
        "pre_lookahead_layer": {
            "conv1": s.conv("encoder.pre_lookahead_layer.conv1"),
            "conv2": s.conv("encoder.pre_lookahead_layer.conv2"),
        },
        "up_layer": {"conv": s.conv("encoder.up_layer.conv")},
    }
    for i in range(cfg.enc_blocks):
        p[f"encoders_{i}"] = _conformer_layer(s, f"encoder.encoders.{i}")
    for i in range(cfg.enc_up_blocks):
        p[f"up_encoders_{i}"] = _conformer_layer(s, f"encoder.up_encoders.{i}")
    return p


def _resnet_params(s: SD, base: str) -> dict:
    def block(b):
        return {"conv": s.conv(b + ".block.0"), "norm": s.ln(b + ".block.2")}
    return {
        "block1": block(base + ".block1"),
        "block2": block(base + ".block2"),
        "mlp": s.dense(base + ".mlp.1"),
        "res_conv": s.conv(base + ".res_conv"),
    }


def _tfmr_params(s: SD, base: str) -> dict:
    return {
        "norm1": s.ln(base + ".norm1"),
        "to_q": s.dense(base + ".attn1.to_q", bias=False),
        "to_k": s.dense(base + ".attn1.to_k", bias=False),
        "to_v": s.dense(base + ".attn1.to_v", bias=False),
        "to_out": s.dense(base + ".attn1.to_out.0"),
        "norm3": s.ln(base + ".norm3"),
        "ff_in": s.dense(base + ".ff.net.0.proj"),
        "ff_out": s.dense(base + ".ff.net.2"),
    }


def _estimator_params(s: SD, cfg: S3GenConfig) -> dict:
    e = SD(s.sd, s.prefix + "decoder.estimator.")
    p = {
        "time_mlp": {"linear_1": e.dense("time_mlp.linear_1"),
                     "linear_2": e.dense("time_mlp.linear_2")},
        "down_0_resnet": _resnet_params(e, "down_blocks.0.0"),
        "down_0_conv": e.conv("down_blocks.0.2"),
        "up_0_resnet": _resnet_params(e, "up_blocks.0.0"),
        "up_0_conv": e.conv("up_blocks.0.2"),
        "final_block": {"conv": e.conv("final_block.block.0"),
                        "norm": e.ln("final_block.block.2")},
        "final_proj": e.conv("final_proj"),
    }
    for j in range(cfg.est_n_blocks):
        p[f"down_0_tfmr_{j}"] = _tfmr_params(e, f"down_blocks.0.1.{j}")
        p[f"up_0_tfmr_{j}"] = _tfmr_params(e, f"up_blocks.0.1.{j}")
    for i in range(cfg.est_mid_blocks):
        p[f"mid_{i}_resnet"] = _resnet_params(e, f"mid_blocks.{i}.0")
        for j in range(cfg.est_n_blocks):
            p[f"mid_{i}_tfmr_{j}"] = _tfmr_params(e, f"mid_blocks.{i}.1.{j}")
    s.used |= e.used
    return p


def _flow_params(s: SD, cfg: S3GenConfig) -> dict:
    f = SD(s.sd, "flow.")
    p = {
        "input_embedding": {"embedding": f.raw("input_embedding.weight")},
        "spk_embed_affine_layer": f.dense("spk_embed_affine_layer"),
        "encoder_proj": f.dense("encoder_proj"),
        "encoder": _encoder_params(f, cfg),
        "estimator": _estimator_params(f, cfg),
    }
    s.used |= f.used
    return p


# ---------------------------------------------------------------------------
# HiFT vocoder
# ---------------------------------------------------------------------------
def _resblock_params(s: SD, base: str, n: int = 3) -> dict:
    p = {}
    for j in range(n):
        p[f"convs1_{j}"] = {"conv": {"kernel": s.wn_conv(f"{base}.convs1.{j}")}}
        p[f"convs2_{j}"] = {"conv": {"kernel": s.wn_conv(f"{base}.convs2.{j}")}}
        if s.has(f"{base}.convs1.{j}.bias"):
            p[f"convs1_{j}"]["conv"]["bias"] = s.raw(f"{base}.convs1.{j}.bias")
            p[f"convs2_{j}"]["conv"]["bias"] = s.raw(f"{base}.convs2.{j}.bias")
        p[f"alpha1_{j}"] = s.raw(f"{base}.activations1.{j}.alpha")
        p[f"alpha2_{j}"] = s.raw(f"{base}.activations2.{j}.alpha")
    return p


def _hift_params(s: SD, cfg: S3GenConfig) -> dict:
    h = SD(s.sd, "mel2wav.")
    p: dict = {"f0_predictor": {}}
    for i in range(5):
        p["f0_predictor"][f"condnet_{i}"] = {
            "conv": {"kernel": h.wn_conv(f"f0_predictor.condnet.{2 * i}"),
                     "bias": h.raw(f"f0_predictor.condnet.{2 * i}.bias")}}
    p["f0_predictor"]["classifier"] = h.dense("f0_predictor.classifier")
    p["m_source_linear"] = h.dense("m_source.l_linear")
    p["conv_pre"] = {"conv": {"kernel": h.wn_conv("conv_pre"),
                              "bias": h.raw("conv_pre.bias")}}
    p["conv_post"] = {"conv": {"kernel": h.wn_conv("conv_post"),
                               "bias": h.raw("conv_post.bias")}}
    for i in range(len(cfg.upsample_rates)):
        # ConvTranspose under weight norm: fold then relayout [in,out,k]->[k,out,in]
        base = f"ups.{i}"
        if h.has(base + ".weight_g"):
            g, v = h.raw(base + ".weight_g"), h.raw(base + ".weight_v")
        elif h.has(base + ".parametrizations.weight.original0"):
            g = h.raw(base + ".parametrizations.weight.original0")
            v = h.raw(base + ".parametrizations.weight.original1")
        else:
            g, v = None, h.raw(base + ".weight")
        if g is not None:
            norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                        keepdims=True))
            v = g.reshape(norm.shape) * v / np.maximum(norm, 1e-12)
        p[f"ups_{i}"] = {"kernel": _convT(v), "bias": h.raw(base + ".bias")}
        p[f"source_downs_{i}"] = {
            "conv": {"kernel": h.wn_conv(f"source_downs.{i}"),
                     "bias": h.raw(f"source_downs.{i}.bias")}}
        p[f"source_resblocks_{i}"] = _resblock_params(
            h, f"source_resblocks.{i}",
            n=len(cfg.source_resblock_dilations[i]))
        for j in range(len(cfg.resblock_kernel_sizes)):
            p[f"resblocks_{i}_{j}"] = _resblock_params(
                h, f"resblocks.{i * len(cfg.resblock_kernel_sizes) + j}")
    s.used |= h.used
    return p


# ---------------------------------------------------------------------------
# CAMPPlus speaker encoder
# ---------------------------------------------------------------------------
def _campplus_params(s: SD) -> dict:
    c = SD(s.sd, "speaker_encoder.")
    head = {
        "conv1": {"kernel": _conv2d(c.raw("head.conv1.weight"))},
        "bn1": c.bn_folded("head.bn1"),
        "conv2": {"kernel": _conv2d(c.raw("head.conv2.weight"))},
        "bn2": c.bn_folded("head.bn2"),
    }
    for li in (1, 2):
        for bi in range(2):
            base = f"head.layer{li}.{bi}"
            blk = {
                "conv1": {"kernel": _conv2d(c.raw(base + ".conv1.weight"))},
                "bn1": c.bn_folded(base + ".bn1"),
                "conv2": {"kernel": _conv2d(c.raw(base + ".conv2.weight"))},
                "bn2": c.bn_folded(base + ".bn2"),
            }
            if c.has(base + ".shortcut.0.weight"):
                blk["shortcut_conv"] = {
                    "kernel": _conv2d(c.raw(base + ".shortcut.0.weight"))}
                blk["shortcut_bn"] = c.bn_folded(base + ".shortcut.1")
            head[f"layer{li}_{bi}"] = blk

    p = {"head": head,
         "tdnn_linear": {"conv": {"kernel": _conv(c.raw("xvector.tdnn.linear.weight"))}},
         "tdnn_bn": c.bn_folded("xvector.tdnn.nonlinear.batchnorm")}

    for bi, num_layers in zip((1, 2, 3), (12, 24, 16)):
        for li in range(num_layers):
            base = f"xvector.block{bi}.tdnnd{li + 1}"
            p[f"block{bi}_tdnnd{li + 1}"] = {
                "nonlinear1_bn": c.bn_folded(base + ".nonlinear1.batchnorm"),
                "linear1": {"kernel": _lin(c.raw(base + ".linear1.weight")[:, :, 0])},
                "nonlinear2_bn": c.bn_folded(base + ".nonlinear2.batchnorm"),
                "cam_layer": {
                    "linear_local": {"conv": {
                        "kernel": _conv(c.raw(base + ".cam_layer.linear_local.weight"))}},
                    "linear1": {"kernel": _lin(c.raw(base + ".cam_layer.linear1.weight")[:, :, 0]),
                                "bias": c.raw(base + ".cam_layer.linear1.bias")},
                    "linear2": {"kernel": _lin(c.raw(base + ".cam_layer.linear2.weight")[:, :, 0]),
                                "bias": c.raw(base + ".cam_layer.linear2.bias")},
                },
            }
        p[f"transit{bi}_bn"] = c.bn_folded(f"xvector.transit{bi}.nonlinear.batchnorm")
        p[f"transit{bi}_linear"] = {
            "kernel": _lin(c.raw(f"xvector.transit{bi}.linear.weight")[:, :, 0])}

    p["out_bn"] = c.bn_folded("xvector.out_nonlinear.batchnorm")
    p["dense_linear"] = {"kernel": _lin(c.raw("xvector.dense.linear.weight")[:, :, 0])}
    p["dense_bn"] = c.bn_folded("xvector.dense.nonlinear.batchnorm")
    s.used |= c.used
    return p


def convert_s3gen_params(sd: Dict[str, np.ndarray], cfg: S3GenConfig) -> dict:
    """Build flax params for S3Gen (flow + mel2wav) from s3gen.safetensors."""
    s = SD(sd)
    params = {"flow": _flow_params(s, cfg), "mel2wav": _hift_params(s, cfg)}
    return {"params": params}


def convert_campplus_params(sd: Dict[str, np.ndarray]) -> dict:
    s = SD(sd)
    return {"params": _campplus_params(s)}
