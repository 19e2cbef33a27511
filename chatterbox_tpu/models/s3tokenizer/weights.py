"""S3 speech-tokenizer checkpoint loader.

The pretrained speech_tokenizer_v2_25hz weights ship inside the reference's
``s3gen.safetensors`` under ``tokenizer.*`` (the reference's S3Token2Wav owns
``self.tokenizer = S3Tokenizer("speech_tokenizer_v2_25hz")``, s3gen.py:55,
and loads them with the whole s3gen state dict; only the mel-filter/window
buffers are excused, s3tokenizer.py:29).

Every architecture dimension is **derived from the checkpoint shapes** here
(conv widths, layer count, FSMN kernel, FSQ dims, ln_post presence) so a
drift between our S3TokenizerConfig defaults and the published checkpoint
fails loudly at load time instead of silently producing garbage tokens.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from ..s3gen.weights import SD, _conv, _lin
from .model import S3TokenizerConfig

PREFIX = "tokenizer."


def has_s3tokenizer_weights(sd: Dict[str, np.ndarray],
                            prefix: str = PREFIX) -> bool:
    return any(k.startswith(prefix + "encoder.conv1.") for k in sd)


def convert_s3tokenizer_params(
        sd: Dict[str, np.ndarray], prefix: str = PREFIX,
) -> Tuple[dict, S3TokenizerConfig]:
    """torch ``tokenizer.*`` state dict -> (flax params, inferred config)."""
    s = SD(sd, prefix)
    conv1 = s.raw("encoder.conv1.weight")          # [dim, n_mels, 3]
    dim, n_mels = int(conv1.shape[0]), int(conv1.shape[1])
    layer_ids = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(re.escape(prefix) + r"encoder\.blocks\.(\d+)\.", k))
    })
    if not layer_ids or layer_ids != list(range(len(layer_ids))):
        raise ValueError(f"unexpected s3tokenizer block ids: {layer_ids}")
    fsmn = s.raw("encoder.blocks.0.attn.fsmn_block.weight")  # [dim, 1, k]
    pdown = s.raw("quantizer._codebook.project_down.weight")  # [fsq, dim]
    if pdown.shape[1] != dim:
        raise ValueError(f"project_down dim {pdown.shape} vs encoder {dim}")
    # Head count is NOT derivable from any checkpoint shape, and a wrong
    # value changes emitted token ids silently.  The only head count we can
    # vouch for is the published speech_tokenizer_v2_25hz one: dim=1280 ->
    # 20 heads (d_head 64, whisper-large style).  Any other dim must be
    # given a head count explicitly by the caller — refuse to guess.
    if dim == 1280:
        n_heads = 20
    elif dim % 64 == 0 and dim <= 512:
        n_heads = dim // 64  # tiny test configs only
    else:
        raise ValueError(
            f"s3tokenizer checkpoint has encoder dim {dim}, which is not the "
            f"published speech_tokenizer_v2_25hz dim (1280 -> 20 heads); the "
            f"head count cannot be derived from shapes and a wrong guess "
            f"silently corrupts token ids. Construct S3TokenizerConfig "
            f"explicitly for this checkpoint.")
    cfg = S3TokenizerConfig(
        n_mels=n_mels, dim=dim,
        n_heads=n_heads,
        n_layers=len(layer_ids),
        fsmn_kernel=int(fsmn.shape[2]),
        fsq_dims=int(pdown.shape[0]),
        ln_post=s.has("encoder.ln_post.weight"),
    )

    p = {
        "conv1": {"kernel": _conv(conv1),
                  "bias": s.raw("encoder.conv1.bias")},
        "conv2": {"kernel": _conv(s.raw("encoder.conv2.weight")),
                  "bias": s.raw("encoder.conv2.bias")},
        "project_down": s.dense("quantizer._codebook.project_down"),
    }
    if cfg.ln_post:
        p["ln_post"] = s.ln("encoder.ln_post")
    for i in layer_ids:
        b = f"encoder.blocks.{i}"
        p[f"blocks_{i}"] = {
            "attn_ln": s.ln(b + ".attn_ln"),
            "mlp_ln": s.ln(b + ".mlp_ln"),
            "mlp_0": s.dense(b + ".mlp.0"),
            "mlp_2": s.dense(b + ".mlp.2"),
            "attn": {
                "query": s.dense(b + ".attn.query"),
                "key": s.dense(b + ".attn.key", bias=False),
                "value": s.dense(b + ".attn.value"),
                "out": s.dense(b + ".attn.out"),
                "fsmn_block": {
                    "kernel": _conv(s.raw(b + ".attn.fsmn_block.weight"))},
            },
        }
    return {"params": p}, cfg
