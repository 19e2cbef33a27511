"""Native checkpoint format: converted param trees saved as flat .npz.

Reference parity (SURVEY §5.4): the reference "checkpoints" are safetensors
weight loads (tts.py:105-117) plus picklable Conditionals (tts.py:31-61).
Here: after the torch->flax conversion runs once, trees are saved flat
(path/to/leaf -> array) so subsequent boots skip conversion; Conditionals
round-trip as npz too (reference example-tts-min-vram.py:22-24 pattern).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

_SEP = "::"


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{_SEP}{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, tree: Any):
    flat = flatten_tree(tree)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str) -> Any:
    with np.load(path, allow_pickle=False) as data:
        return unflatten_tree({k: data[k] for k in data.files})


def save_conditionals(path: str, conds) -> None:
    """Persist a Conditionals dataclass (api/tts.py) as npz."""
    np.savez(path, cond_emb=conds.cond_emb, prompt_token=conds.prompt_token,
             prompt_feat=conds.prompt_feat, embedding=conds.embedding)


def load_conditionals(path: str):
    from ..api.tts import Conditionals
    with np.load(path, allow_pickle=False) as d:
        return Conditionals(cond_emb=d["cond_emb"],
                            prompt_token=d["prompt_token"],
                            prompt_feat=d["prompt_feat"],
                            embedding=d["embedding"])
