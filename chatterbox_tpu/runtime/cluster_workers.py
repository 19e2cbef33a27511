"""Production worker factories for ServingCluster.

Each worker process calls one of these to build its own TTS session; pass
``platform``/``visible_devices`` to pin workers to disjoint chips on a
multi-chip host (JAX state never crosses the process boundary).
"""
import os
from typing import Optional


def make_tts(ckpt_dir: Optional[str] = None, variant: str = "english",
             platform: Optional[str] = None,
             visible_devices: Optional[str] = None, **engine_kwargs):
    if visible_devices is not None:
        os.environ["TPU_VISIBLE_DEVICES"] = str(visible_devices)
    if platform is not None:
        os.environ["JAX_PLATFORMS"] = platform
        import jax
        jax.config.update("jax_platforms", platform)
    from ..api.tts import ChatterboxTTS
    ckpt = ckpt_dir or os.environ.get("CHATTERBOX_CKPT_DIR")
    if ckpt:
        return ChatterboxTTS.from_local(ckpt, variant=variant,
                                        **engine_kwargs)
    return ChatterboxTTS.from_random(variant=variant)
