"""chatterbox-tpu: TPU-native Chatterbox TTS serving engine."""
import os as _os

import jax as _jax

# Persistent XLA compilation cache: the T3 decode buckets + S3Gen graphs
# compile once per machine instead of once per process (measured 126 s -> 3 s
# for a warm entry through the remote-compile path).  Override dir with
# CHATTERBOX_JAX_CACHE; disable with CHATTERBOX_JAX_CACHE=off.
_cache = _os.environ.get("CHATTERBOX_JAX_CACHE")
if _cache != "off":
    _dir = _cache or _os.path.join(
        _os.path.expanduser("~"), ".cache", "chatterbox_tpu", "jax_cache")
    try:
        _os.makedirs(_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

__version__ = "0.1.0"
