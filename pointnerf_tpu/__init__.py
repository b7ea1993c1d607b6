"""pointnerf_tpu — a TPU-native neural point-cloud radiance field framework.

Re-designed from scratch for JAX/XLA/Pallas with the capabilities of the Point-NeRF
reference implementation (CVPR 2022). See SURVEY.md at the repo root for the layer map
and reference anchors.
"""

__version__ = "0.1.0"

from .config import Options, nerf_synth_preset  # noqa: F401

# Persistent XLA compilation cache: TPU compiles of the full train step run
# tens of seconds (worse through a remote compile service); cache them across
# processes. The directory is keyed by the host CPU (utils/cache.py) because
# XLA:CPU AOT entries from a different machine SIGILL on load. Set
# JAX_COMPILATION_CACHE_DIR to override, empty to disable.
import os as _os

from .utils.cache import compile_cache_dir as _ccd

_cache = _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _ccd())
if _cache:
    _os.makedirs(_cache, exist_ok=True)
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
