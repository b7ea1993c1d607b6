"""pointnerf_tpu — a TPU-native neural point-cloud radiance field framework.

Re-designed from scratch for JAX/XLA/Pallas with the capabilities of the Point-NeRF
reference implementation (CVPR 2022). See SURVEY.md at the repo root for the layer map
and reference anchors.
"""

__version__ = "0.1.0"

from .config import Options, nerf_synth_preset  # noqa: F401
