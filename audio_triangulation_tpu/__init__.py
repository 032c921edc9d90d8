"""audio_triangulation_tpu — TPU-native acoustic source localization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yuan-xy/Audio-Triangulation (a Raspberry Pi Pico 3-mic TDOA triangulation
firmware): streaming multi-channel ingest, variance-based event detection,
DPSS-windowed frame conditioning, pairwise cross-correlation TDOA (GCC-PHAT
hot path + bit-exact fixed-point validation path), temporally smoothed
correlograms, steered-response-power grid localization, least-squares source
solving, observability/rendering — batched over frames and mic pairs, sharded
over device meshes.
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    GridConfig,
    PipelineConfig,
    ShardingConfig,
    SolverConfig,
    StreamConfig,
    VolumeConfig,
)
from .core import geometry  # noqa: F401
from .models.localizer import Localizer, LocalizerParams, localize_frames  # noqa: F401
from .models.volume import VolumeLocalizer  # noqa: F401

__all__ = [
    "PipelineConfig",
    "GridConfig",
    "SolverConfig",
    "StreamConfig",
    "ShardingConfig",
    "VolumeConfig",
    "VolumeLocalizer",
    "geometry",
    "Localizer",
    "LocalizerParams",
    "localize_frames",
]
