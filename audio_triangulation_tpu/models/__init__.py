"""Model families: frame-batch, streaming, DoA, calibration, tracking,
learned (neural) localization."""

from .localizer import Localizer, LocalizerParams, localize_frames  # noqa: F401
from .streaming import (  # noqa: F401
    StreamingLocalizer, StreamState, TwoRateStreamingLocalizer)
from .tracked import (  # noqa: F401
    TrackedStreamingLocalizer, TrackedStreamState)
from .doa import DoaEstimator  # noqa: F401
from .calibration import CalibBatch, CalibParams, Calibrator  # noqa: F401
from .tracking import (Tracker, TrackerConfig, TrackState,  # noqa: F401
                       rts_smooth)
from .neural import NeuralLocalizer  # noqa: F401
from .extraction import StreamingExtractor, ExtractorState  # noqa: F401
from .fusion import ArrayFusionLocalizer  # noqa: F401
from .volume import VolumeLocalizer, localize_frames_volume  # noqa: F401
from .mapping import ReflectorMapper, WallEstimate  # noqa: F401
