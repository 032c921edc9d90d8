"""Model families: frame-batch, streaming, DoA, calibration."""

from .localizer import Localizer, LocalizerParams, localize_frames  # noqa: F401
from .streaming import StreamingLocalizer, StreamState  # noqa: F401
from .doa import DoaEstimator  # noqa: F401
from .calibration import CalibBatch, CalibParams, Calibrator  # noqa: F401
