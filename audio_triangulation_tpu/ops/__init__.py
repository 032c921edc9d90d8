"""Pure jittable ops: the DSP layer."""

from . import (  # noqa: F401
    beamform,
    caf,
    conditioning,
    dereverb,
    detector,
    framing,
    mxu_fft,
    solver,
    srp,
    window,
    xcorr,
)
