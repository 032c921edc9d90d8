"""Pure jittable ops: the DSP layer."""

from . import (  # noqa: F401
    beamform,
    caf,
    conditioning,
    dereverb,
    detector,
    echo,
    framing,
    mxu_fft,
    solver,
    srp,
    window,
    xcorr,
)
