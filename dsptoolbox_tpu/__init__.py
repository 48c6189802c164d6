"""dsptoolbox_tpu — a TPU-native DSP / audio-acoustics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`nico-franco-gomez/dsptoolbox`: signal containers, filter design &
application, spectral estimation, transfer-function measurement, room
acoustics, filter banks, transforms, beamforming, effects, generators and
distance measures — redesigned for TPU (static shapes, functional transforms,
channels-first device arrays, compile-time window/design precomputation,
sharding over device meshes).
"""

from ._config import default_complex, default_float, set_default_float
from .standard.enums import (
    BiquadEqType,
    FadeType,
    FilterBankMode,
    FilterCoefficientsType,
    FilterPassType,
    FrequencySpacing,
    IirDesignMethod,
    InterpolationDomain,
    InterpolationEdgeHandling,
    InterpolationScheme,
    MagnitudeNormalization,
    SpectrumMethod,
    SpectrumScaling,
    SpectrumType,
    Window,
)

__version__ = "0.1.0"
