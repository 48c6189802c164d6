"""CalibrationData: SPL calibration from a recorded reference tone.

Behavioral reference: `dsptoolbox/classes/calibration_data.py`.
"""

from __future__ import annotations

import numpy as np

from ..standard.enums import SpectrumMethod, SpectrumScaling
from .multibandsignal import MultiBandSignal
from .signal import Signal


class CalibrationData:
    """Computes per-channel Pascal calibration factors from a recorded
    1 kHz tone at a known dB(SPL) (94/114 dB per IEC 60942)."""

    def __init__(
        self,
        calibration_data,
        calibration_spl_db: float = 94,
        high_snr: bool = True,
    ):
        if isinstance(calibration_data, str):
            calibration_data = Signal(calibration_data, None, None)
        elif isinstance(calibration_data, tuple):
            assert len(calibration_data) == 2, "Tuple must have length 2"
            calibration_data = Signal(
                None, calibration_data[0], calibration_data[1]
            )
        elif isinstance(calibration_data, Signal):
            pass
        else:
            raise TypeError(
                f"{type(calibration_data)} is not a valid type. Use "
                "either str, tuple or Signal"
            )
        self.calibration_signal = calibration_data
        self.calibration_spl_db = calibration_spl_db
        self.high_snr = high_snr
        self.__update = True

    def add_calibration_channel(
        self, new_channel, allow_padding_trimming: bool = False
    ) -> "CalibrationData":
        """Append a calibration channel (path / (data, fs) tuple / Signal)."""
        if isinstance(new_channel, str):
            new_channel = Signal(new_channel, None, None)
        elif isinstance(new_channel, tuple):
            assert len(new_channel) == 2, "Tuple must have length 2"
            new_channel = Signal(None, new_channel[0], new_channel[1])
        elif isinstance(new_channel, Signal):
            pass
        else:
            raise TypeError(
                f"{type(new_channel)} is not a valid type. Use "
                "either str, tuple or Signal"
            )
        self.calibration_signal = self.calibration_signal.copy().add_channel(
            None,
            new_channel.time_data,
            new_channel.sampling_rate_hz,
            allow_padding_trimming=allow_padding_trimming,
        )
        self.__update = True
        return self

    def _compute_calibration_factors(self):
        if self.__update:
            if self.high_snr:
                rms_channels = np.std(
                    self.calibration_signal.time_data, axis=0
                )
            else:
                rms_channels = self._get_rms_from_spectrum()
            p0 = 20e-6
            p_analytical = 10 ** (self.calibration_spl_db / 20) * p0
            self.calibration_factors = p_analytical / rms_channels
            self.__update = False

    def _get_rms_from_spectrum(self):
        self.calibration_signal.set_spectrum_parameters(
            method=SpectrumMethod.FFT,
            scaling=SpectrumScaling.AmplitudeSpectrum,
        )
        f, sp = self.calibration_signal.get_spectrum()
        ind1k = np.argmin(np.abs(f - 1e3))
        return np.abs(np.asarray(sp)[ind1k, :])

    def calibrate_signal(
        self, signal, force_update: bool = False
    ):
        """Return a copy of the signal scaled to Pascal
        (`classes/calibration_data.py:126-178`)."""
        if force_update:
            self.__update = True
        self._compute_calibration_factors()
        if len(self.calibration_factors) > 1:
            assert signal.number_of_channels == len(
                self.calibration_factors
            ), "Number of channels does not match"
            factors = self.calibration_factors
        else:
            factors = (
                np.ones(signal.number_of_channels) * self.calibration_factors
            )
        if isinstance(signal, Signal):
            calibrated = signal.copy()
            calibrated.constrain_amplitude = False
            calibrated.time_data = signal.time_data * factors
            calibrated.calibrated_signal = True
        elif isinstance(signal, MultiBandSignal):
            calibrated = signal.copy()
            new_bands = []
            for b in calibrated.bands:
                nb = b.copy()
                nb.constrain_amplitude = False
                nb.time_data = b.time_data * factors
                nb.calibrated_signal = True
                new_bands.append(nb)
            calibrated.bands = new_bands
        else:
            raise TypeError(
                "signal has not a valid type. Use Signal or MultiBandSignal"
            )
        return calibrated
