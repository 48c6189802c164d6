"""ImpulseResponse: Signal subclass with FFT spectrum and a time window.

Behavioral reference: `dsptoolbox/classes/impulse_response.py`.
"""

from __future__ import annotations

from copy import deepcopy

import jax.numpy as jnp
import numpy as np

from ..helpers.gain_and_level import to_db
from ..helpers.spectrum_utilities import get_exact_gain_1khz
from ..standard.enums import MagnitudeNormalization, SpectrumMethod
from .signal import Signal


class ImpulseResponse(Signal):
    """IR container: spectrum method forced to FFT, window-aware plotting
    (`classes/impulse_response.py:22-67`)."""

    def __init__(
        self,
        path: str | None = None,
        time_data=None,
        sampling_rate_hz: int | None = None,
        constrain_amplitude: bool = True,
        activate_cache: bool = False,
    ):
        super().__init__(
            path,
            time_data,
            sampling_rate_hz,
            constrain_amplitude=constrain_amplitude,
            activate_cache=activate_cache,
        )
        self.spectrum_method = SpectrumMethod.FFT

    @staticmethod
    def from_signal(signal: Signal) -> "ImpulseResponse":
        ir = ImpulseResponse(
            None,
            signal.time_data_jax,  # device-resident, no host round trip
            signal.sampling_rate_hz,
            signal.constrain_amplitude,
        )
        ir.calibrated_signal = signal.calibrated_signal
        if signal.is_complex_signal:
            ir.time_data_imaginary = signal._time_data_imag
        return ir

    @staticmethod
    def from_file(path: str) -> "ImpulseResponse":
        return ImpulseResponse.from_signal(Signal.from_file(path))

    @staticmethod
    def from_time_data(
        time_data,
        sampling_rate_hz: int,
        constrain_amplitude: bool = True,
    ) -> "ImpulseResponse":
        return ImpulseResponse.from_signal(
            Signal.from_time_data(
                time_data, sampling_rate_hz, constrain_amplitude
            )
        )

    def set_window(self, window: np.ndarray) -> "ImpulseResponse":
        """Attach the time window used to produce this IR
        (`classes/impulse_response.py:139-152`)."""
        assert window.shape == self.time_data_jax.shape, (
            f"{window.shape} does not match shape {self.time_data_jax.shape}"
        )
        self.window = window
        return self

    def plot_time(self):
        """Waveforms with the window overlaid when present."""
        fig, ax = super().plot_time()
        if hasattr(self, "window"):
            mx = np.max(np.abs(self.time_data), axis=0)
            for n in range(self.number_of_channels):
                ax[n].plot(
                    self.time_vector_s, self.window[:, n] * mx[n], alpha=0.75
                )
        return fig, ax

    def plot_spl(
        self,
        normalize_at_peak: bool = False,
        dynamic_range_db: float | None = 100.0,
        window_length_s: float = 0.0,
    ):
        fig, ax = super().plot_spl(
            normalize_at_peak, dynamic_range_db, window_length_s
        )
        peak_values = np.asarray(
            to_db(np.max(np.abs(self.time_data), axis=0), True)
        )
        max_values = (
            peak_values + 1
            if not normalize_at_peak
            else np.ones(self.number_of_channels)
        )
        if hasattr(self, "window"):
            for n in range(self.number_of_channels):
                ax[n].plot(
                    self.time_vector_s,
                    np.asarray(
                        to_db(
                            self.window[:, n] / 1.1,
                            True,
                            dynamic_range_db=500,
                        )
                    )
                    + max_values[n],
                    alpha=0.75,
                )
        return fig, ax

    def plot_bode(
        self,
        range_hz=[20, 20e3],
        normalize: MagnitudeNormalization = MagnitudeNormalization.NoNormalization,
        range_db=None,
        show_group_delay: bool = False,
        range_rad_s=None,
        smoothing: int = 0,
        remove_ir_latency=None,
    ):
        """Bode plot: magnitude + phase (or group delay)
        (`classes/impulse_response.py:236-357`)."""
        import jax.numpy as jnp

        from ..plots import general_plot_two_axes
        from ..standard.backend import group_delay_direct

        prior = self.spectrum_smoothing
        self.spectrum_smoothing = smoothing
        f, sp = self.get_spectrum()
        self.spectrum_smoothing = prior
        sp = np.asarray(sp)
        sp_abs = np.abs(sp)

        if normalize == MagnitudeNormalization.OneKhz:
            sp_abs = sp_abs / np.asarray(get_exact_gain_1khz(f, sp_abs))[None]
        elif normalize == MagnitudeNormalization.OneKhzFirstChannel:
            sp_abs = sp_abs / float(get_exact_gain_1khz(f, sp_abs[:, 0]))
        elif normalize == MagnitudeNormalization.Max:
            sp_abs = sp_abs / np.max(sp_abs, axis=0, keepdims=True)
        elif normalize == MagnitudeNormalization.MaxFirstChannel:
            sp_abs = sp_abs / np.max(sp_abs[:, 0], axis=0)
        elif normalize == MagnitudeNormalization.Energy:
            sp_abs = sp_abs / np.mean(sp_abs**2.0, axis=0, keepdims=True) ** 0.5
        elif normalize == MagnitudeNormalization.EnergyFirstChannel:
            sp_abs = sp_abs / np.mean(sp_abs[:, 0] ** 2.0, axis=0) ** 0.5
        elif normalize != MagnitudeNormalization.NoNormalization:
            raise ValueError("No valid normalization value")

        phase = np.angle(sp)
        if remove_ir_latency is not None:
            from ..helpers.latency import (
                fractional_latency,
                get_fractional_impulse_peak_index,
                remove_ir_latency_from_phase,
            )

            if isinstance(remove_ir_latency, str):
                mode = remove_ir_latency.lower()
                if mode == "peak":
                    lat = get_fractional_impulse_peak_index(self.time_data)
                elif mode == "min_phase":
                    from ..helpers.minimum_phase import (
                        min_phase_ir_from_real_cepstrum,
                    )

                    min_ir = np.asarray(
                        min_phase_ir_from_real_cepstrum(
                            jnp.asarray(self.time_data.T), 8
                        )
                    ).T
                    lat = fractional_latency(self.time_data, min_ir, 1)
                else:
                    raise ValueError("No valid latency removal")
            else:
                lat = np.atleast_1d(remove_ir_latency)
            phase = np.asarray(
                remove_ir_latency_from_phase(
                    f, jnp.asarray(phase), lat, self.sampling_rate_hz
                )
            )

        fig, ax = general_plot_two_axes(
            f,
            np.asarray(to_db(sp_abs, True)),
            f,
            (
                np.asarray(group_delay_direct(jnp.asarray(phase), f[1] - f[0]))
                if show_group_delay
                else phase
            ),
            range_x=range_hz,
            range_y1=range_db,
            range_y2=range_rad_s,
            log_x=True,
            labels1=[f"Channel {n}" for n in range(self.number_of_channels)],
            y1label="Magnitude / dB",
            y2label=(
                "Group Delay / s" if show_group_delay else "Phase / rad"
            ),
            y2_linestyle="dashed",
            y2_alpha=0.6,
        )
        ax[-1].grid(linestyle="dashed")
        return fig, ax

    def copy_with_new_time_data(self, new_time_data) -> "ImpulseResponse":
        from .signal import DeviceTimeData

        if not isinstance(new_time_data, (jnp.ndarray, DeviceTimeData)):
            new_time_data = np.asarray(new_time_data)
        new_signal = ImpulseResponse.from_time_data(
            new_time_data,
            self.sampling_rate_hz,
            self.constrain_amplitude,
        )
        new_signal.calibrated_signal = self.calibrated_signal
        new_signal.activate_cache = self.activate_cache
        new_signal._spectrum_parameters = deepcopy(self._spectrum_parameters)
        new_signal._spectrogram_parameters = deepcopy(
            self._spectrogram_parameters
        )
        if new_signal.spectrum_method != SpectrumMethod.FFT:
            new_signal.spectrum_method = SpectrumMethod.FFT
        return new_signal
