"""Fixed-pole parallel filter (Bank 2022): parallel SOS + FIR correction.

Behavioral reference: `dsptoolbox/classes/parallel_filter.py`. The LS fit is
host-side (small model matrix); whole-signal filtering runs the parallel SOS
battery through the device kernels.
"""

from __future__ import annotations

import numpy as np
import scipy.signal as sig
from scipy.linalg import lstsq

import jax.numpy as jnp

from ..ops.fft_conv import fft_convolve
from ..ops.iir import sosfilt as jsosfilt
from .base import RealtimeFilter
from .iir_fir import FIRFilter, IIRFilter


class ParallelFilter(RealtimeFilter):
    def __init__(
        self, poles: np.ndarray, n_fir: int, sampling_rate_hz: int
    ):
        assert n_fir >= 0, "n_fir must be at least 0"
        poles = np.asarray(poles)
        assert np.all(np.abs(poles) < 1.0), (
            "At least one pole lies outside the unit circle"
        )
        assert np.all(poles.imag >= 0.0), (
            "Only poles with positive imaginary part are accepted"
        )
        assert np.all(np.abs(poles) > 0.0), (
            "No poles at the origin should be used"
        )
        assert all(
            np.sum(np.isclose(poles, p)) == 1 for p in poles
        ), "Pole multiplicity cannot be more than 1"
        assert sampling_rate_hz > 0, "Sampling rate must be greater than 0"
        self.poles = poles
        self.n_fir = n_fir
        self.sampling_rate_hz = sampling_rate_hz
        self._sos = None
        self._fir_coefficients = np.array([])
        self.set_parameters()

    def set_parameters(
        self, delay_iir_samples: int = 0, fir_offset_ms: float = 0.0
    ):
        assert delay_iir_samples >= 0, "Delay should not be negative"
        self.fir_offset_samples = max(
            1, int(self.sampling_rate_hz * fir_offset_ms / 1e3 + 0.5)
        )
        self.delay_iir_samples = (
            self.n_fir + 1 + self.fir_offset_samples * (self.n_fir - 1)
            if delay_iir_samples is None
            else delay_iir_samples
        )
        return self

    def set_coefficients(self, iir_coefficients: np.ndarray, fir=None):
        assert iir_coefficients.ndim == 2
        assert iir_coefficients.shape[0] == self._sos.shape[0]
        for ss in range(self._sos.shape[0]):
            self._sos[ss, :2] = iir_coefficients[ss, :]
        if fir is not None:
            assert fir.ndim == 1
            self._fir_coefficients = fir
        else:
            self._fir_coefficients = np.array([])
        self.n_fir = len(self._fir_coefficients)
        return self

    @staticmethod
    def _host_f64_spectrum(ir):
        """IR spectrum for the LS fit, computed host-side in f64.

        The fit solves an ill-conditioned lstsq (fitted SOS numerators
        reach ~1e4 with cross-section cancellation), so a backend's fp32
        rfft rounding visibly moves the solution. The reference feeds it
        f64 numpy (`classes/signal.py:906`); mirror that exactly for the
        default FFT-spectrum configuration and fall back to the
        signal's own getter for non-default (Welch/smoothed/physical)
        setups."""
        from ..standard.enums import SpectrumMethod

        p = getattr(ir, "_spectrum_parameters", {})
        scaling = ir.spectrum_scaling
        if (
            ir.spectrum_method == SpectrumMethod.FFT
            and p.get("smoothing", 0) == 0
            and not scaling.has_physical_units()
        ):
            from scipy.fft import next_fast_len

            td = np.asarray(ir.time_data, np.float64)
            n = (
                next_fast_len(ir.length_samples, True)
                if p.get("pad_to_fast_length", True)
                else ir.length_samples
            )
            sp = np.fft.rfft(
                td.real, axis=0, n=n, norm=scaling.fft_norm()
            )
            freqs = np.fft.rfftfreq(n, 1.0 / ir.sampling_rate_hz)
            return freqs, sp
        freqs, sp = ir.get_spectrum()
        return np.asarray(freqs), np.asarray(sp)

    def fit_to_ir(self, ir):
        """Frequency-domain LS fit of SOS numerators + FIR correction
        (`parallel_filter.py:140-235`)."""
        assert ir.number_of_channels == 1, (
            "This is only valid for a single-channel IR"
        )
        freqs, spectrum_channels = self._host_f64_spectrum(ir)
        freqs = freqs[1:]
        spectrum_channels = spectrum_channels[1:]
        fs_hz = ir.sampling_rate_hz

        comp_inds = self.poles.imag != 0
        poles = np.hstack(
            [self.poles, self.poles[comp_inds].conjugate()]
        )
        self._sos = sig.zpk2sos([], poles, 1.0)
        n_sos = self._sos.shape[0]

        n_parameters = n_sos * 3 + self.n_fir
        L = len(freqs)
        M = np.zeros((L, n_parameters), dtype=np.complex128)
        for ind in range(0, n_sos * 3, 3):
            M[:, ind] = sig.sosfreqz(
                self._sos[ind // 3, :][None, :], freqs, fs=fs_hz
            )[1]
            sos_delayed = self._sos[ind // 3, :].copy()
            sos_delayed[0] = 0.0
            sos_delayed[1] = 1.0
            M[:, ind + 1] = sig.sosfreqz(
                sos_delayed[None, :], freqs, fs=fs_hz
            )[1]
            sos_delayed = self._sos[ind // 3, :].copy()
            sos_delayed[0] = 0.0
            sos_delayed[1] = 0.0
            sos_delayed[2] = 1.0
            M[:, ind + 2] = sig.sosfreqz(
                sos_delayed[None, :], freqs, fs=fs_hz
            )[1]
        if self.delay_iir_samples > 0:
            M[:, : n_sos * 3] *= sig.freqz(
                [0.0] * self.delay_iir_samples + [1.0],
                [1.0],
                freqs,
                fs=fs_hz,
            )[1][:, None]
        for n in range(self.n_fir):
            M[:, n_sos * 3 + n] = sig.freqz(
                [0.0] * (n * self.fir_offset_samples) + [1.0],
                [1.0],
                freqs,
                fs=fs_hz,
            )[1]
        M = np.vstack([np.real(M), np.imag(M)])
        spectrum = spectrum_channels[:, 0]
        spectrum = np.hstack([np.real(spectrum), np.imag(spectrum)])
        solution = lstsq(M, spectrum, overwrite_a=True, overwrite_b=True)[0]
        for ind in range(0, n_sos * 3, 3):
            self._sos[ind // 3, 0] = solution[ind]
            self._sos[ind // 3, 1] = solution[ind + 1]
            self._sos[ind // 3, 2] = solution[ind + 2]
        self._fir_coefficients = solution[n_sos * 3 :]
        if self.n_fir > 1 and self.fir_offset_samples > 1:
            ff = np.zeros(
                self.fir_offset_samples * (self.n_fir - 1) + 1
            )
            ff[:: self.fir_offset_samples] = self._fir_coefficients[:-1]
            ff[-1] = self._fir_coefficients[-1]
            self._fir_coefficients = ff
        self._compute_real_time_filters()
        return self

    def _compute_real_time_filters(self):
        self.iir = [
            IIRFilter(self._sos[n, :3], self._sos[n, 3:])
            for n in range(self._sos.shape[0])
        ]
        if len(self._fir_coefficients):
            self.fir = FIRFilter(self._fir_coefficients)
        if self.delay_iir_samples > 0:
            self.iir_delay = FIRFilter(
                np.array(self.delay_iir_samples * [0.0] + [1.0])
            )

    def set_n_channels(self, n_channels: int):
        for f in getattr(self, "iir", []):
            f.set_n_channels(n_channels)
        if hasattr(self, "fir"):
            self.fir.set_n_channels(n_channels)
        if hasattr(self, "iir_delay"):
            self.iir_delay.set_n_channels(n_channels)

    def reset_state(self):
        for f in getattr(self, "iir", []):
            f.reset_state()
        if hasattr(self, "fir"):
            self.fir.reset_state()
        if hasattr(self, "iir_delay"):
            self.iir_delay.reset_state()

    def process_sample(self, x: float, channel: int):
        y = 0.0
        if hasattr(self, "fir"):
            y += self.fir.process_sample(x, channel)
        x_iir = x
        if hasattr(self, "iir_delay"):
            x_iir = self.iir_delay.process_sample(x, channel)
        for f in self.iir:
            y += f.process_sample(x_iir, channel)
        return y

    def filter_signal(self, signal):
        """Parallel SOS battery + FIR on device
        (`parallel_filter.py:263-295`)."""
        assert self.sampling_rate_hz == signal.sampling_rate_hz, (
            "Sampling rates do not match"
        )
        td = signal.time_data
        T = td.shape[0]
        x = jnp.asarray(td.T)  # (C, T)
        if len(self._fir_coefficients):
            output = fft_convolve(
                x, jnp.asarray(self._fir_coefficients, x.dtype)
            )[..., :T]
        else:
            output = jnp.zeros_like(x)
        if self.delay_iir_samples > 0:
            x = jnp.pad(x, ((0, 0), (self.delay_iir_samples, 0)))[:, :T]
        for n_sos in range(self._sos.shape[0]):
            y, _ = jsosfilt(self._sos[n_sos][None, :], x)
            output = output + y
        return signal.copy_with_new_time_data(np.asarray(output.T))

    def get_ir(self, length_samples: int):
        from ..generators import dirac

        d = dirac(length_samples, sampling_rate_hz=self.sampling_rate_hz)
        return self.filter_signal(d)
