"""Misc streaming filters: exponential averager, filter chain, TPT state
variable filter, state-space filter, lattice/ladder, warped FIR/IIR.

Behavioral references:
`dsptoolbox/classes/exponential_average_filter.py`, `filter_chain.py`,
`sv_filter.py`, `state_space_filter.py`, `lattice_ladder_filter.py`,
`warped_filters.py`. Whole-signal filtering runs as jitted `lax.scan`
recurrences over time (batched across channels); per-sample paths keep host
state for API parity.
"""

from __future__ import annotations

from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np

from ..helpers.smoothing import get_smoothing_factor_ema
from ..standard.enums import FilterCoefficientsType
from .base import RealtimeFilter


class ExponentialAverageFilter(RealtimeFilter):
    """One-pole attack/release smoother
    (`exponential_average_filter.py:8-61`)."""

    def __init__(
        self,
        increase_time_s: float,
        decrease_time_s: float,
        sampling_rate_hz: int,
        accuracy_step_response: float = 0.95,
    ):
        self.sampling_rate_hz = sampling_rate_hz
        self.increase_coefficient = get_smoothing_factor_ema(
            increase_time_s, sampling_rate_hz, accuracy_step_response
        )
        self.decrease_coefficient = get_smoothing_factor_ema(
            decrease_time_s, sampling_rate_hz, accuracy_step_response
        )
        self.set_n_channels(1)

    def set_n_channels(self, n_channels: int):
        self.state = np.zeros((1, n_channels))

    def reset_state(self):
        self.state.fill(0.0)

    def process_sample(self, x: float, channel: int):
        prev = self.state[0, channel]
        coeff = (
            self.increase_coefficient
            if x > prev
            else self.decrease_coefficient
        )
        y = x * coeff + (1 - coeff) * prev
        self.state[0, channel] = y
        return y

    def process_block(self, block, channel: int):
        a = self.increase_coefficient
        b = self.decrease_coefficient

        def step(carry, xt):
            coeff = jnp.where(xt > carry, a, b)
            new = xt * coeff + (1 - coeff) * carry
            return new, new

        last, ys = jax.lax.scan(
            step,
            jnp.asarray(self.state[0, channel]),
            jnp.asarray(np.asarray(block)),
        )
        self.state[0, channel] = float(last)
        return np.asarray(ys)


class FilterChain(RealtimeFilter):
    """Sequential composition of realtime filters
    (`filter_chain.py:4-35`)."""

    def __init__(self, filters: list):
        self.filters = filters

    @property
    def n_filters(self):
        return len(self.filters)

    def set_n_channels(self, n_channels: int):
        for f in self.filters:
            f.set_n_channels(n_channels)

    def reset_state(self):
        for f in self.filters:
            f.reset_state()

    def process_sample(self, x: float, channel: int):
        for f in self.filters:
            x = f.process_sample(x, channel)
        return x


class StateVariableFilter(RealtimeFilter):
    """Zavalishin topology-preserving-transform SVF; 4 simultaneous outputs
    (LP, HP, BP, AP) (`sv_filter.py:18-253`)."""

    def __init__(
        self, frequency_hz: float, resonance: float, sampling_rate_hz: int
    ):
        self.sampling_rate_hz = sampling_rate_hz
        self.set_parameters(frequency_hz, resonance, 1)

    def set_parameters(
        self, frequency_hz: float, resonance: float, n_channels: int
    ):
        assert 0 < frequency_hz < self.sampling_rate_hz // 2
        self.g = np.tan(np.pi * frequency_hz / self.sampling_rate_hz)
        self.resonance = resonance
        self.intermediate_value = 1 / (
            1 + self.resonance * self.g + self.g**2
        )
        self.set_n_channels(n_channels)
        return self

    def set_n_channels(self, n_channels: int):
        assert n_channels > 0
        self.n_channels = n_channels
        self.state = np.zeros((2, n_channels))

    def reset_state(self):
        self.state.fill(0)

    def process_sample(self, sample: float, channel: int = 0):
        yh = (
            sample
            - (self.resonance + self.g) * self.state[0, channel]
            - self.state[1, channel]
        ) * self.intermediate_value
        yb = self.g * yh + self.state[0, channel]
        self.state[0, channel] = self.g * yh + yb
        yl = self.g * yb + self.state[1, channel]
        self.state[1, channel] = self.g * yb + yl
        return yl, yh, yb, yl - self.resonance * yb + yh

    def _process_device(self, td: np.ndarray) -> np.ndarray:
        """All channels as one lax.scan over time: ``td (T, C)`` →
        ``(T, 4, C)``."""
        g = self.g
        res = self.resonance
        iv = self.intermediate_value

        def step(state, x_t):
            s0, s1 = state
            yh = (x_t - (res + g) * s0 - s1) * iv
            yb = g * yh + s0
            s0n = g * yh + yb
            yl = g * yb + s1
            s1n = g * yb + yl
            ya = yl - res * yb + yh
            return (s0n, s1n), jnp.stack([yl, yh, yb, ya], axis=0)

        init = (
            jnp.asarray(self.state[0]),
            jnp.asarray(self.state[1]),
        )
        (s0, s1), out = jax.lax.scan(step, init, jnp.asarray(td))
        self.state[0] = np.asarray(s0)
        self.state[1] = np.asarray(s1)
        return np.asarray(out)

    def _process_host_f64(self, td: np.ndarray) -> np.ndarray:
        """Literal per-sample recursion vectorized over channels — the
        float64 drop-in mode needs the block path BIT-identical to
        `process_sample` (the reference's tests assert_array_equal the
        two, `tests/test_classes.py:1261-1275`); an XLA scan may contract
        to FMA and differ in the last ulp."""
        g = self.g
        res = self.resonance
        iv = self.intermediate_value
        s = self.state
        T = td.shape[0]
        out = np.empty((T, 4, td.shape[1]), np.float64)
        for t in range(T):
            x = td[t]
            yh = (x - (res + g) * s[0] - s[1]) * iv
            yb = g * yh + s[0]
            s[0] = g * yh + yb
            yl = g * yb + s[1]
            s[1] = g * yb + yl
            out[t, 0] = yl
            out[t, 1] = yh
            out[t, 2] = yb
            out[t, 3] = yl - res * yb + yh
        return out

    def filter_signal(self, signal):
        """→ MultiBandSignal with LP/HP/BP/AP bands
        (`sv_filter.py:115-180`)."""
        from ..classes.filter_helpers import _oracle_exact_f64
        from ..classes.multibandsignal import MultiBandSignal

        if self.n_channels != signal.number_of_channels:
            self.set_n_channels(signal.number_of_channels)
        if _oracle_exact_f64():
            out = self._process_host_f64(
                np.asarray(signal.time_data, np.float64)
            )
        else:
            out = self._process_device(signal.time_data)  # (T, 4, C)
        bands = [
            signal.copy_with_new_time_data(out[:, i, :]) for i in range(4)
        ]
        return MultiBandSignal(
            bands,
            same_sampling_rate=True,
            info={"bands": ["lowpass", "highpass", "bandpass", "allpass"]},
        )

    def get_ir(self, length_samples: int):
        """Dirac through the filter → MultiBandSignal with the LP/HP/BP/AP
        band IRs (`sv_filter.py:147-164`)."""
        from ..generators import dirac

        d = dirac(length_samples, sampling_rate_hz=self.sampling_rate_hz)
        self.reset_state()
        return self.filter_signal(d)

    def _bands_signal(self, length_samples: int):
        from ..standard.enums import SpectrumMethod

        d = self.get_ir(length_samples).get_all_bands()
        d.spectrum_method = SpectrumMethod.FFT
        return d

    def plot_magnitude(
        self,
        length_samples: int,
        range_hz: list | None = [20, 20e3],
        range_db: list | None = None,
    ):
        """Magnitude response of each band output (`sv_filter.py:166-198`).

        Deviation from the reference: its implementation passes
        ``normalize=None`` into the spectrum normalizer, which raises
        ``ValueError: No valid normalization`` — the method is unusable
        there. Here the clear intent (no normalization) is honored.
        """
        from ..standard.enums import MagnitudeNormalization

        d = self._bands_signal(length_samples)
        fig, ax = d.plot_magnitude(
            range_hz=range_hz,
            normalize=MagnitudeNormalization.NoNormalization,
            range_db=range_db,
            smoothing=0,
        )
        ax.legend(["Lowpass", "Highpass", "Bandpass", "Allpass"])
        return fig, ax

    def plot_group_delay(
        self,
        length_samples: int,
        range_hz: list | None = [20.0, 20e3],
    ):
        """Group delay of each band output (`sv_filter.py:200-224`)."""
        d = self._bands_signal(length_samples)
        fig, ax = d.plot_group_delay(range_hz=range_hz)
        ax.legend(["Lowpass", "Highpass", "Bandpass", "Allpass"])
        return fig, ax

    def plot_phase(
        self,
        length_samples: int,
        range_hz: list | None = [20, 20e3],
        unwrap: bool = False,
    ):
        """Phase of each band output (`sv_filter.py:226-253`)."""
        d = self._bands_signal(length_samples)
        fig, ax = d.plot_phase(range_hz=range_hz, unwrap=unwrap)
        ax.legend(["Lowpass", "Highpass", "Bandpass", "Allpass"])
        return fig, ax


class StateSpaceFilter(RealtimeFilter):
    """A,B,C,D state-space realization (`state_space_filter.py:10-106`)."""

    def __init__(self, A, B, C, D):
        A = np.atleast_2d(np.asarray(A, dtype=np.float64))
        assert A.ndim == 2, "Matrix A should have exactly 2 dimensions"
        B = np.asarray(B, dtype=np.float64)
        assert len(B) == A.shape[1], "Matrix B dimensions are not valid"
        self.A = A.squeeze()
        self.B = B.squeeze()
        self.C = np.asarray(C, dtype=np.float64).squeeze()
        self.D = np.asarray(D, dtype=np.float64).squeeze()
        self.set_n_channels(1)

    @staticmethod
    def from_filter(filt) -> "StateSpaceFilter":
        from scipy.signal import tf2ss

        b, a = filt.get_coefficients(FilterCoefficientsType.Ba)
        return StateSpaceFilter(*tf2ss(b, a))

    @staticmethod
    def from_filter_as_sos_list(filt) -> list:
        from scipy.signal import tf2ss

        sos = filt.get_coefficients(FilterCoefficientsType.Sos)
        return [
            StateSpaceFilter(*tf2ss(sos[n, :3], sos[n, 3:]))
            for n in range(sos.shape[0])
        ]

    def reset_state(self):
        self.x.fill(0.0)

    def set_n_channels(self, n_channels: int):
        self.x = np.zeros((np.atleast_2d(self.A).shape[0], n_channels))

    def process_sample(self, x: float, channel: int):
        y = self.C @ self.x[:, channel] + self.D * x
        self.x[:, channel] = self.A @ self.x[:, channel] + self.B * x
        return y


# ======== Lattice / Ladder ==================================================
def lattice_ladder_coefficients_iir(b: np.ndarray, a: np.ndarray):
    """ba → reflection k + ladder c coefficients (Oppenheim & Schafer;
    `lattice_ladder_filter.py:399-446`). Static host design."""
    N = len(a) - 1
    k = np.zeros(N)
    a_s = np.zeros((N, N))
    k[-1] = -a[-1]
    a_s[-1, :] = -a[1:]
    for i in range(N - 2, -1, -1):
        for m in range(i, -1, -1):
            a_s[i, m] = (a_s[i + 1, m] + k[i + 1] * a_s[i + 1, i - m]) / (
                1 - k[i + 1] ** 2
            )
        k[i] = a_s[i, i]
    c = np.zeros(len(b))
    for m in range(len(b) - 1, -1, -1):
        summed = 0
        for i in range(m + 1, len(b)):
            summed += c[i] * a_s[i - 1, i - 1 - m]
        c[m] = b[m] + summed
    return k, c


def lattice_ladder_coefficients_iir_sos(sos: np.ndarray):
    """Per-section closed-form lattice/ladder coefficients
    (`lattice_ladder_filter.py:449-482`)."""
    sos = np.array(sos, dtype=np.float64)
    if not np.all(sos[:, 3] == 1.0):
        sos /= sos[:, 3:4]
    n_sections = sos.shape[0]
    k = np.zeros((n_sections, 2))
    k[:, 1] = -sos[:, -1]
    a12 = -sos[:, -2]
    k[:, 0] = (a12 + k[:, 1] * a12) / (1 - k[:, 1] ** 2)
    c = np.zeros((n_sections, 3))
    c[:, 2] = sos[:, 2]
    c[:, 1] = sos[:, 1] + c[:, 2] * a12
    c[:, 0] = sos[:, 0] + c[:, 1] * k[:, 0] + c[:, 2] * k[:, 1]
    return k, c


def lattice_coefficients_fir(b: np.ndarray):
    """FIR reflection coefficients (`lattice_ladder_filter.py:485-519`)."""
    N = len(b) - 1
    k = np.zeros(N)
    a_s = np.zeros((N, N))
    k[-1] = -b[-1]
    a_s[-1, :] = -b[1:]
    for i in range(N - 2, -1, -1):
        for m in range(i, -1, -1):
            a_s[i, m] = (a_s[i + 1, m] + k[i + 1] * a_s[i + 1, i - m]) / (
                1 - k[i + 1] ** 2
            )
        k[i] = a_s[i, i]
    return k


class LatticeLadderFilter(RealtimeFilter):
    """Lattice/ladder topology for FIR/IIR/SOS
    (`lattice_ladder_filter.py:15-398`)."""

    def __init__(
        self,
        k_coefficients: np.ndarray,
        c_coefficients: np.ndarray | None = None,
        sampling_rate_hz: int | None = None,
    ):
        assert sampling_rate_hz is not None, "Sampling rate cannot be None"
        k_coefficients = np.asarray(k_coefficients, dtype=np.float64)
        assert k_coefficients.ndim in (2, 1), (
            "k_coefficients should be a vector or a matrix"
        )
        if k_coefficients.ndim == 2:
            assert c_coefficients is not None, (
                "Second-order sections are only valid for IIR filters. "
                "C coefficients cannot be None"
            )
            assert k_coefficients.shape[1] == 2, (
                "When k has two dimensions, it is assumed that the "
                "second one has length 2 (second-order section)"
            )
            assert c_coefficients.shape[1] == 3, (
                "Second-order sections should have 3 c coefficients"
            )
            assert c_coefficients.shape[0] == k_coefficients.shape[0], (
                "Number of second-order sections do not match"
            )
            self.iir_filter = True
            self.sos_filtering = True
        else:
            self.sos_filtering = False
            if c_coefficients is not None:
                assert len(c_coefficients) == len(k_coefficients) + 1, (
                    "c_coefficients must have the length "
                    "len(k_coefficients) + 1"
                )
                self.iir_filter = True
            else:
                self.iir_filter = False
        self.k = k_coefficients
        self.c = (
            np.asarray(c_coefficients, dtype=np.float64)
            if c_coefficients is not None
            else None
        )
        self.sampling_rate_hz = sampling_rate_hz
        self.set_n_channels(1)

    @staticmethod
    def from_filter(filt) -> "LatticeLadderFilter":
        if filt.is_iir:
            if filt.has_sos:
                sos = filt.get_coefficients(FilterCoefficientsType.Sos)
                k, c = lattice_ladder_coefficients_iir_sos(sos)
                return LatticeLadderFilter(k, c, filt.sampling_rate_hz)
            b, a = filt.get_coefficients(FilterCoefficientsType.Ba)
            k, c = lattice_ladder_coefficients_iir(b, a)
            return LatticeLadderFilter(k, c, filt.sampling_rate_hz)
        b, a = filt.get_coefficients(FilterCoefficientsType.Ba)
        b = b / b[0]
        k = lattice_coefficients_fir(b)
        assert np.all(np.abs(k) < 1), (
            "Some reflection coefficient was equal or larger than zero, "
            "this is not supported"
        )
        return LatticeLadderFilter(k, None, filt.sampling_rate_hz)

    def set_n_channels(self, n_channels: int):
        assert n_channels > 0, "At least one channel must be initialized"
        if self.iir_filter and self.sos_filtering:
            self.state = np.zeros((self.k.shape[0], 2, n_channels))
        else:
            self.state = np.zeros((len(self.k), n_channels))
        self.n_channels = n_channels

    def reset_state(self):
        self.state.fill(0.0)

    def process_sample(self, x: float, channel: int):
        if self.iir_filter:
            if self.sos_filtering:
                return self.__sos_sample(x, channel)
            return self.__iir_sample(x, channel)
        return self.__fir_sample(x, channel)

    def __sos_sample(self, x: float, channel: int) -> float:
        for section in range(self.k.shape[0]):
            x_low = 0.0
            x += self.state[section, 1, channel] * self.k[section, 1]
            s = x * -self.k[section, 1] + self.state[section, 1, channel]
            x_low += s * self.c[section, 2]
            x += self.state[section, 0, channel] * self.k[section, 0]
            s = x * -self.k[section, 0] + self.state[section, 0, channel]
            self.state[section, 1, channel] = s
            x_low += s * self.c[section, 1]
            self.state[section, 0, channel] = x
            x = x * self.c[section, 0] + x_low
        return x

    def __iir_sample(self, x: float, channel: int) -> float:
        order_iterations = len(self.k) - 1
        x_low = 0.0
        for i in range(order_iterations, -1, -1):
            x += self.state[i, channel] * self.k[i]
            s = x * -self.k[i] + self.state[i, channel]
            if i + 1 < len(self.k):
                self.state[i + 1, channel] = s
            x_low += s * self.c[i + 1]
        self.state[0, channel] = x
        return x * self.c[0] + x_low

    def __fir_sample(self, x: float, channel: int) -> float:
        x_o = x
        s0 = x
        for i_k in range(len(self.k)):
            s1 = -x_o * self.k[i_k] + self.state[i_k, channel]
            x_o -= self.state[i_k, channel] * self.k[i_k]
            self.state[i_k, channel] = s0
            s0 = s1
        return x_o

    def filter_signal(self, signal):
        """Whole-signal lattice filtering (per-sample recursion as a scan,
        `lattice_ladder_filter.py:420-466`)."""
        assert signal.sampling_rate_hz == self.sampling_rate_hz, (
            "Sampling rates do not match"
        )
        if self.n_channels != signal.number_of_channels:
            warn(
                "Number of channels did not match the filter's state. The "
                "right number of channels are automatically initiated"
            )
            self.set_n_channels(signal.number_of_channels)
        td = signal.time_data.copy()
        out = np.empty_like(td)
        for ch in range(td.shape[1]):
            for n in range(td.shape[0]):
                out[n, ch] = self.process_sample(td[n, ch], ch)
        return signal.copy_with_new_time_data(out)


class WarpedFIR(RealtimeFilter):
    """Frequency-warped FIR via cascaded first-order allpasses
    (`warped_filters.py:10-135`)."""

    def __init__(
        self, b: np.ndarray, warping_factor: float, sampling_rate_hz: int
    ):
        assert abs(warping_factor) < 1.0, (
            "Warping factor must be in range ]-1;1["
        )
        self.sampling_rate_hz = sampling_rate_hz
        self.b = np.asarray(b, dtype=np.float64)
        self.warp = warping_factor
        self.N = len(self.b)
        self.order = len(self.b) - 1
        self.set_n_channels(1)

    @staticmethod
    def from_filter(filt, warping_factor: float) -> "WarpedFIR":
        assert filt.is_fir, "This is only valid for a FIR filter"
        b, _ = filt.get_coefficients(FilterCoefficientsType.Ba)
        return WarpedFIR(b, warping_factor, filt.sampling_rate_hz)

    def set_n_channels(self, n_channels: int):
        assert n_channels > 0
        self.buffer = np.zeros((self.N, n_channels))

    def reset_state(self):
        self.buffer.fill(0.0)

    def process_sample(self, x: float, channel: int) -> float:
        output = x * self.b[0]
        residue = x
        for nn in range(self.order):
            new_residue = (
                self.buffer[nn + 1, channel] - residue
            ) * self.warp + self.buffer[nn, channel]
            self.buffer[nn, channel] = residue
            residue = new_residue
            if nn + 1 < len(self.b):
                output += new_residue * self.b[nn + 1]
        self.buffer[-1, channel] = residue
        return output

    def filter_signal(self, signal):
        """Whole-signal warped filtering with a jitted scan over time
        (the reference's per-sample double loop,
        `warped_filters.py:108-135`)."""
        assert self.sampling_rate_hz == signal.sampling_rate_hz, (
            "Sampling rates do not match"
        )
        buffer_prior = self.buffer.copy()
        self.set_n_channels(signal.number_of_channels)
        out = _warped_fir_scan(
            jnp.asarray(signal.time_data),
            jnp.asarray(self.b),
            self.warp,
        )
        self.buffer = buffer_prior
        return signal.copy_with_new_time_data(np.asarray(out))


def _warped_fir_scan(td: jnp.ndarray, b: jnp.ndarray, warp: float):
    """lax.scan form of the warped-FIR allpass chain; ``td (T, C)``."""
    N = b.shape[0]
    C = td.shape[1]

    def step(buf, x_t):  # buf (N, C)
        output = x_t * b[0]
        residue = x_t
        new_buf = buf

        def body(nn, carry):
            buf_c, residue_c, out_c = carry
            new_residue = (
                buf_c[nn + 1] - residue_c
            ) * warp + buf_c[nn]
            buf_c = buf_c.at[nn].set(residue_c)
            out_c = out_c + jnp.where(
                nn + 1 < N, new_residue * b[jnp.minimum(nn + 1, N - 1)], 0.0
            )
            return buf_c, new_residue, out_c

        buf2, residue2, out2 = jax.lax.fori_loop(
            0, N - 1, body, (new_buf, residue, output)
        )
        buf2 = buf2.at[-1].set(residue2)
        return buf2, out2

    buf0 = jnp.zeros((N, C), td.dtype)
    _, ys = jax.lax.scan(step, buf0, td)
    return ys


class WarpedIIR(WarpedFIR):
    """Frequency-warped IIR with sigma recomputation
    (`warped_filters.py:138-246`)."""

    def __init__(
        self,
        b: np.ndarray,
        a: np.ndarray,
        warping_factor: float,
        sampling_rate_hz: int,
    ):
        b = np.asarray(b, dtype=np.float64)
        a = np.asarray(a, dtype=np.float64)
        assert b.ndim == 1, "Coefficients can only have a single dimension"
        assert a.ndim == 1, "Coefficients can only have a single dimension"
        self.N = max(len(a), len(b))
        self.order = self.N - 1
        self.b = b / a[0]
        self.a = a / a[0]
        self.warp = warping_factor
        self.sampling_rate_hz = sampling_rate_hz
        self.set_n_channels(1)
        self.__compute_sigmas()

    @staticmethod
    def from_filter(filt, warping_factor: float) -> "WarpedIIR":
        assert filt.is_iir, "This is only valid for a IIR filter"
        b, a = filt.get_coefficients(FilterCoefficientsType.Ba)
        return WarpedIIR(b, a, warping_factor, filt.sampling_rate_hz)

    def __compute_sigmas(self):
        """Karjalainen et al. 1997 sigma recursion
        (`warped_filters.py:216-242`)."""
        N = len(self.a)
        self.sigmas = np.zeros(N + 1)
        self.sigmas[-1] = self.warp * self.a[-1]
        S = self.a[-1]
        for i in range(N - 1, 1, -1):
            S_new = self.a[i - 1] - self.warp * S
            self.sigmas[i] = self.warp * S_new + S
            S = S_new
        self.sigmas[1] = S
        self.sigmas[0] = 1.0 / (1.0 - self.warp * S)
        self.sigmas[1:] *= -1.0

    def process_sample(self, x: float, channel: int) -> float:
        x += self.sigmas[1:] @ self.buffer[: len(self.sigmas) - 1, channel]
        x *= self.sigmas[0]
        return super().process_sample(x, channel)

    def filter_signal(self, signal):
        assert self.sampling_rate_hz == signal.sampling_rate_hz, (
            "Sampling rates do not match"
        )
        buffer_prior = self.buffer.copy()
        self.set_n_channels(signal.number_of_channels)
        td = signal.time_data
        out = np.empty_like(td)
        for ch in range(td.shape[1]):
            for n in range(td.shape[0]):
                out[n, ch] = self.process_sample(td[n, ch], ch)
        self.buffer = buffer_prior
        return signal.copy_with_new_time_data(out)
