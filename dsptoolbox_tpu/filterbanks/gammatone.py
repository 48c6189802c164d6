"""Gammatone (Hohmann 2002) auditory filter bank with reconstruction.

Behavioral reference: `dsptoolbox/filterbanks/_filterbank.py:664-841`. The
complex one-pole cascades run through the blocked IIR kernel (complex
coefficients are handled as real/imaginary pairs by the class layer using
complex filtering below).
"""

from __future__ import annotations

import numpy as np

from ..classes.filterbank import FilterBank
from ..classes.multibandsignal import MultiBandSignal
from ..classes.signal import Signal


class GammaToneFilterBank(FilterBank):
    """FilterBank with Hohmann-2002 synthesis (delay/phase/gain corrected
    reconstruction)."""

    def __init__(
        self,
        filters: list,
        info: dict,
        frequencies: np.ndarray,
        coefficients: np.ndarray,
        normalizations: np.ndarray,
    ):
        super().__init__(filters, same_sampling_rate=True, info=info)
        self._frequencies = frequencies
        self._coefficients = coefficients
        self._normalizations = normalizations
        self._delay = 0.004
        self._compute_delays_and_phase_factors()
        self._compute_gains()

    def _compute_delays_and_phase_factors(self):
        """Hohmann 2002, section 4 (`_filterbank.py:704-741`).

        The reference filters a dirac delayed by ``delay_samples + 3``
        through the bank and reads the envelope maximum inside
        ``[:delay_samples + 1]`` — a window that lies entirely before the
        (causal) impulse arrival, so ``idx_max`` is always 0 and the slope
        reduces to ``ir[1] - ir[-1] = -ir[-1]``: the very last tail sample
        of the half-second band IR. That tail underflows in fp32, so
        instead of filtering on device we evaluate the band IR analytically
        in f64: for H(z) = norm·(1 - coeff·z⁻¹)⁻⁴ the impulse response is
        ``norm · C(k+3,3) · coeff^k`` — bit-comparable to the reference's
        f64 sosfilt cascade.
        """
        from scipy.signal import sosfilt as _sosfilt

        delay_samples = int(np.round(self._delay * self.sampling_rate_hz))
        n_samples = self.sampling_rate_hz // 2
        d_imp = delay_samples + 3  # dirac position in the reference
        coeffs = np.asarray(self._coefficients, dtype=np.complex128)

        # idx_max over the all-zero pre-arrival window is always 0
        idx_max = np.zeros(len(coeffs), dtype=int)
        delays = delay_samples - idx_max
        # slopes = ir[1] - ir[-1]; ir[1] = 0 (causal, 1 < d_imp), so only
        # the LAST tail sample of each band IR is needed. The downstream
        # gain iteration does not converge (it oscillates), so the phase
        # factor must match the oracle to f64 rounding — compute the tail
        # by actually running the f64 sosfilt cascade on the dirac like
        # the reference does, not from the closed-form IR.
        dirac = np.zeros(n_samples, dtype=np.complex128)
        dirac[d_imp] = 1.0
        slopes = np.empty(len(coeffs), dtype=np.complex128)
        for bb, filt in enumerate(self.filters):
            ir = _sosfilt(np.asarray(filt.sos), dirac)
            slopes[bb] = ir[1] - ir[-1]
        # parity: for high bands the IR tail underflows, so slopes/|slopes|
        # is 0/0 or denormal — the reference computes the same non-finite
        # phase factors (and emits the same divide warnings, suppressed
        # here; values are identical).
        with np.errstate(over="ignore", invalid="ignore"):
            phase_factors = 1j / (slopes / np.abs(slopes))
        self._delays = delays
        self._phase_factors = phase_factors

    def _compute_gains(self):
        """Iterative gain fitting (`_filterbank.py:743-780`)."""
        z = np.atleast_2d(
            np.exp(2j * np.pi * self._frequencies / self.sampling_rate_hz)
        ).T
        z_conj = np.conjugate(z)
        h_pos = (1 - np.atleast_2d(self._coefficients) / z) ** (
            -4
        ) * np.atleast_2d(self._normalizations)
        h_neg = (1 - np.atleast_2d(self._coefficients) / z_conj) ** (
            -4
        ) * np.atleast_2d(self._normalizations)
        phase_factors = np.atleast_2d(self._phase_factors)
        delays = np.atleast_2d(self._delays)
        # parity: the gain iteration below oscillates rather than
        # converging, so even the multiply ASSOCIATION must match the
        # reference's in-place `h_pos *= pf * z**(-d)` — right product
        # first (`_filterbank.py:768-769`)
        h_pos = h_pos * (phase_factors * z ** (-delays))
        h_neg = h_neg * (phase_factors * np.conjugate(z) ** (-delays))
        h = (h_pos + np.conjugate(h_neg)) / 2
        gains = np.ones((self.number_of_filters, 1))
        for _ in range(100):
            h_fin = np.matmul(h, gains)
            gains /= np.abs(h_fin)
        self._gains = gains.flatten()

    def reconstruct(self, signal: MultiBandSignal) -> Signal:
        """Delay/phase/gain-corrected synthesis
        (`_filterbank.py:783-841`)."""
        condition = all(
            signal.bands[n].is_complex_signal
            for n in range(signal.number_of_bands)
        )
        assert condition, (
            "Not all bands have imaginary time data. Reconstruction cannot "
            "be done"
        )
        shape = (
            signal.number_of_bands,
            signal.bands[0].time_data_jax.shape[0],
            signal.number_of_channels,
        )
        time = np.empty(shape, dtype=np.complex128)
        for ind, b in enumerate(signal.bands):
            time[ind, :, :] = b.time_data + b.time_data_imaginary * 1j
        if time.shape[-1] == 1:
            time = time.squeeze(-1)
        else:
            time = np.moveaxis(time, -1, 1)
        reconstructed_sig = signal.bands[0].copy()
        for bb, (phase_factor, delay, gain) in enumerate(
            zip(self._phase_factors, self._delays, self._gains)
        ):
            time[bb] = (
                np.real(np.roll(time[bb], delay, axis=-1) * phase_factor)
                * gain
            )
        reconstructed_sig.time_data = np.sum(np.real(time), axis=0)
        return reconstructed_sig
