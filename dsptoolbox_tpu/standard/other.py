"""Misc standard functions: VAD, detrend, envelope, dither, filter merging,
spectral difference (reference `dsptoolbox/standard/other.py`)."""

from __future__ import annotations

import pickle
from warnings import warn

import jax.numpy as jnp
import numpy as np

from ..classes import Filter, FilterBank, MultiBandSignal, Signal, Spectrum
from ..helpers.gain_and_level import from_db
from ..helpers.latency import analytic_signal
from ..helpers.other import check_format_in_path
from ..helpers.smoothing import get_smoothing_factor_ema
from ..ops.fft_conv import fft_convolve
from .backend import (
    indices_above_threshold_dbfs,
    indices_above_threshold_dbfs_packed,
)
from .enums import FilterBankMode, FilterCoefficientsType, InterpolationDomain, SpectrumType


def load_pkl_object(path: str):
    """Unpickle a saved object (`standard/other.py:33-53`)."""
    path = check_format_in_path(path, "pkl")
    with open(path, "rb") as inp:
        return pickle.load(inp)


def activity_detector(
    signal: Signal,
    threshold_dbfs: float = -20,
    channel: int = 0,
    relative_to_peak: bool = True,
    pre_filter: Filter | None = None,
    attack_time_ms: float = 1,
    release_time_ms: float = 25,
):
    """Power-threshold voice/signal activity detector
    (`standard/other.py:55-180`)."""
    assert isinstance(channel, int), (
        "Channel must be type integer. Function is not implemented for "
        "multiple channels."
    )
    assert threshold_dbfs < 0, "Threshold must be below zero"
    assert release_time_ms >= 0, "Release time must be positive"
    assert attack_time_ms >= 0, "Attack time must be positive"
    parent = signal  # its host mirror caches across repeated calls
    signal = signal.get_channels(channel)
    if pre_filter is not None:
        assert isinstance(pre_filter, Filter), (
            "pre_filter must be of type Filter"
        )
        signal_filtered = pre_filter.filter_signal(signal, zero_phase=True)
    else:
        signal_filtered = signal
    attack_coeff = get_smoothing_factor_ema(
        attack_time_ms / 1e3, signal.sampling_rate_hz
    )
    release_coeff = get_smoothing_factor_ema(
        release_time_ms / 1e3, signal.sampling_rate_hz
    )
    # The mask is computed on device and fetched bit-packed (8x smaller);
    # the compaction below runs on the host against the (cached) host
    # copy of the time data — a boolean gather has data-dependent output
    # shape, so it cannot stay in a device program anyway.
    T = signal_filtered.length_samples
    packed = indices_above_threshold_dbfs_packed(
        signal_filtered.time_data_jax[:, 0],
        threshold_dbfs=threshold_dbfs,
        attack_smoothing_coeff=attack_coeff,
        release_smoothing_coeff=release_coeff,
        normalize=relative_to_peak,
    )
    signal_indices = np.unpackbits(np.asarray(packed))[:T].astype(bool)
    noise_indices = ~signal_indices
    detected_sig = signal.copy()
    noise = signal.copy()
    detected_sig.clear_time_window()
    noise.clear_time_window()
    # fetch through the PARENT's mirror: it persists across calls, so
    # repeated detections on the same signal skip the big host transfer
    td_host = np.asarray(parent.time_data)[:, [channel]]
    if signal_indices.any():
        detected_sig.time_data = td_host[signal_indices, 0]
    else:
        warn(
            "No detected activity, threshold might be too high. Detected "
            "signal will be a vector filled with zeroes"
        )
        detected_sig.time_data = np.zeros(500)
    if noise_indices.any():
        noise.time_data = td_host[noise_indices, 0]
    else:
        warn(
            "No detected noise, threshold might be too low. Noise will be "
            "a vector filled with zeroes"
        )
        noise.time_data = np.zeros(500)
    others = dict(
        noise=noise,
        signal_indices=signal_indices,
        noise_indices=noise_indices,
    )
    return detected_sig, others


def detrend(sig, polynomial_order: int = 0):
    """Polynomial detrending (`standard/other.py:182-213`). The projection
    matrix is static given (length, order) → one device matmul."""
    if isinstance(sig, Signal):
        assert polynomial_order >= 0, "Polynomial order should be positive"
        td = sig.time_data_jax
        T = td.shape[0]
        t = np.arange(T)
        V = np.vander(t, polynomial_order + 1)  # (T, order+1)
        # least-squares projector applied on device
        pinv = np.linalg.pinv(V)  # (order+1, T)
        coeffs = jnp.asarray(pinv, td.dtype) @ td
        trend = jnp.asarray(V, td.dtype) @ coeffs
        return sig.copy_with_new_time_data(np.asarray(td - trend))
    if isinstance(sig, MultiBandSignal):
        out = sig.copy()
        out.bands = [detrend(b, polynomial_order) for b in sig.bands]
        return out
    raise TypeError("Pass either a Signal or a MultiBandSignal")


def envelope(
    signal,
    analytic: bool = True,
    window_length_samples: int | None = None,
):
    """Hilbert or windowed-RMS envelope (`standard/other.py:215-285`)."""
    if isinstance(signal, Signal):
        signal = detrend(signal, 1)
        td = signal.time_data_jax
        if analytic:
            from .._config import run_jitted_complex

            return np.asarray(
                run_jitted_complex(
                    lambda v: jnp.abs(analytic_signal(v, axis=0)), td
                )
            )
        assert window_length_samples is not None, (
            "Some window length must be passed"
        )
        assert window_length_samples > 0, (
            "Window length must be more than 1 sample"
        )
        h = jnp.ones(window_length_samples, td.dtype) / window_length_samples
        sq = fft_convolve(td.T**2, h)[..., : td.shape[0]].T
        return np.asarray(jnp.sqrt(jnp.clip(sq, min=0)))
    if isinstance(signal, MultiBandSignal):
        assert signal.same_sampling_rate, (
            "This is only available for constant sampling rate bands"
        )
        out = np.zeros(
            (
                len(signal.bands[0]),
                signal.number_of_bands,
                signal.number_of_channels,
            )
        )
        for ind, b in enumerate(signal.bands):
            out[:, ind, :] = envelope(
                b, analytic=analytic, window_length_samples=window_length_samples
            )
        return out
    raise TypeError("Signal must be type Signal or MultiBandSignal")


def dither(
    s: Signal,
    triangular_distribution: bool = True,
    epsilon: float = float(np.finfo(np.float16).smallest_subnormal),
    noise_shaping_filterbank: FilterBank | None = None,
    truncate: bool = False,
) -> Signal:
    """Dither noise (+ optional noise shaping / truncation)
    (`standard/other.py:287-364`)."""
    shape = s.time_data_jax.shape
    if not triangular_distribution:
        noise = np.random.uniform(-epsilon / 2, epsilon / 2, size=shape)
    else:
        noise = np.random.uniform(
            -epsilon / 2, epsilon / 2, size=shape
        ) + np.random.uniform(-epsilon / 2, epsilon / 2, size=shape)
    if noise_shaping_filterbank is not None:
        noise_s = Signal(None, noise, s.sampling_rate_hz)
        noise_s = noise_shaping_filterbank.filter_signal(
            noise_s, mode=FilterBankMode.Sequential
        )
        noise = noise_s.time_data
    if truncate:
        return s.copy_with_new_time_data(
            (s.time_data + noise).astype(np.float16).astype(np.float64)
        )
    return s.copy_with_new_time_data(s.time_data + noise)


def merge_filters(filters) -> Filter:
    """Convolve FIRs / concatenate SOS into one filter
    (`standard/other.py:367-406`)."""
    filts = filters.filters if isinstance(filters, FilterBank) else filters
    assert len(filts) > 1, "There must be at least two filters to combine"
    assert all(
        filts[0].sampling_rate_hz == f.sampling_rate_hz for f in filts
    ), "Sampling rates do not match"
    if filts[0].is_fir:
        assert all(f.is_fir for f in filts), "Some filter is not FIR"
        b = filts[0].ba[0].copy()
        for ind in range(1, len(filts)):
            b = np.convolve(b, filts[ind].ba[0], mode="full")
        return Filter.from_ba(b, [1.0], filts[0].sampling_rate_hz)
    assert all(f.is_iir for f in filts), "Some filter is not IIR"
    sos = filts[0].get_coefficients(FilterCoefficientsType.Sos)
    for ind in range(1, len(filts)):
        sos = np.concatenate(
            [sos, filts[ind].get_coefficients(FilterCoefficientsType.Sos)],
            axis=0,
        )
    return Filter.from_sos(sos, filts[0].sampling_rate_hz)


def spectral_difference(
    input_1,
    input_2,
    octave_fraction_smoothing: float = 0.0,
    energy_normalization: bool = True,
    complex: bool = False,
    dynamic_range_db: float | None = 100.0,
) -> Spectrum:
    """`input_1 / input_2` as a Spectrum (`standard/other.py:408-482`)."""
    assert input_1.number_of_channels == input_2.number_of_channels, (
        "Number of channels does not match"
    )
    if isinstance(input_1, Signal):
        inp1 = Spectrum.from_signal(input_1, complex)
    else:
        if complex:
            assert not input_1.is_magnitude, "Input data should be complex"
        inp1 = input_1.copy()
    if isinstance(input_2, Signal):
        inp2 = Spectrum.from_signal(input_2, complex)
    else:
        if complex:
            assert not input_2.is_magnitude, "Input data should be complex"
        inp2 = input_2.copy()
    if energy_normalization:
        inp1.spectral_data = inp1.spectral_data / inp1.get_energy() ** 0.5
        inp2.spectral_data = inp2.spectral_data / inp2.get_energy() ** 0.5
    if octave_fraction_smoothing != 0:
        inp1.apply_octave_smoothing(octave_fraction_smoothing)
        inp2.apply_octave_smoothing(octave_fraction_smoothing)
    inp2.set_interpolator_parameters(
        InterpolationDomain.MagnitudePhase
        if complex
        else InterpolationDomain.Power
    )
    mag2 = inp2.get_interpolated_spectrum(
        inp1.frequency_vector_hz,
        SpectrumType.Complex if complex else SpectrumType.Magnitude,
    )
    if dynamic_range_db is not None:
        factor = float(from_db(-abs(dynamic_range_db), True))
        if jnp.iscomplexobj(mag2):
            # limit the magnitude, keep the phase
            mag_abs = jnp.abs(mag2)
            floor = jnp.max(mag_abs, axis=0) * factor
            scale = jnp.clip(mag_abs, min=floor) / jnp.where(
                mag_abs == 0, 1.0, mag_abs
            )
            mag2 = mag2 * scale
        else:
            mag2 = jnp.clip(mag2, min=jnp.max(mag2, axis=0) * factor)
    inp1.spectral_data = inp1.spectral_data / mag2
    return inp1
