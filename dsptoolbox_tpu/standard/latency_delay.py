"""Latency estimation and (fractional) delays.

Behavioral reference: `dsptoolbox/standard/latency_delay.py`.
"""

from __future__ import annotations

from warnings import warn

import jax.numpy as jnp
import numpy as np

from ..classes import MultiBandSignal, Signal
from ..helpers.latency import correlation_of_latencies, fractional_latency
from ..ops.fft_conv import fft_convolve
from ..ops.pad_trim import pad_trim_axis
from .backend import fractional_delay_filter, latency_integer


def latency(
    in1,
    in2=None,
    polynomial_points: int = 0,
):
    """Latency via the correlation method, optionally sub-sample
    (`standard/latency_delay.py:15-157`). Returns (lags, correlations)."""
    assert polynomial_points >= 0, "Polynomial points has to be at least 0"
    latency_func = (
        latency_integer if polynomial_points == 0 else fractional_latency
    )
    if isinstance(in1, Signal):
        if in2 is not None:
            assert in1.sampling_rate_hz == in2.sampling_rate_hz, (
                "Sampling rates must match"
            )
            assert in1.number_of_channels == in2.number_of_channels, (
                "Number of channels between the two signals must match"
            )
            assert isinstance(in2, Signal), (
                "Both signals must be of type Signal"
            )
            td2 = in2.time_data
        else:
            assert in1.number_of_channels > 1, (
                "Signal must have at least 2 channels to compare"
            )
            td2 = None
        latencies = latency_func(in1.time_data, td2, polynomial_points)
        try:
            correlations = correlation_of_latencies(
                td2 if td2 is not None else in1.time_data[:, :1],
                in1.time_data if td2 is not None else in1.time_data[:, 1:],
                np.round(latencies, 0).astype(int),
            )
        except Exception as e:
            print(e)
            warn(
                "An error occured while computing the correlations. They "
                "are set to 0."
            )
            correlations = np.zeros(len(latencies))
        return latencies, correlations
    if isinstance(in1, MultiBandSignal):
        if in2 is not None:
            assert isinstance(in2, MultiBandSignal), (
                "Both signals must be of type Signal"
            )
            assert in1.sampling_rate_hz == in2.sampling_rate_hz, (
                "Sampling rates must match"
            )
        n_cols = (
            in1.number_of_channels
            if in2 is not None
            else in1.number_of_channels - 1
        )
        dtype = int if polynomial_points == 0 else float
        lags = np.zeros((in1.number_of_bands, n_cols), dtype=dtype)
        correlations = np.zeros((in1.number_of_bands, n_cols))
        for band in range(in1.number_of_bands):
            lags[band, :], correlations[band, :] = latency(
                in1.bands[band],
                in2.bands[band] if in2 is not None else None,
                polynomial_points=polynomial_points,
            )
        return lags, correlations
    raise TypeError("Signals must either be type Signal or MultiBandSignal")


def fractional_delay(
    sig,
    delay_seconds: float,
    channels=None,
    keep_length: bool = False,
    order: int = 30,
    side_lobe_suppression_db: float = 60,
):
    """Kaiser-windowed-sinc fractional delay
    (`standard/latency_delay.py:159-286`); convolution on device."""
    assert delay_seconds >= 0, "Delay must be positive"
    if isinstance(sig, Signal):
        if delay_seconds == 0:
            return sig.copy()
        if sig.is_complex_signal:
            warn(
                "Imaginary time data will be ignored in this function. "
                "Delay it manually by creating another signal object, if "
                "needed."
            )
        delay_samples = delay_seconds * sig.sampling_rate_hz
        T = sig.time_data_jax.shape[0]
        if keep_length:
            assert delay_samples < T, "Delay too large for the given signal"
        if channels is None:
            channels = np.arange(sig.number_of_channels)
        channels = np.atleast_1d(np.asarray(channels).squeeze())
        assert np.all(channels < sig.number_of_channels) and len(
            np.unique(channels)
        ) == len(channels), "There is at least an invalid channel number"

        delay_int, frac_filter = fractional_delay_filter(
            delay_samples, order, side_lobe_suppression_db
        )
        td = sig.time_data_jax  # (T, C)
        full_len = T + len(frac_filter) - 1
        new_td = pad_trim_axis(td, full_len, axis=0)
        delayed = fft_convolve(
            td[:, jnp.asarray(channels)].T,
            jnp.asarray(frac_filter, td.dtype),
        ).T  # (full_len, len(channels))
        new_td = new_td.at[:, jnp.asarray(channels)].set(delayed)

        channels_not = np.setdiff1d(np.arange(td.shape[1]), channels)
        total = delay_int + full_len
        not_delayed_part = pad_trim_axis(
            new_td[:, jnp.asarray(channels_not)]
            if len(channels_not)
            else new_td[:, :0],
            total,
            axis=0,
            in_the_end=True,
        )
        delayed_part = pad_trim_axis(
            new_td[:, jnp.asarray(channels)], total, axis=0, in_the_end=False
        )
        # every column is overwritten below; start from zeros instead of a
        # padded copy of the whole signal
        out = jnp.zeros((total, new_td.shape[1]), new_td.dtype)
        if len(channels_not):
            out = out.at[:, jnp.asarray(channels_not)].set(not_delayed_part)
        out = out.at[:, jnp.asarray(channels)].set(delayed_part)
        if keep_length:
            out = out[:T, :]
        return sig.copy_with_new_time_data(out)
    if isinstance(sig, MultiBandSignal):
        out_sig = sig.copy()
        out_sig.bands = [
            fractional_delay(
                b,
                delay_seconds,
                channels,
                keep_length,
                order,
                side_lobe_suppression_db,
            )
            for b in sig.bands
        ]
        return out_sig
    raise TypeError(
        "Passed signal should be either type Signal or MultiBandSignal"
    )


def delay(
    sig,
    delay_samples: int,
    channels=None,
    keep_length: bool = False,
):
    """Integer delay by zero-padding (`standard/latency_delay.py:288-370`)."""
    if isinstance(sig, Signal):
        if delay_samples == 0:
            return sig.copy()
        T = sig.time_data_jax.shape[0]
        if keep_length:
            assert delay_samples < T, "Delay too large for the given signal"
        if channels is None:
            channels = np.arange(sig.number_of_channels)
        channels = np.atleast_1d(np.asarray(channels).squeeze())
        assert np.all(channels < sig.number_of_channels) and len(
            np.unique(channels)
        ) == len(channels), "There is at least an invalid channel number"
        td = sig.time_data_jax
        channels_not = np.setdiff1d(np.arange(td.shape[1]), channels)
        total = delay_samples + T
        delayed = pad_trim_axis(
            td[:, jnp.asarray(channels)], total, axis=0, in_the_end=False
        )
        out = pad_trim_axis(td, total, axis=0, in_the_end=True)
        if len(channels_not):
            not_delayed = pad_trim_axis(
                td[:, jnp.asarray(channels_not)],
                total,
                axis=0,
                in_the_end=True,
            )
            out = out.at[:, jnp.asarray(channels_not)].set(not_delayed)
        out = out.at[:, jnp.asarray(channels)].set(delayed)
        if keep_length:
            out = out[:T, :]
        return sig.copy_with_new_time_data(np.asarray(out))
    if isinstance(sig, MultiBandSignal):
        out_sig = sig.copy()
        out_sig.bands = [
            delay(b, delay_samples, channels, keep_length) for b in sig.bands
        ]
        return out_sig
    raise TypeError(
        "Passed signal should be either type Signal or MultiBandSignal"
    )
