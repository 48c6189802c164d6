"""Pad/trim operations on Signals (reference
`dsptoolbox/standard/pad_trim_methods.py`)."""

from __future__ import annotations

import numpy as np

from ..classes import MultiBandSignal, Signal
from ..helpers.gain_and_level import from_db
from ..ops.pad_trim import pad_trim_axis


def pad_trim(
    signal,
    desired_length_samples: int,
    in_the_end: bool = True,
):
    """Pad or trim to an exact length (`pad_trim_methods.py:8-51`)."""
    if isinstance(signal, Signal):
        new_td = np.asarray(
            pad_trim_axis(
                signal.time_data_jax,
                desired_length_samples,
                axis=0,
                in_the_end=in_the_end,
            )
        )
        return signal.copy_with_new_time_data(new_td)
    if isinstance(signal, MultiBandSignal):
        assert signal.same_sampling_rate, (
            "Padding or trimming is not supported for multirate signals"
        )
        new_sig = signal.copy()
        new_sig.bands = [
            pad_trim(b, desired_length_samples, in_the_end)
            for b in signal.bands
        ]
        return new_sig
    raise TypeError("Signal must be of type Signal or MultiBandSignal")


def modify_signal_length(
    signal,
    start_seconds: float | None,
    end_seconds: float | None,
):
    """Add silence / remove samples at the edges
    (`pad_trim_methods.py:53-125`)."""
    if isinstance(signal, Signal):
        assert start_seconds is not None or end_seconds is not None, (
            "At least the start or the end should be modified"
        )
        fs = signal.sampling_rate_hz
        start_samples = (
            0
            if start_seconds is None
            else int(start_seconds * fs + 0.5 * np.sign(start_seconds))
        )
        end_samples = (
            0
            if end_seconds is None
            else int(end_seconds * fs + 0.5 * np.sign(end_seconds))
        )
        if start_samples < 0:
            assert len(signal) > -start_samples, "Trimming is too much"
        if end_samples < 0:
            assert len(signal) > -end_samples, "Trimming is too much"
        if start_samples < 0 and end_samples < 0:
            assert len(signal) > -(start_samples + end_samples), (
                "Trimming is too much"
            )
        td = signal.time_data
        if start_samples >= 0:
            td = np.pad(td, ((start_samples, 0), (0, 0)))
        else:
            td = td[-start_samples:, ...]
        if end_samples >= 0:
            td = np.pad(td, ((0, end_samples), (0, 0)))
        else:
            td = td[:end_samples, ...]
        new_sig = signal.copy()
        new_sig.time_data = td
        return new_sig
    if isinstance(signal, MultiBandSignal):
        new_mb = signal.copy()
        new_mb.bands = [
            modify_signal_length(b, start_seconds, end_seconds)
            for b in signal
        ]
        return new_mb
    raise TypeError("Unsupported type")


def trim_with_level_threshold(
    signal: Signal,
    threshold_db: float,
    at_start: bool = True,
    at_end: bool = True,
):
    """Trim edges below a level threshold
    (`pad_trim_methods.py:127-179`)."""
    assert at_start or at_end, "Either start or end should be trimmed"
    threshold_linear = float(from_db(threshold_db, True))
    above = np.where(np.abs(signal.time_data) >= threshold_linear)
    if at_start:
        start = int(np.min(above[0][: signal.number_of_channels]))
    else:
        start = 0
    if at_end:
        stop = min(
            signal.length_samples,
            int(np.max(above[0][-signal.number_of_channels :])) + 1,
        )
    else:
        stop = signal.length_samples
    return (
        signal.copy_with_new_time_data(signal.time_data[start:stop]),
        start,
        stop,
    )


def trim_with_time_selection(
    signal,
    start_time_s: float | None,
    end_time_s: float | None,
    inclusive: bool = True,
):
    """Trim to a time window (`pad_trim_methods.py:181-246`)."""
    if isinstance(signal, Signal):
        assert start_time_s is not None or end_time_s is not None, (
            "At least one bound must be other than None"
        )
        if start_time_s:
            assert start_time_s >= 0.0, "Start time must be at least zero"
            assert start_time_s < signal.length_seconds, (
                "Start time must be less than signal's length"
            )
            start_sample = int(start_time_s * signal.sampling_rate_hz)
            if not inclusive:
                start_sample += 1
        else:
            start_sample = 0
        if end_time_s:
            assert end_time_s > 0.0, "End time must be greater than 0"
            assert end_time_s <= signal.length_seconds, (
                "End time must be less than signal length"
            )
            end_sample = int(end_time_s * signal.sampling_rate_hz)
            if inclusive:
                end_sample += 1
        else:
            end_sample = signal.length_samples
        assert end_sample > start_sample, "Invalid time window"
        return signal.copy_with_new_time_data(
            signal.time_data[start_sample:end_sample, ...]
        )
    if isinstance(signal, MultiBandSignal):
        output = signal.copy()
        output.bands = [
            trim_with_time_selection(b, start_time_s, end_time_s, inclusive)
            for b in signal.bands
        ]
        return output
    raise TypeError("No valid type was passed")
