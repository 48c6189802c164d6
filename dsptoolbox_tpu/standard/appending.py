"""Appending of signals, filter banks and spectra (reference
`dsptoolbox/standard/appending.py`)."""

from __future__ import annotations

import numpy as np

from ..classes import FilterBank, MultiBandSignal, Signal, Spectrum
from ..ops.pad_trim import pad_trim_axis
import jax.numpy as jnp


def append_signals(
    signals,
    allow_padding_trimming: bool = True,
    at_end: bool = True,
):
    """Concatenate channels of several signals
    (`standard/appending.py:14-128`)."""
    assert len(signals) > 1, "At least two signals should be passed"
    if isinstance(signals[0], Signal):
        complex_data = False
        for s in signals:
            assert isinstance(s, Signal), (
                "All signals must be of type Signal or ImpulseResponse"
            )
            assert s.sampling_rate_hz == signals[0].sampling_rate_hz, (
                "Sampling rates do not match"
            )
            if not allow_padding_trimming:
                assert len(s) == len(signals[0]), (
                    "Lengths do not match and padding or trimming is not "
                    "activated"
                )
            complex_data |= s.is_complex_signal
        total_length = len(signals[0])
        cols = []
        for s in signals:
            td = s.time_data
            if complex_data:
                td = td.astype(np.complex128)
                if s.is_complex_signal:
                    td = td + 1j * s.time_data_imaginary
            td = np.asarray(
                pad_trim_axis(
                    jnp.asarray(td), total_length, axis=0, in_the_end=at_end
                )
            )
            cols.append(td)
        new_sig = signals[0].copy()
        new_sig.time_data = np.concatenate(cols, axis=1)
        return new_sig
    if isinstance(signals[0], MultiBandSignal):
        for s in signals:
            assert isinstance(s, MultiBandSignal), (
                "All signals must be of type MultiBandSignal"
            )
            assert s.same_sampling_rate == signals[0].same_sampling_rate, (
                "Sampling rates do not match"
            )
            assert s.sampling_rate_hz == signals[0].sampling_rate_hz, (
                "Sampling rates do not match"
            )
            if not allow_padding_trimming:
                assert s.length_samples == signals[0].length_samples, (
                    "Lengths do not match and padding or trimming is not "
                    "activated"
                )
            assert s.number_of_bands == signals[0].number_of_bands, (
                "Number of bands does not match"
            )
        new_bands = []
        rest = list(signals[1:])
        for n in range(signals[0].number_of_bands):
            new_band = signals[0].bands[n].copy()
            for s in rest:
                new_band = append_signals(
                    [new_band, s.bands[n]], allow_padding_trimming, at_end
                )
            new_bands.append(new_band)
        return MultiBandSignal(
            new_bands, same_sampling_rate=signals[0].same_sampling_rate
        )
    raise ValueError(
        "Signals have to be type of type Signal or MultiBandSignal"
    )


def append_filterbanks(fbs: list) -> FilterBank:
    """Merge the filters of several banks
    (`standard/appending.py:131-158`)."""
    assert len(fbs) > 1, "At least two filter banks should be passed"
    same_sampling_rate = fbs[0].same_sampling_rate
    filters = []
    for fb in fbs:
        assert isinstance(fb, FilterBank), "All elements must be FilterBank"
        assert fb.same_sampling_rate == same_sampling_rate, (
            "Sampling rate handling does not match"
        )
        filters.extend([f.copy() for f in fb.filters])
    return FilterBank(filters, same_sampling_rate=same_sampling_rate)


def append_spectra(
    spectra: list, complex_if_available: bool = False
) -> Spectrum:
    """Append the channels of several spectra sharing a frequency vector
    (`standard/appending.py:160-204`)."""
    assert len(spectra) > 1, "At least two spectra should be passed"
    f0 = spectra[0].frequency_vector_hz
    data = []
    for sp in spectra:
        assert isinstance(sp, Spectrum), "All elements must be Spectrum"
        assert len(sp.frequency_vector_hz) == len(f0) and np.allclose(
            sp.frequency_vector_hz, f0
        ), "Frequency vectors do not match"
        d = np.asarray(sp.spectral_data)
        if complex_if_available and not np.iscomplexobj(d):
            d = d.astype(np.complex128)
        data.append(d)
    if any(np.iscomplexobj(d) for d in data) and not all(
        np.iscomplexobj(d) for d in data
    ):
        data = [d.astype(np.complex128) for d in data]
    return Spectrum(f0, np.concatenate(data, axis=1))
