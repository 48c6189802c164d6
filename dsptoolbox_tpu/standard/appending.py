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
        if not complex_data:
            # device-resident path: ONE jitted program pads/trims and
            # concatenates every signal (eager ops would each pay a
            # dispatch launch; no host fetch — the setter keeps jnp
            # inputs on the device)
            from .._defer import defer_call

            def _cat(*tds):
                return jnp.concatenate(
                    [
                        pad_trim_axis(
                            td, total_length, axis=0, in_the_end=at_end
                        )
                        for td in tds
                    ],
                    axis=1,
                )

            new_sig = signals[0].copy()
            # deferral-aware: reads the raw (possibly pending) device
            # data so an upstream deferred producer (e.g. istft) stays
            # fused with this concatenation
            new_sig.time_data = defer_call(
                ("append_signals", total_length, bool(at_end),
                 len(signals)),
                _cat,
                *[s._time_data for s in signals],
            )
            return new_sig
        cols = []
        for s in signals:
            td = s.time_data.astype(np.complex128)
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
    spectra: list, complex_if_available: bool = True
) -> Spectrum:
    """Append the channels of several spectra
    (`standard/appending.py:160-204`): every spectrum is interpolated onto
    the FIRST spectrum's frequency vector; complex data is appended only
    when the first spectrum is complex and ``complex_if_available``,
    otherwise magnitudes are appended."""
    from ..standard.enums import SpectrumType

    assert len(spectra) > 1, "There must be at least two spectra to join"
    assert all(isinstance(sp, Spectrum) for sp in spectra), (
        "All elements must be Spectrum"
    )
    complex_append = complex_if_available and not spectra[0].is_magnitude
    if complex_append:
        assert all(not s.is_magnitude for s in spectra), (
            "At least one spectrum is not complex"
        )
    total_channels = sum(s.number_of_channels for s in spectra)
    freqs = spectra[0].frequency_vector_hz
    spec = np.zeros(
        (len(freqs), total_channels),
        dtype=np.complex128 if complex_append else np.float64,
    )
    ch_ind = 0
    for s in spectra:
        spec[:, ch_ind : ch_ind + s.number_of_channels] = np.asarray(
            s.get_interpolated_spectrum(
                freqs,
                (
                    SpectrumType.Complex
                    if complex_append
                    else SpectrumType.Magnitude
                ),
            )
        )
        ch_ind += s.number_of_channels
    return Spectrum(freqs, spec)
