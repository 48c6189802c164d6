"""Room acoustics public API.

Behavioral reference: `dsptoolbox/room_acoustics/room_acoustics.py`.
"""

from __future__ import annotations

import numpy as np

from ..classes import Filter, ImpulseResponse, MultiBandSignal, Signal
from ..helpers.gain_and_level import to_db
from ..helpers.other import find_nearest_points_index_in_vector
from ..ops.fft_conv import fft_convolve
from ..standard.enums import (
    FilterBankMode,
    FilterPassType,
    IirDesignMethod,
    SpectrumMethod,
)
from ..standard.pad_trim_methods import pad_trim
from . import _backend as bk
from .enums import ReverbTime, RoomAcousticsDescriptor
from .rooms import ShoeboxRoom


def reverb_time(
    signal,
    mode: ReverbTime = ReverbTime.Adaptive,
    ir_start=None,
    automatic_trimming: bool = True,
):
    """RT per channel/band (`room_acoustics.py:34-140`). Returns
    (times, correlation coefficients)."""
    if isinstance(signal, ImpulseResponse):
        ir_start = _check_ir_start_reverb(signal, ir_start)
        times = np.zeros(signal.number_of_channels)
        corrs = np.zeros(signal.number_of_channels)
        td = signal.time_data  # ONE host fetch, not one per channel
        for n in range(signal.number_of_channels):
            times[n], corrs[n] = bk.reverb(
                td[:, n].copy(),
                signal.sampling_rate_hz,
                mode,
                ir_start=ir_start[n],
                return_ir_start=False,
                automatic_trimming=automatic_trimming,
            )
        return times, corrs
    if isinstance(signal, MultiBandSignal):
        ir_start = _check_ir_start_reverb(signal, ir_start)
        times = np.zeros(
            (signal.number_of_bands, signal.bands[0].number_of_channels)
        )
        corrs = np.zeros_like(times)
        for ind in range(signal.number_of_bands):
            band_start = None if ir_start is None else ir_start[ind, :]
            times[ind, :], corrs[ind, :] = reverb_time(
                signal.bands[ind],
                mode,
                ir_start=band_start,
                automatic_trimming=automatic_trimming,
            )
        return times, corrs
    raise TypeError(
        f"Passed signal has type {type(signal)}. It should be of type "
        "ImpulseResponse or MultiBandSignal"
    )


def find_modes(
    signal: ImpulseResponse,
    f_range_hz=[50, 200],
    dist_hz: float = 5,
    prominence_db: float | None = None,
    antiresonances: bool = False,
) -> np.ndarray:
    """Room-mode detection via CMIF peaks
    (`room_acoustics.py:142-215`)."""
    from scipy.signal import find_peaks

    assert len(f_range_hz) == 2, (
        "Range of frequencies must have a minimum and a maximum value"
    )
    assert isinstance(signal, ImpulseResponse), (
        "This is only valid for an impulse response"
    )
    signal.spectrum_method = SpectrumMethod.FFT
    length = signal.sampling_rate_hz
    signal = pad_trim(signal, length)
    f, sp = signal.get_spectrum()
    sp = np.asarray(sp)
    ids = find_nearest_points_index_in_vector(f_range_hz, f)
    f = f[ids[0] : ids[1]]
    df = f[1] - f[0]
    sp = sp[ids[0] : ids[1], :]
    if antiresonances:
        sp = 1 / sp
    cmif = bk.complex_mode_identification(sp, True).squeeze()
    dist_samp = max(1, int(np.ceil(dist_hz / df)))
    id_cmif, _ = find_peaks(
        np.asarray(to_db(cmif, False)),
        distance=dist_samp,
        prominence=prominence_db,
    )
    return f[id_cmif]


def convolve_rir_on_signal(
    signal: Signal,
    rir: Signal,
    keep_peak_level: bool = True,
    keep_length: bool = True,
) -> Signal:
    """Convolve a single-channel RIR onto all channels (device FFT conv;
    `room_acoustics.py:217-266`)."""
    import jax.numpy as jnp

    assert rir.number_of_channels == 1, (
        "RIR should not contain more than one channel."
    )
    assert rir.sampling_rate_hz == signal.sampling_rate_hz, (
        "The sampling rates do not match"
    )
    from ..classes.filter_helpers import _oracle_exact_f64

    if _oracle_exact_f64():
        # float64 drop-in mode: the reference's literal scipy dispatch
        # (`room_acoustics.py:251-255`) for bit-identical results
        from scipy.signal import convolve, oaconvolve

        ratio = signal.length_samples / rir.length_samples
        if ratio < 15.0 or ratio < 1.0 / 15.0:
            new_td = oaconvolve(
                signal.time_data, rir.time_data, axes=0, mode="full"
            )
        else:
            new_td = convolve(signal.time_data, rir.time_data, mode="full")
    else:
        x = jnp.asarray(signal.time_data.T)  # (C, T)
        h = jnp.asarray(rir.time_data[:, 0])
        y = fft_convolve(x, h, mode="full")
        new_td = np.asarray(y.T)
    if keep_length:
        new_td = new_td[: len(signal), ...]
    if keep_peak_level:
        old_peaks = np.max(np.abs(signal.time_data), axis=0)
        new_peaks = np.max(np.abs(new_td), axis=0)
        new_td = new_td * (old_peaks / new_peaks)[None, ...]
    return signal.copy_with_new_time_data(new_td)


def find_ir_start(
    signal: ImpulseResponse, threshold_dbfs: float = -20
) -> np.ndarray:
    """Per-channel IR start (ISO 3382; `room_acoustics.py:268-298`)."""
    assert threshold_dbfs <= 0, "Threshold must be negative"
    start_index = np.empty(signal.number_of_channels, dtype=int)
    for n in range(signal.number_of_channels):
        start_index[n] = bk.find_ir_start(
            signal.time_data[:, n], threshold_dbfs
        )
    return start_index


def generate_synthetic_rir(
    room: ShoeboxRoom,
    source_position,
    receiver_position,
    sampling_rate_hz: int,
    total_length_seconds: float = 0.5,
    add_noise_reverberant_tail: bool = False,
    apply_bandpass: bool = False,
    use_detailed_absorption: bool = False,
    max_order: int | None = None,
) -> ImpulseResponse:
    """Image-source RIR synthesis (`room_acoustics.py:300-454`); the image
    lattice is evaluated as one device scatter-add."""
    import jax.numpy as jnp

    from ..filterbanks import linkwitz_riley_crossovers
    from ..ops.pad_trim import pad_trim_axis

    assert sampling_rate_hz is not None, "Sampling rate can not be None"
    assert isinstance(room, ShoeboxRoom), "Room must be of type ShoeboxRoom"
    source_position = np.asarray(source_position)
    receiver_position = np.asarray(receiver_position)
    assert room.check_if_in_room(source_position), (
        "Source is not located inside the room"
    )
    assert room.check_if_in_room(receiver_position), (
        "Receiver is not located inside the room"
    )
    total_length_samples = int(total_length_seconds * sampling_rate_hz)

    if not use_detailed_absorption:
        rir = bk.generate_rir(
            room_dim=room.dimensions_m,
            alpha=room.absorption_coefficient,
            s_pos=source_position,
            r_pos=receiver_position,
            rt=room.t60_s,
            mo=max_order,
            sr=sampling_rate_hz,
        )
        from .._defer import DeferredArray

        if isinstance(rir, DeferredArray) or (
            isinstance(rir, jnp.ndarray)
            and not isinstance(rir, np.ndarray)
        ):
            # device path: stay resident (NaNs already zeroed in-program);
            # the returned ImpulseResponse keeps device time data —
            # pad/trim and amplitude constraining fuse into one deferred
            # flush, and values materialize only when the user reads them
            from .._defer import defer_call

            rir = defer_call(
                ("ism_pad_trim", total_length_samples),
                lambda r: pad_trim_axis(
                    r, total_length_samples, axis=-1
                ),
                rir,
            )
        else:
            rir = np.array(
                pad_trim_axis(
                    jnp.asarray(rir), total_length_samples, axis=-1
                )
            )
            np.nan_to_num(rir, copy=False, nan=0)
    else:
        assert hasattr(room, "detailed_absorption"), (
            "Given room has no detailed absorption dictionary"
        )
        freqs = room.detailed_absorption["center_frequencies"][:-1] * np.sqrt(
            2
        )
        fb = linkwitz_riley_crossovers(
            crossover_frequencies_hz=freqs,
            order=12,
            sampling_rate_hz=sampling_rate_hz,
        )
        rir = np.zeros(total_length_samples)
        for ind in range(fb.number_of_bands):
            alphas = room.detailed_absorption["absorption_matrix"][:, ind]
            rir_band = bk.generate_rir(
                room_dim=room.dimensions_m,
                alpha=alphas,
                s_pos=source_position,
                r_pos=receiver_position,
                rt=room.t60_s,
                mo=max_order,
                sr=sampling_rate_hz,
            )
            rir_band = np.array(
                pad_trim_axis(
                    jnp.asarray(rir_band), total_length_samples, axis=-1
                )
            )
            np.nan_to_num(rir_band, copy=False, nan=0)
            rir0 = ImpulseResponse(None, rir_band, sampling_rate_hz)
            rir_multi = fb.filter_signal(rir0, zero_phase=True)
            rir += rir_multi.bands[ind].time_data[:, 0]

    if add_noise_reverberant_tail:
        if getattr(room, "mixing_time_s", None) is None:
            room.get_mixing_time("physical", n_reflections=1000)
        rir = bk.add_reverberant_tail_noise(
            rir, room.mixing_time_s, room.t60_s, sr=sampling_rate_hz
        )

    rir_output = ImpulseResponse(None, rir, sampling_rate_hz)
    if apply_bandpass:
        f = Filter.iir_filter(
            order=12,
            frequency_hz=[20.0, (sampling_rate_hz // 2) * 0.9],
            filter_design_method=IirDesignMethod.Butterworth,
            type_of_pass=FilterPassType.Bandpass,
            sampling_rate_hz=sampling_rate_hz,
        )
        rir_output = f.filter_signal(rir_output)
    return rir_output


def descriptors(
    rir,
    descriptor: RoomAcousticsDescriptor,
    automatic_trimming_rir: bool = True,
):
    """D50 / C80 / BassRatio / CenterTime
    (`room_acoustics.py:456-527`)."""
    if isinstance(rir, ImpulseResponse):
        if descriptor == RoomAcousticsDescriptor.D50:
            func = bk.d50_from_rir
        elif descriptor == RoomAcousticsDescriptor.C80:
            func = bk.c80_from_rir
        elif descriptor == RoomAcousticsDescriptor.CenterTime:
            func = bk.ts_from_rir
        else:
            return _bass_ratio(rir)
        desc = np.zeros(rir.number_of_channels)
        for ch in range(rir.number_of_channels):
            desc[ch] = func(
                rir.time_data[:, ch].copy(),
                rir.sampling_rate_hz,
                automatic_trimming_rir,
            )
        return desc
    if isinstance(rir, MultiBandSignal):
        assert descriptor != RoomAcousticsDescriptor.BassRatio, (
            "Bass-ratio is not a valid descriptor to be used on a "
            "MultiBandSignal. Pass a RIR as Signal to compute it"
        )
        desc = np.zeros((rir.number_of_bands, rir.number_of_channels))
        for ind, b in enumerate(rir):
            desc[ind, :] = descriptors(b, descriptor=descriptor)
        return desc
    raise TypeError("RIR must be of type Signal or MultiBandSignal")


def _bass_ratio(rir: ImpulseResponse) -> np.ndarray:
    """Bass ratio via octave-band RTs (`room_acoustics.py:529-551`)."""
    from ..filterbanks import fractional_octave_bands

    fb = fractional_octave_bands(
        [125, 1000], filter_order=10, sampling_rate_hz=rir.sampling_rate_hz
    )[0]
    rir_multi = fb.filter_signal(
        rir, FilterBankMode.Parallel, zero_phase=True
    )
    rt, _ = reverb_time(rir_multi)
    br = np.zeros(rir.number_of_channels)
    for ch in range(rir.number_of_channels):
        br[ch] = (rt[0, ch] + rt[1, ch]) / (rt[2, ch] + rt[3, ch])
    return br


def _check_ir_start_reverb(sig, ir_start):
    """Normalize ir_start into per-channel / per-band arrays
    (`room_acoustics.py:553-593`)."""
    if ir_start is not None and isinstance(ir_start, (list, tuple)):
        ir_start = np.atleast_1d(ir_start).astype(int)
    if isinstance(sig, ImpulseResponse):
        if ir_start is None:
            return [None] * sig.number_of_channels
        if np.issubdtype(type(ir_start), np.integer):
            ir_start = np.ones(sig.number_of_channels, dtype=int) * int(
                ir_start
            )
        ir_start = np.asarray(ir_start)
        assert ir_start.ndim == 1 and len(ir_start) == (
            sig.number_of_channels
        ), "Shape of ir_start is not valid"
        return ir_start.astype(int)
    if ir_start is None:
        return None
    if np.issubdtype(type(ir_start), np.integer):
        ir_start = (
            np.ones((sig.number_of_bands, sig.number_of_channels), dtype=int)
            * int(ir_start)
        )
    ir_start = np.asarray(ir_start)
    if ir_start.ndim == 1:
        ir_start = np.repeat(ir_start[None, ...], sig.number_of_bands, axis=0)
    else:
        assert ir_start.shape == (
            sig.number_of_bands,
            sig.number_of_channels,
        ), "Shape of ir_start is not valid for the passed signal"
    return ir_start.astype(int)
