"""General DSP utilities over arrays/primitives (public `tools` namespace).

Behavioral reference: `dsptoolbox/tools.py`. Re-exports array-level helpers
and adds frequency-grid and sample-format utilities.
"""

from __future__ import annotations


import numpy as np

from .helpers.bytes_conversion import (
    array_to_bytes_24bits as _array_to_bytes_24bits,
    bytes_to_array_24bits as _bytes_to_array_24bits,
)
from .helpers.gain_and_level import from_db, to_db
from .helpers.interpolation import pchip_interpolate  # noqa: F401  (re-export)
from .helpers.other import next_power_2
from .helpers.smoothing import (
    fractional_octave_smoothing,
    get_smoothing_factor_ema,
    time_smoothing,
)
from .helpers.spectrum_utilities import (
    interpolate_fr,
    scale_spectrum,
    warp_frequency_vector as warp_frequency,
    wrap_phase,
)
from .ops.framing import (
    frame_signal as _frame_signal_ops,
    reconstruct_framed_signal as _reconstruct_framed_signal_ops,
)
from .standard.backend import (
    center_frequencies_fractional_octaves_iec,
    exact_center_frequencies_fractional_octaves,
)

__all__ = [
    "log_frequency_vector",
    "get_exact_value_at_frequency",
    "log_mean",
    "frequency_crossover",
    "fractional_octave_frequencies",
    "erb_frequencies",
    "convert_sample_representation",
    "to_db",
    "from_db",
    "interpolate_fr",
    "scale_spectrum",
    "wrap_phase",
    "warp_frequency",
    "fractional_octave_smoothing",
    "get_smoothing_factor_ema",
    "time_smoothing",
    "next_power_2",
    "framed_signal",
    "reconstruct_from_framed_signal",
]


def framed_signal(
    time_data,
    window_length_samples: int,
    step_size: int,
    keep_last_frames: bool = True,
) -> np.ndarray:
    """Overlapping frames of ``time_data (T, C)`` in the reference layout
    ``(window_length, n_frames, channels)``
    (`helpers/_framed_signal_representation.py:6-68`). The gather itself is
    the device framing kernel, which works channels-first."""
    import jax.numpy as jnp

    td = np.atleast_2d(np.asarray(time_data))
    if td.shape[0] == 1 and np.asarray(time_data).ndim == 1:
        td = td.T
    frames = _frame_signal_ops(
        jnp.asarray(td.T), window_length_samples, step_size,
        keep_last_frames,
    )  # (C, K, L)
    return np.transpose(np.asarray(frames), (2, 1, 0))  # (L, K, C)


def reconstruct_from_framed_signal(
    td_framed,
    step_size: int,
    window=None,
    original_signal_length: int | None = None,
    safety_threshold: float = 1e-4,
) -> np.ndarray:
    """Overlap-add reconstruction of reference-layout frames
    ``(window_length, n_frames, channels)`` → ``(T, C)``
    (`helpers/_framed_signal_representation.py:70-132`)."""
    import jax.numpy as jnp

    frames = jnp.asarray(
        np.transpose(np.asarray(td_framed), (2, 1, 0))
    )  # (C, K, L)
    out = _reconstruct_framed_signal_ops(
        frames, step_size, window, original_signal_length,
        safety_threshold,
    )
    return np.asarray(out).T  # (T, C)


def log_frequency_vector(
    frequency_range_hz, n_bins_per_octave: int
) -> np.ndarray:
    """Logarithmically spaced frequency vector (`tools.py:42-66`)."""
    assert frequency_range_hz[0] > 0, "The first frequency bin should not be 0"
    n_octave = np.log2(frequency_range_hz[1] / frequency_range_hz[0])
    return frequency_range_hz[0] * 2 ** (
        np.arange(0, n_octave, 1 / n_bins_per_octave)
    )


def get_exact_value_at_frequency(
    freqs_hz: np.ndarray, y: np.ndarray, f: float = 1e3
):
    """Linear interpolation at a single frequency (`tools.py:68-104`)."""
    assert freqs_hz[0] <= f and freqs_hz[-1] >= f, (
        "Frequency vector does not contain 1 kHz"
    )
    assert freqs_hz.ndim == 1, "Frequency vector can only have one dimension"
    assert len(freqs_hz) == len(y), "Lengths do not match"
    if freqs_hz[-1] == f:
        return y[-1]
    ind = int(np.searchsorted(freqs_hz, f))
    if freqs_hz[ind] > f:
        ind -= 1
    return (f - freqs_hz[ind]) * (y[ind + 1] - y[ind]) / (
        freqs_hz[ind + 1] - freqs_hz[ind]
    ) + y[ind]


def log_mean(x: np.ndarray, axis: int = 0):
    """Mean over a log-resampled axis (`tools.py:106-131`)."""
    x = np.asarray(x)
    N = x.shape[axis]
    l1 = np.arange(N)
    k_log = N ** (l1 / (N - 1))
    from scipy.interpolate import interp1d

    vec_log = interp1d(
        l1 + 1, x, kind="linear", copy=False, assume_sorted=True, axis=axis
    )(k_log)
    return np.mean(vec_log, axis=axis)


def frequency_crossover(
    crossover_region_hz,
    logarithmic: bool = True,
):
    """Return a callable sigmoid-like crossover weighting function
    (`tools.py:134-184`)."""
    from scipy.interpolate import interp1d

    f = (
        log_frequency_vector(crossover_region_hz, 250)
        if logarithmic
        else np.linspace(
            crossover_region_hz[0],
            crossover_region_hz[1],
            int(crossover_region_hz[1] - crossover_region_hz[0]),
        )
    )
    length = len(f)
    w = np.hanning(length * 2)[:length]
    i = interp1d(
        f,
        w,
        kind="cubic",
        copy=False,
        bounds_error=False,
        fill_value=(0.0, 1.0),
        assume_sorted=True,
    )

    def func(x):
        return i(x)

    return func


def fractional_octave_frequencies(
    num_fractions=1, frequency_range=(20, 20e3), return_cutoff=False
):
    """IEC-compliant fractional octave center/cutoff frequencies
    (`tools.py:186-258`; pyfar implementation)."""
    nominal = np.array([])
    f_lims = np.asarray(frequency_range)
    if f_lims.size != 2:
        raise ValueError(
            "You need to specify a lower and upper limit frequency."
        )
    if f_lims[0] > f_lims[1]:
        raise ValueError(
            "The second frequency needs to be higher than the first."
        )
    if num_fractions in [1, 3]:
        nominal, exact = center_frequencies_fractional_octaves_iec(
            num_fractions
        )
        mask = (nominal >= f_lims[0]) & (nominal <= f_lims[1])
        nominal = nominal[mask]
        exact = exact[mask]
    else:
        exact = exact_center_frequencies_fractional_octaves(
            num_fractions, f_lims
        )
    if return_cutoff:
        octave_ratio = 10 ** (3 / 10)
        freqs_upper = exact * octave_ratio ** (1 / 2 / num_fractions)
        freqs_lower = exact * octave_ratio ** (-1 / 2 / num_fractions)
        return nominal, exact, (freqs_lower, freqs_upper)
    return nominal, exact


def erb_frequencies(
    freq_range_hz=[20, 20000],
    resolution: float = 1,
    reference_frequency_hz: float = 1000,
) -> np.ndarray:
    """Linearly ERB-spaced frequencies (`tools.py:261-337`; pyfar/Hohmann
    2002 Eq. 16)."""
    if (
        not isinstance(freq_range_hz, (list, tuple, np.ndarray))
        or len(freq_range_hz) != 2
    ):
        raise ValueError("freq_range must be an array like of length 2")
    freq_range_hz = list(freq_range_hz)
    if freq_range_hz[0] > freq_range_hz[1]:
        freq_range_hz = [freq_range_hz[1], freq_range_hz[0]]
    if resolution <= 0:
        raise ValueError("Resolution must be larger than zero")
    fr = np.asarray(freq_range_hz, dtype=np.float64)
    erb_range = 9.2645 * np.sign(fr) * np.log(1 + np.abs(fr) * 0.00437)
    erb_ref = (
        9.2645
        * np.sign(reference_frequency_hz)
        * np.log(1 + abs(reference_frequency_hz) * 0.00437)
    )
    erb_ref_range = np.array([erb_ref - erb_range[0], erb_range[1] - erb_ref])
    n_points = np.floor(erb_ref_range / resolution).astype(int)
    erb_points = (
        np.arange(-n_points[0], n_points[1] + 1) * resolution + erb_ref
    )
    return (
        1
        / 0.00437
        * np.sign(erb_points)
        * (np.exp(np.abs(erb_points) / 9.2645) - 1)
    )


def convert_sample_representation(
    values,
    input_format: str,
    output_format: str,
    cast_output: bool = True,
    output_in_bytes: bool = False,
):
    """PCM sample format conversion incl. 24-bit packing
    (`tools.py:339-503`). Returns (output, equilibrium, span)."""
    if input_format == output_format:
        raise AssertionError("No conversion is necessary")
    valid = ["f32", "f64", "i8", "i16", "i24", "i32", "u8", "u16", "u24", "u32"]
    input_format = input_format.lower()
    output_format = output_format.lower()
    assert output_format in valid and input_format in valid, (
        f"Format {input_format} or {output_format} is not supported"
    )
    if isinstance(values, bytes):
        signed_input = input_format[0] == "i"
        if input_format in ("i24", "u24"):
            values = _bytes_to_array_24bits(values, signed_input)
        elif input_format in ("f32", "f64"):
            values = np.frombuffer(
                values, dtype=np.float32 if input_format == "f32" else np.float64
            )
        else:
            bits = int(input_format[1:])
            dtype = np.dtype(f"{'int' if signed_input else 'uint'}{bits}")
            values = np.frombuffer(values, dtype=dtype)
    values = np.asarray(values)

    if input_format not in ("f32", "f64"):
        signed_input = input_format[0] == "i"
        bits_input = int(input_format[1:])
        max_value_input = 2.0 ** (bits_input - 1) - 1
        values = values.astype(np.float64) / max_value_input
        if not signed_input:
            values = values - 1.0
    values = np.clip(values, -1.0, 1.0)

    # Reference semantics (`tools.py:439-503`): float outputs ignore
    # `output_in_bytes`; fixed-point casting truncates toward zero
    # (astype/np.trunc, NOT rounding); casting to 24-bit requires bytes
    # output and widens to 32-bit before packing.
    if output_format == "f32":
        return values.astype(np.float32), 0.0, 1.0
    if output_format == "f64":
        return values.astype(np.float64), 0.0, 1.0

    signed_output = output_format[0] == "i"
    bits_output = int(output_format[1:])
    max_value_output = 2.0 ** (bits_output - 1) - 1
    output = values * max_value_output
    equilibrium = 0.0
    if not signed_output:
        output = output + max_value_output
        equilibrium += max_value_output
    if cast_output:
        if output_format in ("i24", "u24"):
            assert output_in_bytes, (
                "This format is only valid for casting when "
                "the output is in bytes"
            )
            bits_output = 32
        dtype = np.dtype(
            f"{'int' if signed_output else 'uint'}{bits_output}"
        )
        output = output.astype(dtype)
    else:
        output = np.trunc(output)

    if not output_in_bytes:
        return output, equilibrium, max_value_output
    if output_format in ("i24", "u24") and cast_output:
        return (
            _array_to_bytes_24bits(output),
            equilibrium,
            max_value_output,
        )
    return output.tobytes(), equilibrium, max_value_output
