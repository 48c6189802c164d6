"""Host-side window generation.

Windows are static given (type, length, parameters), so they are produced in
float64 numpy via scipy at trace time and baked into compiled programs as
constants — exact parity with the reference's scipy windows for free
(including chebwin/taylor/dpss which have no jax equivalents).
"""

from __future__ import annotations

import numpy as np
from scipy.signal import windows as _sw

from ..standard.enums import Window


_WINDOW_CACHE: dict = {}


def get_window(
    window, length: int, symmetric: bool = False
) -> np.ndarray:
    """Window values as float64 numpy.

    ``window`` may be a `Window` enum member, a scipy window name/tuple, or an
    explicit array (validated for length). Generated windows are cached
    per (type, length, symmetric) — scipy regeneration cost ~0.2 ms per
    call was measurable on hot library paths — and returned as copies so
    callers may mutate freely.
    """
    if isinstance(window, (Window, str)) or (
        isinstance(window, tuple)
        and all(isinstance(x, (str, int, float)) for x in window)
    ):
        ck = (window, length, symmetric)
        got = _WINDOW_CACHE.get(ck)
        if got is None:
            if isinstance(window, Window):
                got = window(length, symmetric)
            else:
                got = _sw.get_window(window, length, fftbins=not symmetric)
            _WINDOW_CACHE[ck] = got
        return got.copy()
    if isinstance(window, tuple):
        return _sw.get_window(window, length, fftbins=not symmetric)
    arr = np.asarray(window, dtype=np.float64)
    if arr.ndim != 1 or arr.shape[0] != length:
        raise ValueError(
            f"Explicit window must be 1D of length {length}, got {arr.shape}"
        )
    return arr


def check_cola(window: np.ndarray, step: int) -> bool:
    """Constant-overlap-add check (host-side, scipy)."""
    from scipy.signal import check_COLA

    return bool(check_COLA(window, nperseg=len(window), noverlap=len(window) - step))
