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


def get_window(
    window, length: int, symmetric: bool = False
) -> np.ndarray:
    """Window values as float64 numpy.

    ``window`` may be a `Window` enum member, a scipy window name/tuple, or an
    explicit array (validated for length).
    """
    if isinstance(window, Window):
        return window(length, symmetric)
    if isinstance(window, (str, tuple)):
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
