"""Minimum phase via the real cepstrum (device-side).

Reference: `dsptoolbox/helpers/minimum_phase.py`. The cepstral-domain window
is a static mask, so the whole chain (fft → log|.| → ifft → mask → fft → exp)
fuses into a handful of XLA kernels over the batch of channels.

Array convention: channels-first ``(..., T)``, time on the minor axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.fft import next_fast_len


def _cepstral_hilbert_mask(N: int) -> np.ndarray:
    """Static doubling/zeroing mask of the real-cepstrum method
    (`helpers/minimum_phase.py:36-47`)."""
    m = np.ones(N)
    if N % 2 == 0:
        m[1 : N // 2] = 2.0
        m[N // 2 + 1 :] = 0.0
    else:
        m[1 : (N + 1) // 2] = 2.0
        m[(N + 1) // 2 :] = 0.0
    return m


def minimum_phase_spectrum_from_real_cepstrum(
    time_data: jnp.ndarray, padding_factor: int = 8
) -> jnp.ndarray:
    """Full (two-sided) minimum-phase spectrum of ``time_data (..., T)``.

    Output length is ``next_fast_len(T * padding_factor)``.
    """
    T = time_data.shape[-1]
    fft_length = next_fast_len(max(T * padding_factor, T))
    sp = jnp.fft.fft(time_data, n=fft_length, axis=-1)
    y = jnp.real(jnp.fft.ifft(jnp.log(jnp.abs(sp)), axis=-1))
    y = y * jnp.asarray(_cepstral_hilbert_mask(fft_length), dtype=y.dtype)
    return jnp.exp(jnp.fft.fft(y, axis=-1))


def min_phase_ir_from_real_cepstrum(
    time_data: jnp.ndarray, padding_factor: int = 8
) -> jnp.ndarray:
    """Minimum-phase time series (same padded length as the spectrum)."""
    return jnp.real(
        jnp.fft.ifft(
            minimum_phase_spectrum_from_real_cepstrum(time_data, padding_factor),
            axis=-1,
        )
    )
