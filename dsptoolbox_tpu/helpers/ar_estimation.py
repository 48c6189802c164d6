"""Autoregressive estimation: Levinson-Durbin, Yule-Walker, Burg.

Reference: `dsptoolbox/helpers/ar_estimation.py`. The recursion order is
static, so the order-loops unroll at trace time into vectorized updates over
the channel batch; the autocorrelation runs as one batched FFT on device.
Array convention: time/coefficients on the FIRST axis (matching the
reference), channels after.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.fft_conv import fft_correlate


def levinson_durbin_recursion(autocorrelation: jnp.ndarray):
    """Levinson-Durbin over the first axis: ``autocorrelation (order+1, ...)``
    → (ar coefficients ``(order+1, ...)`` with a0=1, prediction error).

    Mirrors `helpers/ar_estimation.py:6-69` (in-place halves swap) with the
    order loop unrolled at trace time. The reference's singular-matrix check
    is value-dependent; here non-positive prediction errors yield NaNs
    downstream instead of raising (jit-compatible).
    """
    prediction_error = autocorrelation[0]
    r = autocorrelation[1:]
    num = r.shape[0]
    ar = [jnp.zeros_like(r[0]) for _ in range(num)]
    for order in range(num):
        reflection_value = r[order]
        for lag in range(order):
            reflection_value = reflection_value + ar[lag] * r[order - lag - 1]
        k = -reflection_value / prediction_error
        prediction_error = prediction_error * (1.0 - k**2)
        ar[order] = k
        if order == 0:
            continue
        half_order = (order + 1) // 2
        for lag in range(half_order):
            reverse_lag = order - lag - 1
            save = ar[lag]
            ar[lag] = save + k * ar[reverse_lag]
            if lag != reverse_lag:
                ar[reverse_lag] = ar[reverse_lag] + k * save
    coeffs = jnp.stack(
        [jnp.ones_like(prediction_error)] + ar, axis=0
    )
    return coeffs, prediction_error


def yule_walker_ar(time_data: jnp.ndarray, order: int):
    """Yule-Walker AR estimation along the first axis
    (`helpers/ar_estimation.py:71-126`): biased autocorrelation (batched FFT)
    + Levinson-Durbin."""
    T = time_data.shape[0]
    td = jnp.moveaxis(time_data, 0, -1)  # (..., T)
    ac = fft_correlate(td, td)[..., T - 1 : T + order] / T
    ac = jnp.moveaxis(ac, -1, 0)  # (order+1, ...)
    return levinson_durbin_recursion(ac)


def burg_ar(time_data: jnp.ndarray, order: int):
    """Burg's method along the first axis (`helpers/ar_estimation.py:129-205`,
    librosa-style update), order loop unrolled at trace time.

    Returns (ar coefficients ``(order+1, ...)``, prediction error variance).
    """
    onedim = time_data.ndim == 1
    if onedim:
        time_data = time_data[:, None]
    eps = float(np.finfo(np.float64).eps)

    ar_coeffs = [
        jnp.where(
            jnp.zeros(time_data.shape[1:]) == 0,
            1.0 if i == 0 else 0.0,
            0.0,
        )
        for i in range(order + 1)
    ]
    fwd = time_data[1:]
    bwd = time_data[:-1]
    den = jnp.sum(fwd**2 + bwd**2, axis=0)

    for i in range(order):
        k = (-2.0 * jnp.sum(bwd * fwd, axis=0)) / (den + eps)
        prev = list(ar_coeffs)
        for j in range(1, i + 2):
            ar_coeffs[j] = prev[j] + k * prev[i - j + 1]
        fwd_tmp = fwd
        fwd = fwd + k * bwd
        bwd = bwd + k * fwd_tmp
        q = 1.0 - k**2
        den = q * den - bwd[-1] ** 2 - fwd[0] ** 2
        fwd = fwd[1:]
        bwd = bwd[:-1]

    coeffs = jnp.stack(ar_coeffs, axis=0)
    if onedim:
        coeffs = coeffs[:, 0]
        den = den[0]
    return coeffs, den
