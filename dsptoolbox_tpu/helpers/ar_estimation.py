"""Autoregressive estimation: Levinson-Durbin, Yule-Walker, Burg.

Reference: `dsptoolbox/helpers/ar_estimation.py`. Everything here runs
host-side in f64: the estimates are numerically vicious — near-sinusoidal
frames push the reflection coefficients to ±1 and a 1e-7 fp32 perturbation
anywhere (autocorrelation included) moves the AR coefficients by ~1e-1
(observed ~100x errors on chirp frames) — while the cost is O(order²) on
tiny data, so f64 host math is both required for parity and free.
Array convention: time/coefficients on the FIRST axis (matching the
reference), channels after.
"""

from __future__ import annotations

import numpy as np


def levinson_durbin_recursion(autocorrelation):
    """Levinson-Durbin over the first axis: ``autocorrelation (order+1, ...)``
    → (ar coefficients ``(order+1, ...)`` with a0=1, prediction error).

    Mirrors `helpers/ar_estimation.py:6-69` (in-place halves swap). Runs in
    f64 on host. The reference's singular-matrix check is value-dependent;
    here non-positive prediction errors produce NaNs downstream instead of
    raising.
    """
    autocorrelation = np.asarray(autocorrelation, dtype=np.float64)
    prediction_error = autocorrelation[0].copy()
    r = autocorrelation[1:]
    num = r.shape[0]
    ar = [np.zeros_like(r[0]) for _ in range(num)]
    for order in range(num):
        reflection_value = r[order].copy()
        for lag in range(order):
            reflection_value = reflection_value + ar[lag] * r[order - lag - 1]
        with np.errstate(divide="ignore", invalid="ignore"):
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
    coeffs = np.stack([np.ones_like(prediction_error)] + ar, axis=0)
    return coeffs, prediction_error


def yule_walker_ar(time_data, order: int):
    """Yule-Walker AR estimation along the first axis
    (`helpers/ar_estimation.py:71-126`): biased autocorrelation + f64
    Levinson-Durbin, both on host. The ill-conditioning that forces the
    recursion into f64 applies to the autocorrelation too: a 1e-7 fp32
    perturbation of ``r`` moves the AR coefficients of a near-sinusoidal
    frame by ~1e-1."""
    td = np.moveaxis(
        np.asarray(time_data, dtype=np.float64), 0, -1
    )  # (..., T)
    T = td.shape[-1]
    nfft = 1 << int(np.ceil(np.log2(2 * T - 1)))
    spec = np.fft.rfft(td, n=nfft, axis=-1)
    ac_full = np.fft.irfft(spec * np.conj(spec), n=nfft, axis=-1)
    ac = ac_full[..., : order + 1] / T
    ac = np.moveaxis(ac, -1, 0)  # (order+1, ...)
    return levinson_durbin_recursion(ac)


def burg_ar(time_data, order: int):
    """Burg's method along the first axis (`helpers/ar_estimation.py:129-205`,
    librosa-style update), f64 on host.

    Returns (ar coefficients ``(order+1, ...)``, prediction error variance).
    """
    time_data = np.asarray(time_data, dtype=np.float64)
    onedim = time_data.ndim == 1
    if onedim:
        time_data = time_data[:, None]
    eps = float(np.finfo(np.float64).eps)

    ar_coeffs = [
        np.full(time_data.shape[1:], 1.0 if i == 0 else 0.0)
        for i in range(order + 1)
    ]
    fwd = time_data[1:].copy()
    bwd = time_data[:-1].copy()
    den = np.sum(fwd**2 + bwd**2, axis=0)

    for i in range(order):
        k = (-2.0 * np.sum(bwd * fwd, axis=0)) / (den + eps)
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

    coeffs = np.stack(ar_coeffs, axis=0)
    if onedim:
        coeffs = coeffs[:, 0]
        den = den[0]
    return coeffs, den
