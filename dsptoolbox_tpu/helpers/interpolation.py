"""Interpolation primitives with *static* sample grids.

In this framework frequency/log-frequency grids are compile-time constants
(they depend only on lengths and sampling rates), while the interpolated
*data* is traced. Bracketing indices and interpolation weights are therefore
precomputed host-side in numpy and baked into the program; on device the
interpolation is a gather + fused polynomial — no searchsorted at runtime.

`pchip_interpolate` reproduces scipy's PchipInterpolator (Fritsch–Carlson
monotone cubic Hermite) numerics, required for parity with the reference's
fractional-octave smoothing (`dsptoolbox/helpers/smoothing.py:66`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _static_brackets(x: np.ndarray, xq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interval index i (so x[i] <= xq < x[i+1]) and offset t for each query."""
    x = np.asarray(x, dtype=np.float64)
    xq = np.asarray(xq, dtype=np.float64)
    idx = np.searchsorted(x, xq, side="right") - 1
    idx = np.clip(idx, 0, len(x) - 2)
    return idx, xq


def linear_interpolate(
    x: np.ndarray, y: jnp.ndarray, xq: np.ndarray, axis: int = 0
) -> jnp.ndarray:
    """Linear interpolation of traced ``y`` sampled at static ``x`` onto
    static query points ``xq`` along ``axis``. Extrapolates linearly like
    ``scipy.interpolate.interp1d(..., fill_value='extrapolate')`` only if the
    query is inside [x0, x-1]; outside values are clamped to the edge interval
    line (matching interp1d without bounds_error in 'linear' mode behavior is
    NaN — callers must pre-clip; we clamp which suits the smoothing use)."""
    idx, xq = _static_brackets(x, xq)
    x = np.asarray(x, dtype=np.float64)
    denom = x[idx + 1] - x[idx]
    w = (xq - x[idx]) / np.where(denom == 0, 1.0, denom)
    y = jnp.moveaxis(y, axis, 0)
    y0 = y[idx]
    y1 = y[idx + 1]
    wj = jnp.asarray(w, dtype=y.dtype).reshape((-1,) + (1,) * (y.ndim - 1))
    out = y0 * (1 - wj) + y1 * wj
    return jnp.moveaxis(out, 0, axis)


def _pchip_slopes(h: np.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Monotone cubic slopes per scipy's PCHIP (h static, delta traced).

    ``h (N-1,)`` interval widths, ``delta (N-1, ...)`` secant slopes.
    Returns ``d (N, ...)``.
    """
    hj = jnp.asarray(h, dtype=delta.dtype).reshape(
        (-1,) + (1,) * (delta.ndim - 1)
    )
    h0 = hj[:-1]
    h1 = hj[1:]
    d0 = delta[:-1]
    d1 = delta[1:]
    w1 = 2 * h1 + h0
    w2 = h1 + 2 * h0
    # harmonic mean where signs agree and both nonzero
    denom = w1 / jnp.where(d0 == 0, 1.0, d0) + w2 / jnp.where(d1 == 0, 1.0, d1)
    interior = (w1 + w2) / denom
    same_sign = (jnp.sign(d0) * jnp.sign(d1)) > 0
    interior = jnp.where(same_sign, interior, 0.0)

    def edge(h_a, h_b, del_a, del_b):
        d = ((2 * h_a + h_b) * del_a - h_a * del_b) / (h_a + h_b)
        d = jnp.where(jnp.sign(d) != jnp.sign(del_a), 0.0, d)
        cond = (jnp.sign(del_a) != jnp.sign(del_b)) & (
            jnp.abs(d) > 3 * jnp.abs(del_a)
        )
        return jnp.where(cond, 3 * del_a, d)

    first = edge(hj[0], hj[1], delta[0], delta[1])
    last = edge(hj[-1], hj[-2], delta[-1], delta[-2])
    return jnp.concatenate([first[None], interior, last[None]], axis=0)


def pchip_interpolate(
    x: np.ndarray, y: jnp.ndarray, xq: np.ndarray, axis: int = 0
) -> jnp.ndarray:
    """PCHIP interpolation of traced ``y`` (sampled at static ``x``) onto
    static query points ``xq`` along ``axis``; matches
    ``scipy.interpolate.PchipInterpolator(x, y, axis)(xq)``."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < 3:
        return linear_interpolate(x, y, xq, axis=axis)
    y = jnp.moveaxis(y, axis, 0)
    h = np.diff(x)  # static
    hj = jnp.asarray(h, dtype=y.dtype).reshape((-1,) + (1,) * (y.ndim - 1))
    delta = (y[1:] - y[:-1]) / hj
    d = _pchip_slopes(h, delta)

    idx, xqf = _static_brackets(x, xq)
    t = (xqf - x[idx]) / h[idx]  # static offsets in [0, 1]
    tj = jnp.asarray(t, dtype=y.dtype).reshape((-1,) + (1,) * (y.ndim - 1))
    hq = jnp.asarray(h[idx], dtype=y.dtype).reshape(
        (-1,) + (1,) * (y.ndim - 1)
    )

    y0 = y[idx]
    y1 = y[idx + 1]
    d0 = d[idx]
    d1 = d[idx + 1]
    # cubic Hermite basis
    t2 = tj * tj
    t3 = t2 * tj
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + tj
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    out = h00 * y0 + h10 * hq * d0 + h01 * y1 + h11 * hq * d1
    return jnp.moveaxis(out, 0, axis)
