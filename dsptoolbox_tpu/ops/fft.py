"""General-length FFTs for TPU backends that only implement power-of-two
transforms.

XLA's TPU FFT handles general lengths (verified on v5e), so by default these
wrappers are straight pass-throughs to `jnp.fft.*`. For a backend that only
implements power-of-two transforms, set ``DSPTB_BLUESTEIN_FFT=1`` and route
length-sensitive call sites through these wrappers:

- power-of-two length (or a backend with a general FFT, e.g. CPU):
  straight `jnp.fft.*`;
- any other length on TPU: **Bluestein's algorithm** — the length-N DFT
  rewritten as one circular convolution of chirp-modulated sequences,
  evaluated with power-of-two FFTs of size M >= 2N-1. Exact DFT (not an
  approximation), jittable, batched on the minor axis like the native path.

The chirp tables are host-precomputed in f64 per (N, M) and cached, so the
device work is three pow2 FFTs + elementwise products.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax.numpy as jnp

__all__ = ["fft", "ifft", "rfft", "irfft"]


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _needs_bluestein(n: int) -> bool:
    # XLA's TPU FFT handles general lengths (verified on v5e); Bluestein
    # stays available as an opt-in escape hatch for backends that only
    # implement power-of-two transforms.
    import os

    if _is_pow2(n):
        return False
    return os.environ.get("DSPTB_BLUESTEIN_FFT", "0") == "1"


@lru_cache(maxsize=64)
def _bluestein_tables(n: int, inverse: bool):
    """Host f64 chirp tables for the length-n Bluestein DFT.

    Returns (w, B, m): w[k] = exp(∓iπ k²/n) (the modulation chirp) and
    B = pow2-FFT of the zero-padded conjugate chirp b, with b[k] = conj(w)
    wrapped so that b[m-k] = b[k] for k = 1..n-1.
    """
    m = 1 << int(np.ceil(np.log2(2 * n - 1)))
    k = np.arange(n, dtype=np.float64)
    sign = 1.0 if inverse else -1.0
    # exp(sign * i*pi*k^2/n); k^2 mod 2n keeps the argument small/exact
    ksq = (k * k) % (2.0 * n)
    w = np.exp(sign * 1j * np.pi * ksq / n)
    b = np.zeros(m, dtype=np.complex128)
    b[:n] = np.conj(w)
    b[m - n + 1:] = np.conj(w[1:][::-1])
    B = np.fft.fft(b)
    return w, B, m


def _bluestein_fft(x: jnp.ndarray, n: int, axis: int, inverse: bool):
    """Exact length-n (i)DFT of x along `axis` via Bluestein."""
    x = jnp.moveaxis(x, axis, -1)
    T = x.shape[-1]
    if T > n:
        x = x[..., :n]
    elif T < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - T)]
        x = jnp.pad(x, pad)
    cdtype = jnp.result_type(x.dtype, jnp.complex64)
    w, B, m = _bluestein_tables(n, inverse)
    wj = jnp.asarray(w, cdtype)
    Bj = jnp.asarray(B, cdtype)
    a = x.astype(cdtype) * wj
    A = jnp.fft.fft(a, n=m, axis=-1)
    conv = jnp.fft.ifft(A * Bj, axis=-1)[..., :n]
    out = conv * wj
    if inverse:
        out = out / n
    return jnp.moveaxis(out, -1, axis)


def fft(x: jnp.ndarray, n: int | None = None, axis: int = -1,
        norm: str | None = None) -> jnp.ndarray:
    N = int(n if n is not None else x.shape[axis])
    if not _needs_bluestein(N):
        return jnp.fft.fft(x, n=n, axis=axis, norm=norm)
    out = _bluestein_fft(x, N, axis, inverse=False)
    if norm == "ortho":
        out = out / np.sqrt(N)
    elif norm == "forward":
        out = out / N
    return out


def ifft(x: jnp.ndarray, n: int | None = None, axis: int = -1,
         norm: str | None = None) -> jnp.ndarray:
    N = int(n if n is not None else x.shape[axis])
    if not _needs_bluestein(N):
        return jnp.fft.ifft(x, n=n, axis=axis, norm=norm)
    out = _bluestein_fft(x, N, axis, inverse=True)
    if norm == "ortho":
        out = out * np.sqrt(N)
    elif norm == "forward":
        out = out * N
    return out


def rfft(x: jnp.ndarray, n: int | None = None, axis: int = -1,
         norm: str | None = None) -> jnp.ndarray:
    N = int(n if n is not None else x.shape[axis])
    if not _needs_bluestein(N):
        return jnp.fft.rfft(x, n=n, axis=axis, norm=norm)
    full = fft(x, n=N, axis=axis, norm=norm)
    sl = [slice(None)] * full.ndim
    sl[axis if axis >= 0 else full.ndim + axis] = slice(0, N // 2 + 1)
    return full[tuple(sl)]


def irfft(x: jnp.ndarray, n: int | None = None, axis: int = -1,
          norm: str | None = None) -> jnp.ndarray:
    if n is None:
        n = 2 * (x.shape[axis] - 1)
    N = int(n)
    if not _needs_bluestein(N):
        return jnp.fft.irfft(x, n=n, axis=axis, norm=norm)
    # rebuild the full Hermitian spectrum, then exact complex iDFT
    ax = axis if axis >= 0 else x.ndim + axis
    F = N // 2 + 1
    sl = [slice(None)] * x.ndim
    sl[ax] = slice(0, F)
    half = x[tuple(sl)]
    if half.shape[ax] < F:
        # numpy semantics: a short spectrum is zero-padded to N//2+1 bins
        # *before* mirroring (otherwise the conjugate bins land at the wrong
        # frequencies)
        pad = [(0, 0)] * x.ndim
        pad[ax] = (0, F - half.shape[ax])
        half = jnp.pad(half, pad)
    # mirror bins 1..ceil(N/2)-1 reversed, conjugated
    sl_m = [slice(None)] * x.ndim
    sl_m[ax] = slice(1, (N + 1) // 2)
    mirror = jnp.flip(jnp.conj(half[tuple(sl_m)]), axis=ax)
    full = jnp.concatenate([half, mirror], axis=ax)
    out = ifft(full, n=N, axis=ax, norm=norm)
    return out.real
