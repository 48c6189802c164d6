"""Pallas kernel: fused framing + windowing + per-frame detrend.

The STFT front-end (`ops/spectral.py:_windowed_frames`) is HBM-bound: the
XLA path materializes the framed copy, the windowed product, and the
demeaned frames as separate buffers. This kernel produces the final
windowed/demeaned frames in ONE pass over HBM: each grid program reads the
``window_length // step`` input chunks of its frame, multiplies by the
window, subtracts the frame mean, and writes the finished frame.

TPU lowering constraints shape the layout: blocks must tile the last two
dims by (8, 128), so the kernel emits frames as ``(K, B, L)`` (one frame
across the whole batch per program) and the caller transposes — a single
cheap copy instead of three full materializations.

Restrictions (checked by `windowed_frames_fused`): ``window % step == 0``,
batch divisible by 8, step divisible by 128. Falls back to the XLA slice
path otherwise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _frames_kernel_factory(k_parts: int, detrend: bool):
    def kernel(*refs):
        x_refs = refs[:k_parts]
        win_ref = refs[k_parts]
        o_ref = refs[k_parts + 1]
        frame = jnp.concatenate(
            [r[...] for r in x_refs], axis=-1
        )  # (B, L)
        frame = frame * win_ref[...]
        if detrend:
            frame = frame - jnp.mean(frame, axis=-1, keepdims=True)
        o_ref[0, :, :] = frame

    return kernel


def windowed_frames_pallas(
    x: jnp.ndarray,
    window: np.ndarray,
    step: int,
    n_frames: int,
    detrend: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused windowed/demeaned frames of ``x (B, T)`` → ``(B, K, L)``.

    ``window`` length L must be a multiple of ``step``; ``x`` must satisfy
    ``T >= (n_frames - 1) * step + L`` (caller pads); ``B % 8 == 0`` and
    ``step % 128 == 0`` (TPU tiling).
    """
    L = len(window)
    assert L % step == 0, "pallas framing needs window % step == 0"
    k_parts = L // step
    B, T = x.shape
    span = (n_frames - 1) * step + L
    assert T >= span, f"input too short: {T} < {span}"
    assert B % 8 == 0 and step % 128 == 0, "TPU tiling constraints"
    win = jnp.asarray(window, x.dtype)[None, :]  # (1, L)

    in_specs = [
        pl.BlockSpec((B, step), lambda k, j=j: (0, k + j))
        for j in range(k_parts)
    ]
    in_specs.append(pl.BlockSpec((1, L), lambda k: (0, 0)))
    out_spec = pl.BlockSpec((1, B, L), lambda k: (k, 0, 0))

    out = pl.pallas_call(
        _frames_kernel_factory(k_parts, detrend),
        grid=(n_frames,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_frames, B, L), x.dtype),
        interpret=interpret,
    )(*([x] * k_parts), win)
    return jnp.moveaxis(out, 0, 1)  # (B, K, L)


def windowed_frames_fused(
    x: jnp.ndarray,
    window: np.ndarray,
    step: int,
    detrend: bool,
) -> jnp.ndarray | None:
    """Dispatcher: returns the fused Pallas result for eligible shapes on
    TPU, or None (caller falls back to the XLA slice path).

    Eligibility: 2D input, window % step == 0, batch % 8 == 0,
    step % 128 == 0, running on a TPU-like backend.
    """

    from .framing import compute_number_frames

    if x.ndim != 2:
        return None
    L = len(window)
    if L % step or x.shape[0] % 8 or step % 128:
        return None
    from .._config import mosaic_healthy

    if not mosaic_healthy():
        return None
    T = x.shape[-1]
    n_frames, _ = compute_number_frames(L, step, T, True)
    span = (n_frames - 1) * step + L
    if span > T:
        x = jnp.pad(x, ((0, 0), (0, span - T)))
    try:
        return windowed_frames_pallas(x, window, step, n_frames, detrend)
    except Exception:  # pragma: no cover - lowering not supported
        return None
