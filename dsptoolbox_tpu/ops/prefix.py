"""MXU-blocked prefix sums.

The Schroeder backward integral (reference:
`/root/reference/dsptoolbox/room_acoustics/_room_acoustics.py` `_sum_cumulative`
via ``np.cumsum``) is the dominant primitive of the batched RIR descriptor
battery at fleet scale — XLA lowers ``cumsum`` to a log-depth sequence of
memory passes, which leaves the MXU idle (measured 1.6% fp32-MFU,
`docs/scale_r4.jsonl`).

This module reformulates the scan as dense matmuls: split time into blocks
of L=128 (one MXU tile), compute every within-block inclusive prefix as one
``(B*Nb, L) @ (L, L)`` triangular matmul, then add exclusive block offsets
(a tiny second-level scan over Nb block sums). Total cost is O(B*T*L)
MXU FLOPs instead of O(log T) full-array memory passes — the arithmetic is
free on the systolic array while the log-depth passes are HBM-bound.

All-positive inputs (energy integrals) also gain accuracy: blockwise
summation has O(T/L) error growth vs O(T) for the sequential scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cumsum_mxu"]

_HIGH = jax.lax.Precision.HIGHEST


def _triangular(L: int, reverse: bool, dtype) -> jnp.ndarray:
    # forward inclusive prefix: out[j] = sum_{i<=j} x[i]  ->  U[i, j] = i<=j
    i = np.arange(L)
    tri = (i[:, None] <= i[None, :]) if not reverse else (
        i[:, None] >= i[None, :]
    )
    return jnp.asarray(tri.astype(np.float64), dtype=dtype)


@partial(jax.jit, static_argnames=("reverse", "block"))
def cumsum_mxu(
    x: jnp.ndarray, reverse: bool = False, block: int = 128
) -> jnp.ndarray:
    """Inclusive prefix (or suffix, ``reverse=True``) sum along the last
    axis, computed as blocked triangular matmuls on the MXU.

    Bit-comparable to ``jnp.cumsum`` within fp32 reordering tolerance;
    for the all-positive energy inputs it is built for, the blockwise
    summation is substantially more accurate than a sequential scan
    (rounding error grows with the number of blocks ~T/L instead of with
    T). Falls back to ``jnp.cumsum`` for short axes where the matmul
    cannot amortize.
    """
    x = jnp.asarray(x)
    T = x.shape[-1]
    if T < 2 * block:
        y = jnp.cumsum(x[..., ::-1] if reverse else x, axis=-1)
        return y[..., ::-1] if reverse else y

    nb = -(-T // block)
    pad = nb * block - T
    if pad:
        # zero padding at the tail is neutral for both directions: forward
        # prefixes ignore it, and reversed suffix sums over zeros are zero
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    blocks = x.reshape(*x.shape[:-1], nb, block)

    tri = _triangular(block, reverse, blocks.dtype)
    within = jnp.matmul(blocks, tri, precision=_HIGH)

    # per-block totals -> exclusive offsets across blocks (tiny: nb terms)
    totals = within[..., -1] if not reverse else within[..., 0]
    if reverse:
        offsets = jnp.cumsum(totals[..., ::-1], axis=-1)[..., ::-1] - totals
    else:
        offsets = jnp.cumsum(totals, axis=-1) - totals
    y = within + offsets[..., None]
    y = y.reshape(*y.shape[:-2], nb * block)
    return y[..., :T] if pad else y
