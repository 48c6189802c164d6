"""Polyphase decomposition/reconstruction as pure reshapes.

Reference: `dsptoolbox/helpers/polyphase.py` — its strided per-component
loops become a pad + reshape + transpose, which XLA compiles to a relayout.
Convention matches the reference: (time, poly, channels) in/out, time first.
"""

from __future__ import annotations

import jax.numpy as jnp


def polyphase_decomposition(
    in_sig: jnp.ndarray, number_polyphase_components: int, flip: bool = False
):
    """``(T, C)`` → ``(T/n, n, C)`` polyphase representation (+ front padding
    count). Pads the *beginning* so T divides n, like the reference."""
    if in_sig.ndim == 1:
        in_sig = in_sig[..., None]
    assert in_sig.ndim == 2, (
        "Vector should have exactly two dimensions: (time samples, channels)"
    )
    n = number_polyphase_components
    remainder = in_sig.shape[0] % n
    padding = n - remainder
    if remainder != 0:
        in_sig = jnp.pad(in_sig, ((padding, 0), (0, 0)))
    poly = in_sig.reshape(in_sig.shape[0] // n, n, in_sig.shape[1])
    if flip:
        poly = jnp.flip(poly, axis=1)
    return poly, padding


def polyphase_reconstruction(poly: jnp.ndarray) -> jnp.ndarray:
    """``(T/n, n, C)`` → ``(T, C)`` (inverse interleave, one reshape)."""
    if poly.ndim == 2:
        poly = poly[..., None]
    assert poly.ndim == 3, (
        "Invalid shape. The dimensions must be (time samples, polyphase "
        "components, channels)"
    )
    return poly.reshape(poly.shape[0] * poly.shape[1], poly.shape[2])
