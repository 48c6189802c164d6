"""Static pad/trim primitives (jit-safe: lengths are Python ints)."""

from __future__ import annotations

import jax.numpy as jnp


def pad_trim_axis(
    x: jnp.ndarray,
    desired_length: int,
    axis: int = -1,
    in_the_end: bool = True,
) -> jnp.ndarray:
    """Zero-pad or trim ``x`` along ``axis`` to ``desired_length``.

    Mirrors `dsptoolbox/helpers/other.py:216` (`_pad_trim`) but with static
    lengths so it is jit-compatible.
    """
    axis = axis % x.ndim
    current = x.shape[axis]
    if current == desired_length:
        return x
    if current < desired_length:
        extra = desired_length - current
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, extra) if in_the_end else (extra, 0)
        return jnp.pad(x, widths)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, desired_length) if in_the_end else slice(
        current - desired_length, current
    )
    return x[tuple(sl)]
