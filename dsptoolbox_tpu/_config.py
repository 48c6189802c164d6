"""Global numeric configuration for dsptoolbox_tpu.

TPU-first defaults: float32 / complex64. The reference package
(`/root/reference/dsptoolbox`) runs everything in numpy float64; on TPU the
native fast path is fp32 (and bf16 on the MXU), so fp32 is the default here.
Enable float64 (CPU debugging / tight oracle comparisons) with
``jax.config.update("jax_enable_x64", True)`` *before* importing jax arrays and
``set_default_float("float64")``.
"""

from __future__ import annotations

import jax.numpy as jnp

_FLOAT = jnp.float32
_COMPLEX = jnp.complex64


def set_default_float(dtype) -> None:
    """Set the package-wide real dtype ("float32" or "float64")."""
    global _FLOAT, _COMPLEX
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float32:
        _FLOAT, _COMPLEX = jnp.float32, jnp.complex64
    elif dtype == jnp.float64:
        _FLOAT, _COMPLEX = jnp.float64, jnp.complex128
    else:
        raise ValueError(f"Unsupported default float dtype: {dtype}")


def default_float():
    """Package-wide real floating dtype."""
    return _FLOAT


def default_complex():
    """Package-wide complex floating dtype."""
    return _COMPLEX
