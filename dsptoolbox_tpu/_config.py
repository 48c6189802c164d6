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


_COMPLEX_TRANSFER_BROKEN: bool | None = None


def _complex_transfer_broken() -> bool:
    """True when the backend cannot move complex buffers across the
    host<->device boundary (the axon TPU tunnel rejects complex transfers
    with UNIMPLEMENTED; complex values may only live *inside* one jitted
    program there). Probed once at first use — the tunnel reports itself
    as a plain "tpu" platform, so feature detection is the only way."""
    global _COMPLEX_TRANSFER_BROKEN
    if _COMPLEX_TRANSFER_BROKEN is not None:
        return _COMPLEX_TRANSFER_BROKEN
    import os

    import jax

    # NOTE: a *runtime* probe is not an option — one failed complex
    # transfer permanently poisons the tunnel client, so detection must
    # be side-effect free. The tunnel sets JAX_PLATFORMS=axon but its
    # devices report a plain "tpu" platform; when the session is forced
    # onto another backend (e.g. CPU for tests) transfers are healthy.
    platforms = os.environ.get("JAX_PLATFORMS", "")
    try:
        active_tpu = jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        active_tpu = False
    _COMPLEX_TRANSFER_BROKEN = "axon" in platforms.lower() and active_tpu
    return _COMPLEX_TRANSFER_BROKEN


def to_host(x):
    """Materialize a device array to numpy, complex-safe on backends with
    broken complex transfers: the split into (real, imag) happens inside
    one jitted program so only real buffers cross the boundary."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    if not isinstance(x, jnp.ndarray) or not jnp.iscomplexobj(x):
        return np.asarray(x)
    if not _complex_transfer_broken():
        return np.asarray(x)
    re, im = jax.jit(lambda v: (v.real, v.imag))(x)
    return np.asarray(re) + 1j * np.asarray(im)


def run_jitted_complex(fn, *args):
    """Run ``fn(*args)`` as one jitted program whose complex results are
    returned to the host safely.

    ``args`` may be numpy/real device arrays (complex numpy inputs are
    split host-side and recombined inside the program). The pytree of
    results is materialized with complex-safe transfers. Use this to wrap
    eager complex pipelines for backends where complex buffers cannot
    cross the host boundary; on healthy backends it is a plain jit call.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    if not _complex_transfer_broken():
        out = jax.jit(fn)(*args)
        return jax.tree_util.tree_map(np.asarray, out)

    split_args = []
    spec = []
    for a in args:
        a_np = a if isinstance(a, jnp.ndarray) else np.asarray(a)
        if np.iscomplexobj(a_np) and not isinstance(a_np, jnp.ndarray):
            split_args.extend([np.real(a_np), np.imag(a_np)])
            spec.append(True)
        else:
            split_args.append(a_np)
            spec.append(False)

    meta: dict = {}

    def wrapper(*flat):
        rebuilt = []
        it = iter(flat)
        for is_c in spec:
            if is_c:
                re = next(it)
                rebuilt.append(re + 1j * next(it))
            else:
                rebuilt.append(next(it))
        out = fn(*rebuilt)
        leaves, treedef = jax.tree_util.tree_flatten(out)
        flags = [bool(jnp.iscomplexobj(v)) for v in leaves]
        meta["treedef"] = treedef
        meta["flags"] = flags
        expanded = []
        for v, is_c in zip(leaves, flags):
            if is_c:
                expanded.extend([v.real, v.imag])
            else:
                expanded.append(v)
        return tuple(expanded)

    res = jax.jit(wrapper)(*split_args)
    out_leaves = []
    it = iter(res)
    for is_c in meta["flags"]:
        if is_c:
            re = np.asarray(next(it))
            out_leaves.append(re + 1j * np.asarray(next(it)))
        else:
            out_leaves.append(np.asarray(next(it)))
    return jax.tree_util.tree_unflatten(meta["treedef"], out_leaves)
