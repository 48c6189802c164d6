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


_LAZY_HOST: bool | None = None  # None = auto (on in fp32, off in f64 mode)


def set_lazy_host_returns(enabled: bool | None) -> None:
    """Override lazy host returns for the default getter API.

    ``True``/``False`` force the behavior; ``None`` restores the default:
    lazy in float32 mode (TPU production path — getters return
    :class:`~dsptoolbox_tpu.classes.lazy_array.LazyHostArray` views that
    fetch on first host access), eager plain-numpy in float64 mode (the
    bit-exact reference-compat mode used by the drop-in alias runner)."""
    global _LAZY_HOST
    _LAZY_HOST = enabled


def lazy_host_returns() -> bool:
    """Whether default getters return lazy device-backed host arrays."""
    if _LAZY_HOST is not None:
        return _LAZY_HOST
    return _FLOAT == jnp.float32


_DEFERRED: bool | None = None  # None = auto (follows lazy_host_returns)


def set_deferred_execution(enabled: bool | None) -> None:
    """Override deferred (auto-fused) dispatch of the default lazy API.

    ``True``/``False`` force it; ``None`` restores the default: deferred
    whenever lazy host returns are active. See
    :mod:`dsptoolbox_tpu._defer` for semantics."""
    global _DEFERRED
    _DEFERRED = enabled


def deferred_execution() -> bool:
    """Whether hot producers record deferred programs instead of
    launching one device program per public call."""
    if _DEFERRED is not None:
        return _DEFERRED
    return lazy_host_returns()


_CLEAN_SC_DEVICE: bool = True


def set_clean_sc_on_device(enabled: bool) -> None:
    """Dispatch override for CLEAN-SC: ``True`` (default) runs the whole
    deconvolution — all frequency bins, initial map included — as one
    batched device program; ``False`` restores the host per-bin loop
    (the parity oracle)."""
    global _CLEAN_SC_DEVICE
    _CLEAN_SC_DEVICE = bool(enabled)


def clean_sc_on_device() -> bool:
    return _CLEAN_SC_DEVICE


_MOSAIC_HEALTHY: bool | None = None
_MOSAIC_PROBE_TIMEOUT_S = 45.0
_MOSAIC_CACHE_TTL_S = 600.0


def mosaic_healthy() -> bool:
    """True when the active TPU backend compiles Mosaic (Pallas) kernels.

    The tunneled dev backend's Mosaic compile service wedges
    nondeterministically: the same `pallas_call` that compiles in ~2 s can
    hang indefinitely minutes later, and a hung compile cannot be
    cancelled in-process. Every Pallas dispatch site therefore consults
    this one-time *subprocess* probe (tiny kernel, hard deadline); on
    timeout the library stays on its XLA formulations, which every Pallas
    path has. The verdict is cached per process and, with a TTL, in the
    temp dir so short-lived processes don't re-pay the probe.
    """
    global _MOSAIC_HEALTHY
    if _MOSAIC_HEALTHY is not None:
        return _MOSAIC_HEALTHY
    import jax

    try:
        if jax.default_backend() != "tpu":
            _MOSAIC_HEALTHY = False
            return False
    except RuntimeError:  # pragma: no cover
        _MOSAIC_HEALTHY = False
        return False

    import json
    import os
    import subprocess
    import sys
    import tempfile
    import time

    cache = os.path.join(tempfile.gettempdir(), "dsptb_mosaic_probe.json")
    try:
        with open(cache) as f:
            rec = json.load(f)
        if time.time() - rec["time"] < _MOSAIC_CACHE_TTL_S:
            _MOSAIC_HEALTHY = bool(rec["ok"])
            return _MOSAIC_HEALTHY
    except (OSError, ValueError, KeyError):
        pass

    probe = (
        "import jax, jax.numpy as jnp\n"
        "from jax.experimental import pallas as pl\n"
        "def k(x_ref, o_ref):\n"
        "    o_ref[:] = x_ref[:] + 1.0\n"
        "x = jnp.zeros((8, 128), jnp.float32)\n"
        "y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)\n"
        "jax.block_until_ready(y)\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=_MOSAIC_PROBE_TIMEOUT_S,
            capture_output=True,
        )
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    _MOSAIC_HEALTHY = ok
    try:
        with open(cache, "w") as f:
            json.dump({"ok": ok, "time": time.time()}, f)
    except OSError:  # pragma: no cover
        pass
    return ok


_PALLAS_IIR_MODE = "auto"  # "auto" (TPU only) | "on" | "off"

# Zero-state filter-BANK formulation: "block" (default) or "freq".
# Value-fetch-synced TPU v5e measurements (BASELINE.md round 3): the
# blocked state-space path beats frequency sampling at every measured
# (bank, T) — 26-band complex gammatone @442k: 4.3 vs 8.5 ms; 22-band
# fractional-octave @442k: 3.5 vs 18.5 ms (narrow low bands blow up the
# decay margin and with it the FFT length). "freq" remains available for
# experimentation.
_BANK_PATH = "block"


def set_bank_path(mode: str) -> None:
    assert mode in ("block", "freq")
    global _BANK_PATH
    _BANK_PATH = mode


def bank_path() -> str:
    return _BANK_PATH


_PALLAS_DAS_MODE = "auto"  # "auto" (TPU only) | "on" | "off"


def set_pallas_das(mode: str) -> None:
    """Select the DAS-map kernel: "auto" uses the fused Pallas
    steering+quadratic kernel (`ops.pallas_das`) on healthy TPU backends
    in fp32 mode, "on" forces it (interpret mode off-TPU — testing
    only), "off" always uses the XLA packed-quadratic path."""
    global _PALLAS_DAS_MODE
    assert mode in ("auto", "on", "off"), mode
    _PALLAS_DAS_MODE = mode


def pallas_das_mode() -> str:
    return _PALLAS_DAS_MODE


def set_pallas_iir(mode: str) -> None:
    """Select the blocked-IIR lead kernel: "auto" uses the Pallas
    time-tiled kernel on TPU backends when the regime favours it (see
    `ops.iir_block`), "on" forces it (interpret mode off-TPU is slow —
    testing only), "off" always uses the XLA doubling-prefix path."""
    global _PALLAS_IIR_MODE
    assert mode in ("auto", "on", "off"), mode
    _PALLAS_IIR_MODE = mode


def pallas_iir_mode() -> str:
    return _PALLAS_IIR_MODE


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


def _split_complex(v):
    return (v.real, v.imag)


_SPLIT_COMPLEX_JIT = None


def to_host(x):
    """Materialize a device array to numpy, complex-safe on backends with
    broken complex transfers: the split into (real, imag) happens inside
    one jitted program so only real buffers cross the boundary."""
    global _SPLIT_COMPLEX_JIT
    import numpy as np

    import jax
    import jax.numpy as jnp

    if not isinstance(x, jnp.ndarray) or not jnp.iscomplexobj(x):
        return np.asarray(x)
    if not _complex_transfer_broken():
        return np.asarray(x)
    if _SPLIT_COMPLEX_JIT is None:
        # module-level jit: one compile per shape, not one per call
        _SPLIT_COMPLEX_JIT = jax.jit(_split_complex)
    re, im = _SPLIT_COMPLEX_JIT(x)
    return np.asarray(re) + 1j * np.asarray(im)


class _Unfreezable(Exception):
    """Raised when a closure value cannot be turned into a cache key."""


_CONTENT_HASH_CACHE: "dict" = {}


def _content_hash_cached(v) -> int:
    """Content hash of an IMMUTABLE (jax device) array, memoized by object
    identity — hashing would otherwise pay a device→host transfer on
    every call just to compute the cache key. Identity is validated by
    keeping a reference in the cache entry; the cache is bounded. Do not
    use for mutable numpy arrays."""
    import numpy as np

    key = id(v)
    entry = _CONTENT_HASH_CACHE.get(key)
    if entry is not None and entry[0] is v:
        return entry[1]
    h = hash(np.ascontiguousarray(np.asarray(v)).tobytes())
    if len(_CONTENT_HASH_CACHE) > 256:
        _CONTENT_HASH_CACHE.clear()
    _CONTENT_HASH_CACHE[key] = (v, h)
    return h


def _freeze_value(v):
    """Deterministic hashable token for a value captured in a closure.

    Library call sites pass locally-defined lambdas to
    :func:`run_jitted_complex`; a fresh function object per call would
    defeat jax.jit's cache (function identity is part of its key) and force
    a recompile on *every* call — seconds per op on the tunneled TPU. Two
    lambdas with the same code object and equal captured values denote the
    same program, so their frozen closures may share one compiled program.
    """
    import enum

    import numpy as np

    import jax.numpy as jnp

    # enums first: IntEnum subclasses int and would alias as a bare scalar
    if isinstance(v, enum.Enum):
        return ("enum", type(v).__qualname__, v.name)
    if isinstance(v, (int, float, bool, str, bytes, complex, type(None))):
        # include the type: True/1/1.0 hash equal but trace to different
        # programs under dtype promotion
        return (type(v).__name__, v)
    if isinstance(v, np.ndarray):
        # numpy arrays are mutable — hash content on every call (cheap on
        # host); only immutable device arrays get the identity memo below
        b = np.ascontiguousarray(v).tobytes()
        return ("nd", v.shape, str(v.dtype), len(b), hash(b))
    if isinstance(v, jnp.ndarray):
        if jnp.iscomplexobj(v) and _complex_transfer_broken():
            raise _Unfreezable  # cannot pull it to host to hash it
        # hashing pulls the buffer host-side (slow on tunneled backends):
        # memoize by identity so each captured device array is fetched once
        return ("jd", v.shape, str(v.dtype), _content_hash_cached(v))
    if isinstance(v, (tuple, list)):
        return (type(v).__name__,) + tuple(_freeze_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(
            sorted((str(k), _freeze_value(x)) for k, x in v.items())
        )
    if callable(v) and hasattr(v, "__code__"):
        return _freeze_function(v)
    # generic objects (closures capturing `self`): type + instance dict.
    # Mutating the object changes the key, forcing a correct retrace.
    d = getattr(v, "__dict__", None)
    if d is not None:
        return (
            "obj",
            type(v).__module__,
            type(v).__qualname__,
            _freeze_value(d),
        )
    raise _Unfreezable


def _freeze_function(fn):
    """Key a function by code object + frozen closure + frozen defaults."""
    import functools

    if isinstance(fn, functools.partial):
        return (
            "partial",
            _freeze_function(fn.func),
            tuple(_freeze_value(a) for a in fn.args),
            tuple(
                sorted(
                    (k, _freeze_value(v)) for k, v in fn.keywords.items()
                )
            ),
        )
    code = getattr(fn, "__code__", None)
    if code is None:
        raise _Unfreezable
    cells = getattr(fn, "__closure__", None) or ()
    try:
        frozen_cells = tuple(_freeze_value(c.cell_contents) for c in cells)
    except ValueError:  # empty cell
        raise _Unfreezable
    defaults = getattr(fn, "__defaults__", None) or ()
    # bound methods share code+closure across instances; the receiver is
    # part of the program
    bound_self = getattr(fn, "__self__", None)
    # the code object itself is the identity token (hashable; holding it in
    # the key also keeps it alive, so ids cannot be recycled)
    return (
        "fn",
        code,
        frozen_cells,
        tuple(_freeze_value(d) for d in defaults),
        _freeze_value(bound_self) if bound_self is not None else None,
    )


_RJC_CACHE: "dict" = {}
_RJC_CACHE_MAX = 512


def _rjc_cache_get(key):
    entry = _RJC_CACHE.pop(key, None)
    if entry is not None:
        _RJC_CACHE[key] = entry  # re-insert: LRU order
    return entry


def _rjc_cache_put(key, entry) -> None:
    _RJC_CACHE[key] = entry
    while len(_RJC_CACHE) > _RJC_CACHE_MAX:
        _RJC_CACHE.pop(next(iter(_RJC_CACHE)))


def run_maybe_jitted(fn, *args):
    """Dispatch policy for real-valued library kernels: jit-wrap on
    accelerators (per-op dispatch latency dominates on the tunneled TPU)
    but run eagerly on CPU — XLA's whole-program fusion reassociates the
    fp32 block-IIR recurrence and shifts near-unit-pole tails by ~1e-3,
    and the scipy-oracle tests pin the eager op-by-op rounding."""
    import jax

    if jax.default_backend() == "cpu":
        return fn(*args)
    return run_jitted_complex(fn, *args, materialize=False)


def run_jitted_complex(
    fn, *args, materialize: bool = True, key=None, defer: bool = False
):
    """Run ``fn(*args)`` as one jitted program whose complex results are
    returned to the host safely.

    With ``materialize=False`` real result leaves stay device arrays
    (complex leaves are still recombined host-side when the backend cannot
    transfer them — producers that must stay fully on-device should return
    real/imag parts as separate leaves).

    ``args`` may be numpy/real device arrays (complex numpy inputs are
    split host-side and recombined inside the program). The pytree of
    results is materialized with complex-safe transfers. Use this to wrap
    eager complex pipelines for backends where complex buffers cannot
    cross the host boundary; on healthy backends it is a plain jit call.

    Compiled programs are cached across calls even for locally-defined
    lambdas: the cache key is the code object plus frozen captured values
    (see :func:`_freeze_value`), so repeated library calls do not retrace.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ._defer import DeferredArray, force_value

    broken = _complex_transfer_broken()

    # deferral is only sound for concrete-argument, cacheable programs:
    # inside an outer trace (dsp.pipeline) the args are tracers and the
    # call must inline as before
    defer = (
        defer
        and deferred_execution()
        and not any(isinstance(a, jax.core.Tracer) for a in args)
    )

    split_args = []
    spec = []
    for a in args:
        if isinstance(a, DeferredArray):
            # pending program output: joins the deferred DAG when this
            # call defers, otherwise computes now (safe fallback)
            split_args.append(a if defer else force_value(a))
            spec.append(False)
            continue
        a_np = a if isinstance(a, jnp.ndarray) else np.asarray(a)
        if (
            broken
            and np.iscomplexobj(a_np)
            and not isinstance(a_np, jnp.ndarray)
        ):
            split_args.extend([np.real(a_np), np.imag(a_np)])
            spec.append(True)
        else:
            split_args.append(a_np)
            spec.append(False)

    shapes = tuple((tuple(a.shape), a.dtype) for a in split_args)
    if key is not None:
        # caller-supplied program identity: skips the closure freezer
        # (walking/hashing captured values costs ~0.5 ms per call on hot
        # library paths). The caller must include every value the traced
        # program depends on; arg shapes/dtypes are appended here.
        key = ("explicit", key, tuple(spec), shapes, broken)
    else:
        try:
            key = (
                _freeze_function(fn),
                tuple(spec),
                shapes,
                broken,
            )
        except (_Unfreezable, RecursionError):
            key = None

    entry = _rjc_cache_get(key) if key is not None else None
    if entry is None:
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
            split_out = []
            for v, is_c in zip(leaves, flags):
                if is_c and broken:
                    expanded.extend([v.real, v.imag])
                    split_out.append(True)
                else:
                    expanded.append(v)
                    split_out.append(False)
            meta["split_out"] = split_out
            return tuple(expanded)

        entry = {"jitted": jax.jit(wrapper), "meta": meta}
        if key is not None:
            _rjc_cache_put(key, entry)

    meta = entry["meta"]
    if defer and key is not None:
        from ._defer import flush_values, make_node

        outs = make_node(entry["jitted"], ("rjc", key), split_args)
        if "split_out" not in meta:
            # entry was rebuilt after cache eviction while the aval
            # cache still had the key: populate meta with one abstract
            # trace (no device execution)
            from ._defer import _abstract

            jax.eval_shape(
                entry["jitted"], *[_abstract(a) for a in split_args]
            )
        if any(meta["split_out"]):
            # complex outputs that must recombine host-side cannot stay
            # deferred: compute now and fall through to the eager path
            flush_values(*outs)
            res = tuple(o.force() for o in outs)
        else:
            out_leaves = []
            it = iter(outs)
            for _ in meta["split_out"]:
                out_leaves.append(next(it))
            return jax.tree_util.tree_unflatten(
                meta["treedef"], out_leaves
            )
    else:
        res = entry["jitted"](*split_args)
    out_leaves = []
    it = iter(res)
    for is_c in meta["split_out"]:
        if is_c:
            re = np.asarray(next(it))
            out_leaves.append(re + 1j * np.asarray(next(it)))
        elif materialize:
            out_leaves.append(np.asarray(next(it)))
        else:
            # keep real leaves on the device: device→host runs at
            # ~15 MB/s on the tunneled backend, so callers that continue
            # on-device must not pay a transfer here
            out_leaves.append(next(it))
    return jax.tree_util.tree_unflatten(meta["treedef"], out_leaves)
