"""Safe (non-pickle) object persistence: `.npz` archives + JSON metadata.

The reference persists objects with pickle (`classes/signal.py:1604-1606`,
`classes/filter.py:1242-1264`, `classes/filterbank.py:1009`,
`classes/spectrum.py:974`, loaded by `standard/other.py:33`). Pickle executes
arbitrary code on load; this module is the rebuild's safe alternative: all
arrays go into a numpy ``.npz`` archive and everything else into one JSON
record. ``load_object`` can therefore never execute code from the file.

Supported types: ``Signal``, ``ImpulseResponse``, ``MultiBandSignal``,
``Filter``, ``FilterBank``, ``Spectrum``.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["save_object", "load_object"]

_FORMAT_VERSION = 1


# ======== helpers ==========================================================


def _jsonable(d: dict) -> dict:
    """Keep only JSON-serializable entries of an info/metadata dict."""
    out = {}
    for k, v in d.items():
        try:
            json.dumps(v)
        except TypeError:
            continue
        out[str(k)] = v
    return out


def _ensure_npz(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


# ======== per-type encoders =================================================
# Each encoder returns (meta: dict, arrays: dict[str, np.ndarray]); array keys
# are flattened with prefixes so containers nest arbitrarily deep.


def _encode_signal(sig, prefix: str = "") -> tuple[dict, dict]:
    td = np.asarray(sig._get_data())  # composes real+imag for analytic sigs
    meta = {
        "kind": type(sig).__name__,
        "sampling_rate_hz": int(sig.sampling_rate_hz),
        "constrain_amplitude": bool(sig.constrain_amplitude),
        "calibrated_signal": bool(getattr(sig, "calibrated_signal", False)),
        "activate_cache": bool(getattr(sig, "activate_cache", False)),
    }
    arrays = {prefix + "time_data": td}
    window = getattr(sig, "window", None)
    if window is not None:
        arrays[prefix + "window"] = np.asarray(window)
        meta["has_window"] = True
    return meta, arrays


def _decode_signal(meta: dict, arrays: dict, prefix: str = ""):
    from ..classes import ImpulseResponse, Signal

    cls = ImpulseResponse if meta["kind"] == "ImpulseResponse" else Signal
    sig = cls.from_time_data(
        arrays[prefix + "time_data"],
        meta["sampling_rate_hz"],
        meta["constrain_amplitude"],
    )
    sig.calibrated_signal = meta.get("calibrated_signal", False)
    sig.activate_cache = meta.get("activate_cache", False)
    if meta.get("has_window"):
        sig.window = arrays[prefix + "window"]
    return sig


def _encode_filter(filt, prefix: str = "") -> tuple[dict, dict]:
    meta = {
        "kind": "Filter",
        "sampling_rate_hz": int(filt.sampling_rate_hz),
        "warning_if_complex": bool(
            getattr(filt, "warning_if_complex", True)
        ),
    }
    arrays: dict = {}
    # Save the representation the filter was built from (zpk implies sos was
    # derived at construction; ba-only FIR filters must stay exactly ba).
    for rep in ("zpk", "ba", "sos"):
        try:
            coeffs = getattr(filt, rep)
        except AttributeError:
            continue
        meta["representation"] = rep
        if rep == "zpk":
            z, p, k = coeffs
            arrays[prefix + "z"] = np.asarray(z)
            arrays[prefix + "p"] = np.asarray(p)
            arrays[prefix + "k"] = np.asarray(k)
        elif rep == "ba":
            arrays[prefix + "b"] = np.asarray(coeffs[0])
            arrays[prefix + "a"] = np.asarray(coeffs[1])
        else:
            arrays[prefix + "sos"] = np.asarray(coeffs)
        break
    else:
        raise ValueError("Filter holds no zpk/sos/ba coefficients")
    info = getattr(filt, "info", None)
    if isinstance(info, dict):
        meta["info"] = _jsonable(info)
    return meta, arrays


def _decode_filter(meta: dict, arrays: dict, prefix: str = ""):
    from ..classes import Filter

    fs = meta["sampling_rate_hz"]
    rep = meta["representation"]
    if rep == "zpk":
        filt = Filter.from_zpk(
            arrays[prefix + "z"],
            arrays[prefix + "p"],
            arrays[prefix + "k"],
            fs,
        )
    elif rep == "ba":
        filt = Filter.from_ba(arrays[prefix + "b"], arrays[prefix + "a"], fs)
    else:
        filt = Filter.from_sos(arrays[prefix + "sos"], fs)
    filt.warning_if_complex = meta.get("warning_if_complex", True)
    return filt


def _encode_multiband(mb, prefix: str = "") -> tuple[dict, dict]:
    meta = {
        "kind": "MultiBandSignal",
        "same_sampling_rate": bool(mb.same_sampling_rate),
        "info": _jsonable(getattr(mb, "info", {}) or {}),
        "bands": [],
    }
    arrays: dict = {}
    for n, band in enumerate(mb.bands):
        bmeta, barrs = _encode_signal(band, prefix=f"{prefix}b{n}__")
        meta["bands"].append(bmeta)
        arrays.update(barrs)
    return meta, arrays


def _decode_multiband(meta: dict, arrays: dict, prefix: str = ""):
    from ..classes import MultiBandSignal

    bands = [
        _decode_signal(bmeta, arrays, prefix=f"{prefix}b{n}__")
        for n, bmeta in enumerate(meta["bands"])
    ]
    return MultiBandSignal(
        bands,
        same_sampling_rate=meta["same_sampling_rate"],
        info=meta.get("info", {}),
    )


def _encode_filterbank(fb, prefix: str = "") -> tuple[dict, dict]:
    meta = {
        "kind": "FilterBank",
        "same_sampling_rate": bool(fb.same_sampling_rate),
        "info": _jsonable(getattr(fb, "info", {}) or {}),
        "filters": [],
    }
    arrays: dict = {}
    for n, filt in enumerate(fb.filters):
        fmeta, farrs = _encode_filter(filt, prefix=f"{prefix}f{n}__")
        meta["filters"].append(fmeta)
        arrays.update(farrs)
    return meta, arrays


def _decode_filterbank(meta: dict, arrays: dict, prefix: str = ""):
    from ..classes import FilterBank

    filters = [
        _decode_filter(fmeta, arrays, prefix=f"{prefix}f{n}__")
        for n, fmeta in enumerate(meta["filters"])
    ]
    return FilterBank(
        filters,
        same_sampling_rate=meta["same_sampling_rate"],
        info=meta.get("info", {}),
    )


def _encode_spectrum(spec, prefix: str = "") -> tuple[dict, dict]:
    meta = {"kind": "Spectrum"}
    arrays = {
        prefix + "frequency_vector_hz": np.asarray(spec.frequency_vector_hz),
        prefix + "spectral_data": np.asarray(spec.spectral_data),
    }
    if getattr(spec, "has_coherence", False):
        arrays[prefix + "coherence"] = np.asarray(spec.coherence)
        meta["has_coherence"] = True
    return meta, arrays


def _decode_spectrum(meta: dict, arrays: dict, prefix: str = ""):
    from ..classes import Spectrum

    spec = Spectrum(
        arrays[prefix + "frequency_vector_hz"],
        arrays[prefix + "spectral_data"],
    )
    if meta.get("has_coherence"):
        spec.set_coherence(arrays[prefix + "coherence"])
    return spec


_DECODERS = {
    "Signal": _decode_signal,
    "ImpulseResponse": _decode_signal,
    "MultiBandSignal": _decode_multiband,
    "Filter": _decode_filter,
    "FilterBank": _decode_filterbank,
    "Spectrum": _decode_spectrum,
}


# ======== public API ========================================================


def save_object(obj, path: str) -> str:
    """Save a supported container to ``path`` (``.npz`` appended if missing).

    Safe replacement for the reference's pickle persistence: arrays +
    JSON metadata only, no code execution on load.
    """
    name = type(obj).__name__
    if name == "ImpulseResponse" or name == "Signal":
        meta, arrays = _encode_signal(obj)
    elif name == "MultiBandSignal":
        meta, arrays = _encode_multiband(obj)
    elif name == "Filter":
        meta, arrays = _encode_filter(obj)
    elif name == "FilterBank":
        meta, arrays = _encode_filterbank(obj)
    elif name == "Spectrum":
        meta, arrays = _encode_spectrum(obj)
    else:
        raise TypeError(
            f"Unsupported type for safe persistence: {name}. Supported: "
            f"{sorted(_DECODERS)}"
        )
    meta["format_version"] = _FORMAT_VERSION
    path = _ensure_npz(path)
    np.savez(path, __meta__=np.asarray(json.dumps(meta)), **arrays)
    return path


def load_object(path: str):
    """Load an object saved by :func:`save_object`."""
    path = _ensure_npz(path)
    with np.load(path, allow_pickle=False) as npz:
        meta = json.loads(str(npz["__meta__"][()]))
        arrays = {k: npz[k] for k in npz.files if k != "__meta__"}
    kind = meta.get("kind")
    if kind not in _DECODERS:
        raise ValueError(f"Unknown object kind in archive: {kind!r}")
    return _DECODERS[kind](meta, arrays)
