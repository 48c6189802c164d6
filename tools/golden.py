"""Golden-value checker for the TPU hardware smoke.

`tools/tpu_smoke.py --make-golden` runs every stage on the CPU oracle
backend and commits compact digests (deterministic 256-point subsample +
L2 norm per output) to `tools/golden/tpu_smoke_golden.npz`. The normal
TPU run recomputes the digests and asserts them within fp32 cross-
backend tolerances (see docs/parity_notes.md) — so a stage that silently
produces wrong numbers on the accelerator FAILS the smoke instead of
merely not crashing.
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "golden",
    "tpu_smoke_golden.npz",
)

_N_SAMPLE = 256


def _digest(value) -> np.ndarray:
    """shape + deterministic subsample + L2 norm, flattened to one real
    f64 vector (complex values contribute re and im interleaved)."""
    arr = np.asarray(value)
    if arr.dtype.kind in "ib":
        arr = arr.astype(np.float64)
    flat = arr.ravel()
    n = flat.size
    idx = (
        np.linspace(0, n - 1, min(n, _N_SAMPLE)).astype(np.int64)
        if n
        else np.zeros(0, np.int64)
    )
    sample = flat[idx]
    if np.iscomplexobj(sample):
        sample = np.stack([sample.real, sample.imag], -1).ravel()
    norm = np.linalg.norm(flat.astype(np.complex128 if
                                      np.iscomplexobj(flat) else
                                      np.float64))
    max_abs = float(np.max(np.abs(flat))) if n else 0.0
    return np.concatenate(
        [
            np.asarray(arr.shape, np.float64),
            np.asarray([float(norm), max_abs]),
            sample.astype(np.float64),
        ]
    )


class GoldenChecker:
    def __init__(self, make: bool, path: str = GOLDEN_PATH):
        self.make = make
        self.path = path
        self.failures: list[str] = []
        if make:
            self.data: dict = {}
        else:
            assert os.path.exists(path), (
                f"no golden file at {path} — run tpu_smoke.py --make-golden "
                "on the CPU oracle backend first"
            )
            self.data = dict(np.load(path))

    def check(self, name: str, value, rtol=5e-3, atol=1e-3) -> None:
        """``atol`` is RELATIVE TO THE ARRAY'S OWN MAX MAGNITUDE — the
        honest scale for fp32 cross-backend comparison of peaky spectra /
        transients (an RMS-relative atol flags benign absolute error at
        near-zero sample points)."""
        d = _digest(value)
        if self.make:
            assert name not in self.data, f"duplicate golden name {name}"
            self.data[name] = d
            return
        ref = self.data.get(name)
        if ref is None:
            self.failures.append(f"{name}: no golden entry (regenerate)")
            return
        ndim = np.asarray(value).ndim
        if not np.array_equal(ref[:ndim], d[:ndim]):
            self.failures.append(
                f"{name}: shape {d[:ndim]} != golden {ref[:ndim]}"
            )
            return
        max_abs = max(float(ref[ndim + 1]), 1e-30)
        ok = np.allclose(d, ref, rtol=rtol, atol=atol * max_abs)
        if not ok:
            err = np.max(
                np.abs(d - ref) / (np.abs(ref) + atol * max_abs)
            )
            self.failures.append(
                f"{name}: digest mismatch (max scaled err {err:.2e}, "
                f"rtol {rtol}, atol {atol}*max)"
            )

    def finish(self) -> None:
        if self.make:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            np.savez_compressed(self.path, **self.data)
            print(
                f"[golden] wrote {len(self.data)} entries -> {self.path}",
                flush=True,
            )
            return
        if self.failures:
            for f in self.failures:
                print(f"[golden] FAIL {f}", flush=True)
            raise SystemExit(
                f"golden-value check failed ({len(self.failures)} outputs)"
            )
        print(
            f"[golden] all {len(self.data)} golden outputs matched",
            flush=True,
        )
