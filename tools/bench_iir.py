"""Crossover benchmark: XLA blocked IIR vs Pallas time-tiled IIR vs
frequency sampling, across (T, sections, batch) on the real TPU.

Populates the dispatch table in BASELINE.md and the thresholds in
`ops.iir.sosfilt_zero_state` / `ops.iir_block.sosfilt_block`.

Run:  python tools/bench_iir.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from scipy.signal import butter  # noqa: E402

from dsptoolbox_tpu.ops.iir_block import (  # noqa: E402
    _block_operators,
    sosfilt_block,
)
from dsptoolbox_tpu.ops.iir_freq import plan_nfft, sosfilt_freq  # noqa: E402
from dsptoolbox_tpu.ops.pallas_iir import sosfilt_pallas  # noqa: E402


def timeit(fn, *a, n=20, repeats=3):
    """Value-fetch-synced, distinct-input timing (see
    tools/bench_suite._sync: block_until_ready is not a real barrier on
    the tunneled backend, and identical (program, buffer) executions are
    memoized — every call scales its first argument on device)."""
    scale = jax.jit(lambda x, c: (x * c).astype(x.dtype))
    counter = [0]

    def call():
        counter[0] += 1
        return fn(
            scale(a[0], 1.0 + 1e-6 * counter[0]), *a[1:]
        )

    _first_real = jax.jit(lambda l: l.ravel()[0].real)

    def _value_sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        if not isinstance(leaf, np.ndarray):
            # jitted scalar extraction: eager .real on complex arrays is
            # UNIMPLEMENTED on the axon backend
            float(np.asarray(_first_real(leaf)))

    out = call()
    _value_sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = call()
        _value_sync(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    L = 128
    rows = []
    for T in (16384, 65536, 262144, 1048576):
        for S in (2, 4, 8):
            for B in (1, 8, 32):
                sos = butter(2 * S, 0.2, output="sos")
                assert sos.shape[0] == S
                x = jnp.asarray(
                    rng.standard_normal((B, T)).astype(np.float32)
                )
                lead = (T // L) * L
                key = tuple(
                    np.asarray(sos, np.float64).reshape(-1).tolist()
                )
                H, G, A, M = (
                    np.asarray(m, np.float32)
                    for m in _block_operators(key, L)
                )
                Hd, Gd, Ad, Md = (
                    jnp.asarray(m) for m in (H, G, A, M)
                )
                xl = x[:, :lead]

                t_xla = timeit(
                    jax.jit(lambda xv: sosfilt_block(sos, xv)[0]), xl
                )
                t_pal = timeit(
                    jax.jit(
                        lambda xv: sosfilt_pallas(Hd, Gd, Ad, Md, xv)[0]
                    ),
                    xl,
                )
                nfft = plan_nfft(sos, lead)
                t_frq = (
                    timeit(
                        jax.jit(
                            lambda xv: sosfilt_freq(sos, xv, nfft=nfft)
                        ),
                        xl,
                    )
                    if nfft is not None
                    else None
                )
                row = {
                    "T": T,
                    "S": S,
                    "B": B,
                    "xla_ms": round(t_xla, 3),
                    "pallas_ms": round(t_pal, 3),
                    "freq_ms": round(t_frq, 3) if t_frq else None,
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
    # summary: winner per regime
    for r in rows:
        cands = {"xla": r["xla_ms"], "pallas": r["pallas_ms"]}
        if r["freq_ms"]:
            cands["freq"] = r["freq_ms"]
        r["winner"] = min(cands, key=cands.get)
    print("WINNERS:", flush=True)
    for r in rows:
        print(
            f"T={r['T']:8d} S={r['S']} B={r['B']:3d}  "
            f"xla={r['xla_ms']:8.3f}  pallas={r['pallas_ms']:8.3f}  "
            f"freq={r['freq_ms']}  -> {r['winner']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
