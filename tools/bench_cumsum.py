"""A/B: Schroeder descriptor battery with XLA log-depth cumsum vs the
MXU-blocked triangular-matmul prefix (`ops/prefix.py`).

Run each variant in a FRESH process (fetch poisoning, BASELINE.md):

    python tools/bench_cumsum.py xla   [n_rirs]
    python tools/bench_cumsum.py mxu   [n_rirs]
    python tools/bench_cumsum.py raw   [n_rirs]   # bare (B,T) suffix-sum A/B
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profiler import profile_program  # noqa: E402


def main():
    variant = sys.argv[1]
    n_rirs = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    import jax.numpy as jnp

    from dsptoolbox_tpu.ops.prefix import cumsum_mxu

    fs = 16000
    T = fs // 2
    rng = np.random.default_rng(0)
    t = np.arange(T) / fs
    decays = rng.uniform(15.0, 40.0, n_rirs)
    rirs = (
        rng.standard_normal((n_rirs, T)) * np.exp(-decays[:, None] * t)
        + 1e-3 * rng.standard_normal((n_rirs, T))
    ).astype(np.float32)
    rirs[:, 0] = 1.0
    rb = jnp.asarray(rirs)

    if variant == "raw":
        e = rb**2

        def run_xla(x):
            return jnp.flip(jnp.cumsum(jnp.flip(x, -1), -1), -1)

        def run_mxu(x):
            return cumsum_mxu(x, reverse=True)

        for name, fn in (("xla", run_xla), ("mxu", run_mxu)):
            rep = profile_program(
                fn, (e,), f"raw suffix-sum {n_rirs}x{T} [{name}]", None, 5
            )
            print(json.dumps(rep), flush=True)
        return

    if variant == "mxu":
        from dsptoolbox_tpu.room_acoustics import batch_reverb_times

        def run(r):
            return batch_reverb_times(r, fs, "T20")

    else:  # reconstruct the pre-round-4 XLA-cumsum battery inline
        def _edc_db(r):
            start = jnp.argmax(jnp.abs(r), axis=-1)
            mask = (jnp.arange(T)[None, :] >= start[:, None]).astype(
                jnp.float32
            )
            e = (r**2) * mask
            edc = jnp.flip(jnp.cumsum(jnp.flip(e, -1), -1), -1)
            return 10.0 * jnp.log10(
                jnp.maximum(edc, 1e-30) / jnp.maximum(edc[:, :1], 1e-30)
            ), start

        def run(r):
            edc_db, start = _edc_db(r)
            tt = (jnp.arange(T) / fs)[None, :] * jnp.ones((n_rirs, 1))
            mask = (
                (edc_db <= -5.0)
                & (edc_db >= -25.0)
                & (jnp.arange(T)[None, :] >= start[:, None])
            )
            w = mask.astype(jnp.float32)
            n = jnp.maximum(jnp.sum(w, -1), 1.0)
            mx = jnp.sum(w * tt, -1) / n
            my = jnp.sum(w * edc_db, -1) / n
            cov = jnp.sum(w * (tt - mx[:, None]) * (edc_db - my[:, None]), -1)
            var = jnp.maximum(jnp.sum(w * (tt - mx[:, None]) ** 2, -1), 1e-30)
            return -60.0 / jnp.minimum(cov / var, -1e-10)

    rep = profile_program(
        run, (rb,), f"T20 battery {n_rirs} RIRs [{variant}]", None, 5
    )
    rep["rirs_per_s"] = round(n_rirs / rep["seconds_per_iter"], 0)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
