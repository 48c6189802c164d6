"""A/B: DAS quadratic form as complex einsum (contraction dim = 64 mics,
half an MXU tile) vs real block-packed form (contraction dim = 128).

For each frequency f: T = C h has real form
    [Tre Tim] = [hre him] @ [[Cre^T, Cim^T], [-Cim^T, Cre^T]]
and the map is the row-dot  out_gf = <[hre him], [Tre Tim]>.

Run fresh-process per variant:  python tools/bench_das_pack.py {complex,packed}
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
    n_bins, n_mics, n_grid = 513, 64, 900
    rng = np.random.default_rng(0)
    C = rng.standard_normal((n_bins, n_mics, n_mics)) + 1j * (
        rng.standard_normal((n_bins, n_mics, n_mics))
    )
    C = (C + np.conj(np.swapaxes(C, -1, -2))) / 2
    h = rng.standard_normal((n_bins, n_grid, n_mics)) + 1j * (
        rng.standard_normal((n_bins, n_grid, n_mics))
    )
    Cre = np.real(C).astype(np.float32)
    Cim = np.imag(C).astype(np.float32)
    hre = np.real(h).astype(np.float32)
    him = np.imag(h).astype(np.float32)

    import jax.numpy as jnp

    if variant == "complex":
        a = (jnp.asarray(Cre), jnp.asarray(Cim), jnp.asarray(hre),
             jnp.asarray(him))

        def run(cre, cim, hre_, him_):
            Cc = cre + 1j * cim
            hc = hre_ + 1j * him_
            return jnp.real(
                jnp.einsum("fgm,fmn,fgn->gf", jnp.conj(hc), Cc, hc)
            )
    else:
        # (f, 2M, 2M) block operator and (f, G, 2M) packed steering
        top = np.concatenate([np.swapaxes(Cre, -1, -2),
                              np.swapaxes(Cim, -1, -2)], axis=-1)
        bot = np.concatenate([-np.swapaxes(Cim, -1, -2),
                              np.swapaxes(Cre, -1, -2)], axis=-1)
        B = np.concatenate([top, bot], axis=-2).astype(np.float32)
        hp = np.concatenate([hre, him], axis=-1).astype(np.float32)
        a = (jnp.asarray(B), jnp.asarray(hp))

        def run(B_, hp_):
            T = jnp.einsum("fgk,fkl->fgl", hp_, B_)
            return jnp.einsum("fgl,fgl->gf", hp_, T)

    # numeric cross-check once (tiny slice, host)
    rep = profile_program(
        run, a, f"DAS 513x64x900 [{variant}]", None, 5
    )
    rep["grid_pts_bins_per_s"] = round(
        n_grid * n_bins / rep["seconds_per_iter"], 0
    )
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
