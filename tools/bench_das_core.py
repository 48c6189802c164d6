"""A/B/C of the FULL production DAS core (steering build INCLUDED):

  v1: complex exp build + complex einsum (round-3 production core)
  v2: cos/sin build + in-program concat + packed einsum
  v3: packed static factors (no concat) + packed einsum  (current)

Run fresh-process per variant:  python tools/bench_das_core.py {v1,v2,v3}
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
    import jax
    import jax.numpy as jnp

    _HIGH = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    n_bins, M, G = 513, 64, 900
    amp = rng.uniform(0.5, 1.0, (M, G)).astype(np.float32)
    diff = rng.uniform(0.0, 3.0, (M, G)).astype(np.float32)
    k = rng.uniform(10.0, 40.0, n_bins).astype(np.float32)
    C = rng.standard_normal((n_bins, M, M)).astype(np.float32)
    Ci = rng.standard_normal((n_bins, M, M)).astype(np.float32)

    if variant == "v1":
        a = (jnp.asarray(amp), jnp.asarray(diff), jnp.asarray(k),
             jnp.asarray(C), jnp.asarray(Ci))

        def run(ampj, diffj, kj, cre, cim):
            h = ampj[None] * jnp.exp(
                -1j * (kj[:, None, None] * diffj[None])
            )
            csm_j = cre + 1j * cim
            return jnp.einsum(
                "fmg,fmn,fng->gf", jnp.conj(h), csm_j, h, precision=_HIGH
            ).real
    elif variant == "v2":
        a = (jnp.asarray(amp), jnp.asarray(diff), jnp.asarray(k),
             jnp.asarray(C), jnp.asarray(Ci))

        def run(ampj, diffj, kj, cre, cim):
            ph = kj[:, None, None] * diffj.T[None]
            amp_t = ampj.T[None]
            hp = jnp.concatenate(
                [amp_t * jnp.cos(ph), -amp_t * jnp.sin(ph)], axis=-1
            )
            B = jnp.concatenate(
                [
                    jnp.concatenate([cre, -cim], axis=-1),
                    jnp.concatenate([cim, cre], axis=-1),
                ],
                axis=-2,
            )
            t = jnp.einsum("fgk,fkl->fgl", hp, B, precision=_HIGH)
            return jnp.einsum("fgl,fgl->gf", hp, t, precision=_HIGH)
    else:
        # statically packed (G, 2M) factors, no in-program concat of hp:
        # Im h = amp cos(k d + pi/2). Measured SLOWER than v2 — cos over
        # 2M distinct phases beats neither cos+sin on one (F, G, M) phase
        # tensor nor the concat it avoids.
        a2 = np.concatenate([amp.T, amp.T], axis=-1)
        d2 = np.concatenate([diff.T, diff.T], axis=-1)
        o2 = np.concatenate(
            [np.zeros(M), np.full(M, np.pi / 2)]
        ).astype(np.float32)
        a = (jnp.asarray(a2), jnp.asarray(d2), jnp.asarray(o2),
             jnp.asarray(k), jnp.asarray(C), jnp.asarray(Ci))
        _HI = _HIGH

        def run(amp2j, diff2j, off2j, kj, cre, cim):
            ph = kj[:, None, None] * diff2j[None] + off2j[None, None, :]
            hp = amp2j[None] * jnp.cos(ph)
            B = jnp.concatenate(
                [
                    jnp.concatenate([cre, -cim], axis=-1),
                    jnp.concatenate([cim, cre], axis=-1),
                ],
                axis=-2,
            )
            t = jnp.einsum("fgk,fkl->fgl", hp, B, precision=_HI)
            return jnp.einsum("fgl,fgl->gf", hp, t, precision=_HI)

    rep = profile_program(
        run, a, f"full DAS core 513x64x900 [{variant}]", None, 5
    )
    rep["grid_pts_bins_per_s"] = round(G * n_bins / rep["seconds_per_iter"], 0)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
