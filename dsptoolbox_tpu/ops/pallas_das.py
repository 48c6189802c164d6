"""Fused steering-build + packed quadratic form: the DAS map kernel.

The XLA formulation (`beamforming._das_map_core`) materializes the packed
steering factor ``hp (F, G, 2M)`` and the first-einsum intermediate in
HBM (~470 MB round trip against a 0.33 ms bandwidth floor), and spends
as long building the (F, G, M) cos/sin steering tensor as it does on the
quadratic form. This kernel computes the whole map in ONE Pallas program
with nothing but the split CSM ever streamed from HBM.

Round-5 on-chip decomposition (`tools/bench_das_roofline.py` + stripped
kernel variants) of where the time actually goes, on the 513-bin x
900-pt x 64-mic sweep:

- NOT MXU passes: DEFAULT (1 bf16 pass) vs HIGHEST (6 passes) moves the
  XLA core not at all and the fused kernel by ~0.5 ms.
- NOT HBM: the fused kernel streams 34 MB (0.04 ms at 819 GB/s).
- NOT transcendentals per se: cutting cos/sin 16x via the uniform-grid
  rotation recurrence below saved only ~0.7 ms.
- The floor is per-bin VPU *elementwise* work — and in a (G, M) layout
  every (G, 64)-shaped op runs at HALF lane occupancy. This kernel
  therefore keeps M on sublanes and G on lanes: every vector op is
  128 lanes wide, and the final quadratic reduction is a cheap
  sublane reduction instead of a cross-lane one.

Design:

- grid over frequency-bin blocks of ``FB``; ``amp``/``diff (M, G)``
  stay VMEM-resident across the whole grid (constant index map);
- the library's frequency grids are uniform (rfft bins), so
  ``e^{-i k_{f+1} d} = e^{-i k_f d} e^{-i dk d}``: each grid step
  computes ONE exact cos/sin anchor and reaches the other ``FB - 1``
  bins by 6-FLOP/element VPU rotations (re-anchored every step; phase
  drift <= FB * eps ~ 2e-6 rad);
- the packed-real block matrix ``B_f = [[Cre, -Cim], [Cim, Cre]]`` is
  assembled in a (2M, 2M) VMEM scratch from the (M, M) quadrant blocks
  — the XLA path's 134 MB concat materialization disappears;
- per bin: one (2M, 2M) x (2M, G) MXU dot + a sublane reduction yield
  ``map[f, g] = p^T B_f p = Re(h^H C h)`` exactly (no Hermitian
  assumption; same algebra as `beamforming._packed_quadratic_from_hp`).

Reference behavior target: the DAS double loop at
`/root/reference/dsptoolbox/beamforming/beamforming.py:864-868`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGH = jax.lax.Precision.HIGHEST


def _das_kernel(k_ref, dk_ref, amp_ref, diff_ref, cre_ref, cim_ref,
                out_ref, b_s, hp_s, cd_s, sd_s,
                *, m: int, fb: int, prec, uniform: bool):
    amp = amp_ref[:]  # (M, Gl)
    diff = diff_ref[:]
    if uniform:
        @pl.when(pl.program_id(0) == 0)
        def _():
            phd = dk_ref[0] * diff
            cd_s[:] = jnp.cos(phd)
            sd_s[:] = jnp.sin(phd)
        cd = cd_s[:]
        sd = sd_s[:]
    base = pl.program_id(0) * fb
    ph0 = k_ref[base] * diff
    c = jnp.cos(ph0)
    s = jnp.sin(ph0)
    for j in range(fb):
        if not uniform and j > 0:
            ph = k_ref[base + j] * diff
            c = jnp.cos(ph)
            s = jnp.sin(ph)
        # hp^T = [Re h ; Im h] stacked on sublanes: (2M, Gl)
        hp_s[:m, :] = amp * c
        hp_s[m:, :] = -(amp * s)
        b_s[:m, :m] = cre_ref[j]
        b_s[:m, m:] = -cim_ref[j]
        b_s[m:, :m] = cim_ref[j]
        b_s[m:, m:] = cre_ref[j]
        hp = hp_s[:]
        # t[l, g] = sum_k B[k, l] hp^T[k, g]
        t = jax.lax.dot_general(
            b_s[:],
            hp,
            (((0,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )  # (2M, Gl)
        out_ref[j, :] = jnp.sum(t * hp, axis=0)
        if uniform and j + 1 < fb:
            c, s = c * cd - s * sd, s * cd + c * sd


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "mxu_precision", "uniform_grid"),
)
def das_map_fused(
    ampj: jnp.ndarray,  # (M, G) f32
    diffj: jnp.ndarray,  # (M, G) f32
    kj: jnp.ndarray,  # (F,) f32
    csm_re: jnp.ndarray,  # (F, M, M) f32
    csm_im: jnp.ndarray,  # (F, M, M) f32
    interpret: bool = False,
    mxu_precision: str = "highest",
    uniform_grid: bool = False,
) -> jnp.ndarray:
    """``map[g, f] = Re(h^H C h)`` with the steering tensor
    ``h[f,m,g] = amp[m,g] e^{-j k_f diff[m,g]}`` built in-kernel.

    ``uniform_grid=True`` enables the rotation recurrence (caller must
    guarantee ``kj`` is a uniform ramp — the rfft grids the library
    produces are). Returns (G, F) float32.
    """
    M, G = ampj.shape
    F = kj.shape[0]
    mp = max(64, -(-M // 8) * 8)
    gl = -(-G // 128) * 128  # G on the lane axis
    if mp != M or gl != G:
        ampj = jnp.pad(ampj, ((0, mp - M), (0, gl - G)))
        diffj = jnp.pad(diffj, ((0, mp - M), (0, gl - G)))
        csm_re = jnp.pad(csm_re, ((0, 0), (0, mp - M), (0, mp - M)))
        csm_im = jnp.pad(csm_im, ((0, 0), (0, mp - M), (0, mp - M)))
    amp2 = ampj.astype(jnp.float32)
    diff2 = diffj.astype(jnp.float32)

    # bins per grid step: bounded by Mosaic's scoped-VMEM stack for the
    # unrolled per-bin temporaries
    FB = 16 if uniform_grid else 8
    fpad = -(-F // FB) * FB
    kf32 = kj.astype(jnp.float32)
    # padded bins continue the uniform ramp so the recurrence stays
    # anchored (their outputs are sliced away)
    dk = (kf32[1] - kf32[0]) if F > 1 else jnp.float32(0.0)
    k2 = jnp.concatenate(
        [kf32, kf32[-1] + dk * (1 + jnp.arange(fpad - F, dtype=jnp.float32))]
    )
    dk2 = jnp.reshape(dk, (1,))
    csm_re = jnp.pad(
        csm_re.astype(jnp.float32), ((0, fpad - F), (0, 0), (0, 0))
    )
    csm_im = jnp.pad(
        csm_im.astype(jnp.float32), ((0, fpad - F), (0, 0), (0, 0))
    )

    grid_spec = pl.GridSpec(
        grid=(fpad // FB,),
        in_specs=[
            pl.BlockSpec((fpad,), lambda f: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda f: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mp, gl), lambda f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, gl), lambda f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, mp, mp), lambda f: (f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, mp, mp), lambda f: (f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FB, gl), lambda f: (f, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * mp, 2 * mp), jnp.float32),
            pltpu.VMEM((2 * mp, gl), jnp.float32),
            pltpu.VMEM((mp, gl), jnp.float32),
            pltpu.VMEM((mp, gl), jnp.float32),
        ],
    )
    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[mxu_precision]
    out = pl.pallas_call(
        functools.partial(
            _das_kernel, m=mp, fb=FB, prec=prec, uniform=uniform_grid
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((fpad, gl), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * F * gl * 2 * mp * (2 * mp + 1),
            bytes_accessed=4 * (2 * F * mp * mp + 2 * gl * mp + F * gl),
            transcendentals=2 * (F // FB if uniform_grid else F) * gl * mp,
        ),
    )(k2, dk2, amp2, diff2, csm_re, csm_im)
    return out[:F, :G].T  # (G, F)
