"""Pallas banded-operator matmul: out[r] = W[r] @ x[off_r : off_r + SPAN].

The TPU kernel behind O(F·W) fractional-octave complex smoothing
(`transfer_functions.complex_smoothing`): the smoothing operator is a
row-banded matrix whose band start grows monotonically with the row index.
Rows are processed in tiles; each tile's weight block ``(TR, SPAN)`` is a
dense slab precomputed host-side, and the matching input window is DMA'd
from HBM at a *scalar-prefetched element offset* — arbitrary band starts
cannot be expressed through a BlockSpec index_map (block-granular), so the
kernel copies its input slice manually.

Replaces the reference's numba kernel #1
(`/root/reference/dsptoolbox/transfer_functions/_transfer_functions.py:414-476`)
at the same O(F·W) complexity; the former dense (F, F) matmul (O(F²)) and
its host fallback for long spectra are gone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(offs_ref, w_ref, x_hbm, out_ref, x_vmem, sem):
    i = pl.program_id(0)
    off = offs_ref[i]
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(off, x_vmem.shape[0]), :], x_vmem, sem
    )
    cp.start()
    cp.wait()
    out_ref[:] = jnp.dot(
        w_ref[0], x_vmem[:], preferred_element_type=jnp.float32
    )


@partial(jax.jit, static_argnames=("interpret",))
def banded_matmul(
    slab: jnp.ndarray,
    offsets: jnp.ndarray,
    x_padded: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """``out[b*TR + r, c] = Σ_k slab[b, r, k] · x_padded[offsets[b]+k, c]``.

    slab ``(NB, TR, SPAN)`` f32, offsets ``(NB,)`` int32, x_padded
    ``(F_pad, C)`` f32 with ``F_pad ≥ max(offsets) + SPAN``. Returns
    ``(NB·TR, C)`` f32.
    """
    nb, tr, span = slab.shape
    c = x_padded.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, tr, span),
                lambda i, offs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tr, c), lambda i, offs: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((span, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _banded_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * tr, c), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * tr * span * c,
            bytes_accessed=(nb * tr * span + nb * span * c + nb * tr * c)
            * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(offsets, jnp.int32), slab, x_padded)


def banded_matmul_xla(
    slab: jnp.ndarray, offsets: jnp.ndarray, x_padded: jnp.ndarray
) -> jnp.ndarray:
    """XLA fallback with identical semantics (used on CPU test meshes and
    any backend without Pallas TPU support): per-block gather + batched
    matmul. Same O(F·W) complexity."""
    nb, tr, span = slab.shape
    idx = jnp.asarray(offsets, jnp.int32)[:, None] + jnp.arange(
        span, dtype=jnp.int32
    )
    xg = jnp.take(x_padded, idx, axis=0)  # (NB, SPAN, C)
    out = jnp.einsum(
        "btw,bwc->btc",
        slab,
        xg,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(nb * tr, x_padded.shape[1])


def banded_apply(
    slab,
    offsets,
    x_padded: jnp.ndarray,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Dispatch banded matmul to the Pallas TPU kernel or the XLA path."""
    if use_pallas is None:
        from .._config import mosaic_healthy

        use_pallas = mosaic_healthy()
    slab = jnp.asarray(slab, jnp.float32)
    offsets = jnp.asarray(offsets, jnp.int32)
    if use_pallas:
        # Mosaic DMA slices must be lane-aligned: pad the channel axis to
        # 128 (the padded matmul is MXU-shaped; the extra lanes are free
        # relative to the systolic array's fixed 128-lane width)
        c = x_padded.shape[1]
        pad_c = (-c) % 128
        if pad_c:
            x_padded = jnp.pad(x_padded, ((0, 0), (0, pad_c)))
        out = banded_matmul(slab, offsets, x_padded)
        return out[:, :c] if pad_c else out
    return banded_matmul_xla(slab, offsets, x_padded)
