"""Pallas time-tiled blocked IIR: the v2 TPU kernel behind ``sosfilt``.

The XLA formulation in `ops.iir_block` computes, per L-sample block,

    y_blk = x_blk @ HmatT + s @ GyT ;   s' = s @ ALT + x_blk @ MT

and resolves the block-boundary state recurrence with a log-depth doubling
prefix — correct, but it materializes the free response and the prefix
passes in HBM and compiles to a dozen separate XLA kernels whose fixed
launch costs dominate for long signals.

This kernel runs the same exact math as ONE Pallas program: a sequential
grid over superblocks of ``SB`` L-blocks, the carried state living in VMEM
scratch across grid steps. Per grid step the ``SB`` within-block Toeplitz
matmuls are independent MXU work (they pipeline behind the DMA); only the
tiny (B, N) state hop is serial. x is read once from HBM and y written
once — no intermediate traffic.

Numerics are identical to `ops.iir_block.sosfilt_block`: the block
operators are precomputed in float64 on the host from the composed TDF2
state-space cascade (scipy's zi layout) and cast to f32; all matmuls run
at ``Precision.HIGHEST``.

Reference behavior target: `scipy.signal.sosfilt` as used by
`/root/reference/dsptoolbox/classes/filter_helpers.py:258-265`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGH = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jax.lax.dot_general(
        a,
        b,
        (((a.ndim - 1,), (0,)), ((), ())),
        precision=_HIGH,
        preferred_element_type=jnp.float32,
    )


def _iir_kernel(
    x_ref, h_ref, g_ref, a_ref, m_ref, s0_ref, y_ref, zf_ref, s_ref,
    *, sb: int, valid_last: int
):
    k = pl.program_id(0)
    n_super = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        s_ref[:] = s0_ref[:]

    s = s_ref[:]
    h = h_ref[:]
    g = g_ref[:]
    a = a_ref[:]
    m = m_ref[:]
    for j in range(sb):
        xj = x_ref[:, j, :]
        y_ref[:, j, :] = _dot(xj, h) + _dot(s, g)
        s_new = _dot(s, a) + _dot(xj, m)
        if j < valid_last:
            # this block position is real in every grid step
            s = s_new
        else:
            # only the final grid step carries zero-padded blocks; freeze
            # the state there so zf is the true final state
            s = jnp.where(k + 1 < n_super, s_new, s)
    s_ref[:] = s

    @pl.when(k == n_super - 1)
    def _():
        zf_ref[:] = s


@functools.partial(
    jax.jit, static_argnames=("sb", "interpret")
)
def _sosfilt_pallas_lead(
    hmat_t: jnp.ndarray,  # (L, L) f32
    gy_t: jnp.ndarray,  # (N, L) f32
    al_t: jnp.ndarray,  # (N, N) f32
    m_t: jnp.ndarray,  # (L, N) f32
    xb: jnp.ndarray,  # (B, K, L) f32, B % 8 == 0
    s0: jnp.ndarray,  # (B, N) f32
    sb: int,
    interpret: bool = False,
):
    """Filter the K full blocks of ``xb``; returns (y (B, K, L), zf (B, N))."""
    B, K, L = xb.shape
    N = al_t.shape[0]
    n_super = -(-K // sb)
    k_pad = n_super * sb - K
    valid_last = sb - k_pad
    if k_pad:
        xb = jnp.pad(xb, ((0, 0), (0, k_pad), (0, 0)))

    grid_spec = pl.GridSpec(
        grid=(n_super,),
        in_specs=[
            pl.BlockSpec(
                (B, sb, L), lambda k: (0, k, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (B, sb, L), lambda k: (0, k, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B, N), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
    )
    y, zf = pl.pallas_call(
        functools.partial(_iir_kernel, sb=sb, valid_last=valid_last),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, n_super * sb, L), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_super * sb * B * L * (L + 3 * N),
            bytes_accessed=4 * B * n_super * sb * L * 2,
            transcendentals=0,
        ),
    )(xb, hmat_t, gy_t, al_t, m_t, s0)
    if k_pad:
        y = y[:, :K, :]
    return y, zf


def _pick_superblock(B: int, L: int) -> int:
    """Blocks per grid step: target ~0.5 MB per x tile (double-buffered
    against compute), at least 4 so the serial state hop amortizes."""
    target = 512 * 1024
    sb = max(4, target // max(1, B * L * 4))
    return int(min(sb, 64))


def sosfilt_pallas(
    hmat_t,
    gy_t,
    al_t,
    m_t,
    x: jnp.ndarray,
    s0: jnp.ndarray | None = None,
    sb: int | None = None,
    interpret: bool = False,
):
    """Blocked SOS filtering of ``x (..., T)`` with T a multiple of L.

    Operators are the transposed block operators from
    `ops.iir_block._block_operators` (already cast to a real dtype).
    Returns ``(y (..., T), zf (..., N))``.
    """
    hmat_t = jnp.asarray(hmat_t, jnp.float32)
    gy_t = jnp.asarray(gy_t, jnp.float32)
    al_t = jnp.asarray(al_t, jnp.float32)
    m_t = jnp.asarray(m_t, jnp.float32)
    L = hmat_t.shape[0]
    N = al_t.shape[0]
    batch_shape = x.shape[:-1]
    T = x.shape[-1]
    assert T % L == 0, "lead length must be a multiple of the block size"
    K = T // L
    B = int(np.prod(batch_shape)) if batch_shape else 1
    x2 = jnp.asarray(x, jnp.float32).reshape(B, K, L)
    if s0 is None:
        s0 = jnp.zeros((B, N), jnp.float32)
    else:
        s0 = jnp.asarray(s0, jnp.float32).reshape(B, N)
    b_pad = (-B) % 8
    if b_pad:
        x2 = jnp.pad(x2, ((0, b_pad), (0, 0), (0, 0)))
        s0 = jnp.pad(s0, ((0, b_pad), (0, 0)))
    sb = sb or _pick_superblock(B + b_pad, L)
    y, zf = _sosfilt_pallas_lead(
        hmat_t, gy_t, al_t, m_t, x2, s0, sb=sb, interpret=interpret
    )
    if b_pad:
        y = y[:B]
        zf = zf[:B]
    return y.reshape(batch_shape + (T,)), zf.reshape(batch_shape + (N,))


def pallas_iir_available() -> bool:
    """True when the default backend compiles Mosaic TPU kernels (probed
    with a deadline — see `_config.mosaic_healthy`)."""
    from .._config import mosaic_healthy

    return mosaic_healthy()
