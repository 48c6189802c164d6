"""Pallas bank-IIR: a whole filter bank (real or complex cascades) as ONE
Mosaic program.

The XLA bank path (`ops.iir_block.sosfilt_bank_apply`) runs band-batched
einsums plus a log-depth doubling prefix for the block-boundary states —
a dozen separate XLA kernels whose fixed costs dominate for long
signals, and for COMPLEX cascades (the gammatone bank,
`/root/reference/dsptoolbox/filterbanks/_filterbank.py:664-841`) every
einsum runs in complex64.

This kernel reformulates the bank as dense REAL matmuls shared across
bands, with the carried state in VMEM across a sequential grid:

- within a band CHUNK the per-band within-block operators concatenate
  along columns: ``Hcat (L, bc·L)`` — one (R, L) @ (L, bc·L) MXU matmul
  produces the chunk's whole block response (the input block is SHARED
  across bands);
- the chunk's state operators form block-diagonal dense matrices
  ``BDG (bc·N, bc·L)``, ``BDA (bc·N, bc·N)`` — the chunk's state hop is
  one matmul;
- complex cascades run as (real, imag) matmul pairs (complex dtypes
  don't exist in Mosaic; 4 real matmuls per complex product, the real
  input x needing only 2);
- the grid is ``(chunks, superblocks)`` with superblocks innermost: each
  chunk's weights are DMA'd into VMEM once, stay resident for its whole
  time sweep, and the carried state lives in VMEM scratch — x is read
  once per chunk, y written once, VMEM usage bounded by the chunk size
  regardless of the bank's width.

Numerics: operators are built in f64/c128 on the host
(`ops.iir_block._block_operators`) and cast to f32 pairs; matmuls run at
``Precision.HIGHEST`` — the same arithmetic as the XLA path up to sum
association (the sequential state hop matches scipy's recursion more
closely than the XLA path's log-depth doubling prefix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGH = jax.lax.Precision.HIGHEST

_IDENTITY_SOS = np.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])


def _dot(a, b):
    return jax.lax.dot_general(
        a,
        b,
        (((a.ndim - 1,), (0,)), ((), ())),
        precision=_HIGH,
        preferred_element_type=jnp.float32,
    )


def bank_dense_operators(
    sos_bank: np.ndarray,
    T: int,
    L: int = 128,
    band_chunk: int = 4,
):
    """Chunked dense operators for a bank of same-order SOS cascades.

    ``sos_bank (B, S, 6)`` (real or complex). The bank is padded with
    identity cascades to a multiple of ``band_chunk``; per chunk the
    operators concatenate (H, M) / block-diagonalize (G, A) into dense
    f32 (real, imag) pairs stacked chunk-major:

    Hcat (L, C·bc·L), Mcat (L, C·bc·N), BDG (C·bc·N, bc·L),
    BDA (C·bc·N, bc·N); ``_i`` entries are None for real banks.
    """
    from .iir_block import _block_operators

    sos_bank = np.asarray(sos_bank)
    cplx = np.iscomplexobj(sos_bank)
    sos_bank = sos_bank.astype(np.complex128 if cplx else np.float64)
    B, S = sos_bank.shape[0], sos_bank.shape[1]
    bc = min(band_chunk, B)
    b_pad = (-B) % bc
    if b_pad:
        ident = np.broadcast_to(
            _IDENTITY_SOS, (b_pad, S, 6)
        ).astype(sos_bank.dtype)
        sos_bank = np.concatenate([sos_bank, ident], axis=0)
    Bp = sos_bank.shape[0]
    C = Bp // bc
    Hs, Gs, As, Ms = [], [], [], []
    for b in range(Bp):
        key = tuple(sos_bank[b].reshape(-1).tolist())
        H, G, A, M = _block_operators(key, L)
        Hs.append(H)
        Gs.append(G)
        As.append(A)
        Ms.append(M)
    N = As[0].shape[0]
    Hcat = np.concatenate(Hs, axis=1)  # (L, Bp*L)
    # per-chunk state width padded to the 128-lane VMEM minimum (the
    # padded state lanes stay exactly zero: their M columns and A
    # rows/columns are zero)
    SP = max(128, -(-bc * N // 128) * 128)
    Mcat = np.zeros((L, C * SP), Hcat.dtype)
    BDG = np.zeros((C * SP, bc * L), Hcat.dtype)
    BDA = np.zeros((C * SP, SP), Hcat.dtype)
    for b in range(Bp):
        c, w = divmod(b, bc)
        Mcat[:, c * SP + w * N: c * SP + (w + 1) * N] = Ms[b]
        BDG[c * SP + w * N: c * SP + (w + 1) * N, w * L:(w + 1) * L] = (
            Gs[b]
        )
        BDA[c * SP + w * N: c * SP + (w + 1) * N, w * N:(w + 1) * N] = (
            As[b]
        )

    def pair(a):
        if cplx:
            return (
                np.ascontiguousarray(a.real, np.float32),
                np.ascontiguousarray(a.imag, np.float32),
            )
        return np.ascontiguousarray(a, np.float32), None

    out = {
        "B": B, "L": L, "N": N, "cplx": cplx, "bc": bc, "chunks": C,
        "SP": SP,
    }
    out["Hcat_r"], out["Hcat_i"] = pair(Hcat)
    out["Mcat_r"], out["Mcat_i"] = pair(Mcat)
    out["BDG_r"], out["BDG_i"] = pair(BDG)
    out["BDA_r"], out["BDA_i"] = pair(BDA)
    return out


def _bank_kernel_cplx(
    x_ref, hr_ref, hi_ref, mr_ref, mi_ref, gr_ref, gi_ref, ar_ref, ai_ref,
    yr_ref, yi_ref, sr_ref, si_ref, *, sb: int
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        sr_ref[:] = jnp.zeros_like(sr_ref)
        si_ref[:] = jnp.zeros_like(si_ref)

    sr = sr_ref[:]
    si = si_ref[:]
    hr, hi = hr_ref[:], hi_ref[:]
    mr, mi = mr_ref[:], mi_ref[:]
    gr, gi = gr_ref[:], gi_ref[:]
    ar, ai = ar_ref[:], ai_ref[:]
    for j in range(sb):
        xj = x_ref[:, j, :]
        yr_ref[:, j, :] = _dot(xj, hr) + _dot(sr, gr) - _dot(si, gi)
        yi_ref[:, j, :] = _dot(xj, hi) + _dot(sr, gi) + _dot(si, gr)
        sr_new = _dot(sr, ar) - _dot(si, ai) + _dot(xj, mr)
        si_new = _dot(sr, ai) + _dot(si, ar) + _dot(xj, mi)
        sr, si = sr_new, si_new
    sr_ref[:] = sr
    si_ref[:] = si


def _bank_kernel_real(
    x_ref, hr_ref, mr_ref, gr_ref, ar_ref, yr_ref, sr_ref, *, sb: int
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        sr_ref[:] = jnp.zeros_like(sr_ref)

    sr = sr_ref[:]
    hr, mr, gr, ar = hr_ref[:], mr_ref[:], gr_ref[:], ar_ref[:]
    for j in range(sb):
        xj = x_ref[:, j, :]
        yr_ref[:, j, :] = _dot(xj, hr) + _dot(sr, gr)
        sr = _dot(sr, ar) + _dot(xj, mr)
    sr_ref[:] = sr


@functools.partial(
    jax.jit, static_argnames=("bc", "n_chunks", "sb", "interpret")
)
def _bank_pallas_run(
    ops_arrs, xb, bc: int, n_chunks: int, sb: int, interpret: bool = False
):
    """xb (R, K, L) f32 (R % 8 == 0, K % sb == 0) → (yr, yi|None) shaped
    (R, K, C·bc·L)."""
    (hr, hi, mr, mi, gr, gi, ar, ai) = ops_arrs
    R, K, L = xb.shape
    SP = ar.shape[1]
    BLc = bc * L
    n_super = K // sb
    cplx = hi is not None

    x_spec = pl.BlockSpec(
        (R, sb, L), lambda c, k: (0, k, 0), memory_space=pltpu.VMEM
    )
    h_spec = pl.BlockSpec(
        (L, BLc), lambda c, k: (0, c), memory_space=pltpu.VMEM
    )
    m_spec = pl.BlockSpec(
        (L, SP), lambda c, k: (0, c), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (SP, BLc), lambda c, k: (c, 0), memory_space=pltpu.VMEM
    )
    a_spec = pl.BlockSpec(
        (SP, SP), lambda c, k: (c, 0), memory_space=pltpu.VMEM
    )
    y_spec = pl.BlockSpec(
        (R, sb, BLc), lambda c, k: (0, k, c), memory_space=pltpu.VMEM
    )
    flops_blk = 2 * R * (L * BLc + SP * BLc + SP * SP + L * SP)
    if cplx:
        grid_spec = pl.GridSpec(
            grid=(n_chunks, n_super),
            in_specs=[
                x_spec, h_spec, h_spec, m_spec, m_spec,
                g_spec, g_spec, a_spec, a_spec,
            ],
            out_specs=(y_spec, y_spec),
            scratch_shapes=[
                pltpu.VMEM((R, SP), jnp.float32),
                pltpu.VMEM((R, SP), jnp.float32),
            ],
        )
        yr, yi = pl.pallas_call(
            functools.partial(_bank_kernel_cplx, sb=sb),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((R, K, n_chunks * BLc), jnp.float32),
                jax.ShapeDtypeStruct((R, K, n_chunks * BLc), jnp.float32),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=3 * n_chunks * K * flops_blk,
                bytes_accessed=4 * R * K * (n_chunks * L + 2 * n_chunks * BLc),
                transcendentals=0,
            ),
        )(xb, hr, hi, mr, mi, gr, gi, ar, ai)
        return yr, yi
    grid_spec = pl.GridSpec(
        grid=(n_chunks, n_super),
        in_specs=[x_spec, h_spec, m_spec, g_spec, a_spec],
        out_specs=y_spec,
        scratch_shapes=[pltpu.VMEM((R, SP), jnp.float32)],
    )
    yr = pl.pallas_call(
        functools.partial(_bank_kernel_real, sb=sb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, K, n_chunks * BLc), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_chunks * K * flops_blk,
            bytes_accessed=4 * R * K * n_chunks * (L + BLc),
            transcendentals=0,
        ),
    )(xb, hr, mr, gr, ar)
    return yr, None


def sosfilt_bank_pallas(
    dense_ops: dict, x: jnp.ndarray, sb: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """Zero-state bank filtering of real ``x (..., T)`` → ``(B, ..., T)``
    (complex when the bank is complex). Contract matches
    `ops.iir_block.sosfilt_bank_apply`."""
    B, L = dense_ops["B"], dense_ops["L"]
    bc, n_chunks = dense_ops["bc"], dense_ops["chunks"]
    cplx = dense_ops["cplx"]
    batch_shape = x.shape[:-1]
    T = x.shape[-1]
    R = int(np.prod(batch_shape)) if batch_shape else 1
    x2 = jnp.asarray(x, jnp.float32).reshape(R, T)
    # pad time to a whole number of superblocks (zero tail, trimmed from
    # y — zero-state filtering of the pad can't affect earlier samples)
    K = -(-T // L)
    K = -(-K // sb) * sb
    t_pad = K * L - T
    r_pad = (-R) % 8
    if t_pad or r_pad:
        x2 = jnp.pad(x2, ((0, r_pad), (0, t_pad)))
    xb = x2.reshape(R + r_pad, K, L)
    arrs = tuple(
        None if dense_ops[n] is None else jnp.asarray(dense_ops[n])
        for n in (
            "Hcat_r", "Hcat_i", "Mcat_r", "Mcat_i",
            "BDG_r", "BDG_i", "BDA_r", "BDA_i",
        )
    )
    yr, yi = _bank_pallas_run(
        arrs, xb, bc=bc, n_chunks=n_chunks, sb=sb, interpret=interpret
    )

    def finish(y):  # (R', K, C*bc*L) → (B, ..., T)
        y = y[:R].reshape(R, K, n_chunks * bc, L)
        y = jnp.moveaxis(y, 2, 0).reshape(
            n_chunks * bc, R, K * L
        )[:B, :, :T]
        return y.reshape((B,) + batch_shape + (T,))

    if cplx:
        return finish(yr) + 1j * finish(yi)
    return finish(yr)
