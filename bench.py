"""Benchmark: the BASELINE.json headline chain on real TPU hardware.

Measures the flagship pipeline — STFT + Linkwitz-Riley/gammatone-style SOS
filter-bank filtering + regularized spectral deconvolution — as one jitted
program over a batch of signals, and reports audio-seconds processed per
wall-second per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline target from BASELINE.json is >=1000x realtime per chip (fp32,
48 kHz): `vs_baseline` is value / 1000.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: the tunneled backend can take minutes to
# compile the pipeline; warm runs then load the executable from disk.
_CACHE_DIR = os.environ.get(
    "DSPTB_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # older jax without these flags


def build_pipeline(sos_bank, _unused_reg, T):
    from dsptoolbox_tpu.ops.iir_block import (
        sosfilt_bank_apply,
        sosfilt_bank_operators,
    )
    from dsptoolbox_tpu.ops.spectral import stft

    # band-stacked blocked-IIR operators: the whole 4-band crossover runs
    # as one batched einsum program on the MXU. Cascades are padded to a
    # common section count with identity sections.
    max_s = max(s.shape[0] for s in sos_bank)
    identity = np.array([1.0, 0, 0, 1.0, 0, 0])
    padded = [
        np.vstack([s] + [identity[None]] * (max_s - s.shape[0]))
        for s in sos_bank
    ]
    bank_ops = sosfilt_bank_operators(np.stack(padded), T)

    # Pad the deconvolution FFT to a TPU-fast length: 3*2^k beats the next
    # power of two when it is smaller (measured 5.7 vs 6.2 ms for the
    # 16x384000 rfft+irfft pair on v5e); other mixed radices are 2x slower.
    pow2 = 1 << (T - 1).bit_length()
    three = 3
    while three < T:
        three <<= 1
    P = min(pow2, three)

    def pipeline(x, excitation_spectrum_padded, reg_padded):
        # x: (batch, T) audio at 48 kHz
        # 1) STFT analysis
        _, _, S = stft(
            x,
            sampling_rate_hz=48000,
            window_length_samples=1024,
            overlap_percent=50.0,
        )
        energy = jnp.sum(jnp.abs(S) ** 2, axis=(-1, -2))

        # 2) Filter-bank filtering (4 crossover SOS cascades, banked)
        bands = jnp.moveaxis(
            sosfilt_bank_apply(bank_ops, x), 0, 1
        )  # (batch, bands, T)

        # 3) Regularized spectral deconvolution against the excitation
        X = jnp.fft.rfft(x, n=P, axis=-1)
        H = jnp.conj(excitation_spectrum_padded) / (
            jnp.abs(excitation_spectrum_padded) ** 2 + reg_padded
        )
        ir = jnp.fft.irfft(X * H, n=P, axis=-1)[..., :T]
        return energy, bands, ir

    return pipeline, P


def main():
    from scipy.signal import butter

    fs = 48000
    batch = 16
    seconds_per_signal = 8
    T = fs * seconds_per_signal

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((batch, T)).astype(np.float32)
    )

    crossovers = [250.0, 1000.0, 4000.0]
    sos_bank = [
        butter(4, crossovers[0], btype="lowpass", fs=fs, output="sos"),
        butter(
            4, [crossovers[0], crossovers[1]], btype="bandpass", fs=fs,
            output="sos",
        ),
        butter(
            4, [crossovers[1], crossovers[2]], btype="bandpass", fs=fs,
            output="sos",
        ),
        butter(4, crossovers[2], btype="highpass", fs=fs, output="sos"),
    ]

    pipeline, P = build_pipeline(sos_bank, None, T)
    fn = jax.jit(pipeline)
    exc = jnp.fft.rfft(
        jax.device_put(rng.standard_normal(T).astype(np.float32)), n=P
    )
    reg = jnp.asarray(np.full(P // 2 + 1, 1e-3, dtype=np.float32))

    # Honest timing on the tunneled backend: block_until_ready can return
    # before device work drains, so chain each iteration's input on the
    # previous iteration's output (true serial device time), keep ALL
    # per-iteration glue inside one jitted step (eager ops each cost a
    # tunnel round-trip), and force one final scalar fetch as the sync.
    def step(x_in, exc_in, reg_in, chk_in):
        energy, bands, ir = pipeline(x_in, exc_in, reg_in)
        # renormalized feedback keeps values in a sane fp32 range
        x_next = ir * jax.lax.rsqrt(jnp.mean(ir**2) + 1e-12)
        # checksum over every output keeps all stages live
        chk = (
            chk_in
            + jnp.sum(energy)
            + jnp.sum(jnp.abs(bands)) * 1e-9
            + jnp.sum(jnp.abs(ir)) * 1e-9
        )
        return x_next, chk

    step_fn = jax.jit(step)
    chk = jnp.zeros((), jnp.float32)

    # XLA's own cost model for the compiled step: flops + bytes accessed,
    # the basis for the MFU / HBM-utilization fields below.
    flops = bytes_accessed = 0.0
    try:
        ca = step_fn.lower(x, exc, reg, chk).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        bytes_accessed = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass

    # warmup/compile + full host sync
    x_cur, chk = step_fn(x, exc, reg, chk)
    _ = float(chk)

    # Best-of-3 batches: the tunneled backend stalls for multi-second
    # stretches at random; the min batch mean is the sustained device
    # throughput. Each batch is still serial-chained with a scalar fetch
    # as the sync point, so async dispatch cannot flatter the number.
    n_iters = 20
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            x_cur, chk = step_fn(x_cur, exc, reg, chk)
        _ = float(chk)  # scalar fetch = true sync point
        dt = min(dt, (time.perf_counter() - t0) / n_iters)

    audio_seconds = batch * seconds_per_signal
    realtime_factor = audio_seconds / dt

    # Device-kernel time per iteration (jax profiler trace over a short
    # serial-chained batch), so HBM utilization can be reported against
    # actual kernel occupancy as well as wall time. Best-effort: the
    # bench must never fail because tracing does.
    kernel_dt = None
    try:
        import sys
        import tempfile

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from profiler import parse_trace

        trace_iters = 5
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            with jax.profiler.trace(td):
                for _ in range(trace_iters):
                    x_cur, chk = step_fn(x_cur, exc, reg, chk)
                _ = float(chk)
            traced_wall = (time.perf_counter() - t0) / trace_iters
            kernels = parse_trace(td, top_n=10_000)
        total_us = sum(k["total_us"] for k in kernels)
        if total_us > 0:
            # raw per-iteration device-kernel self time from the profiled
            # batch (profiling inflates absolute walls on this backend,
            # so this is an upper-ish estimate of kernel occupancy —
            # labeled as such in the output)
            kernel_dt = total_us * 1e-6 / trace_iters
    except Exception:
        pass

    # MFU vs the v5e bf16 MXU peak (197 TFLOP/s); this pipeline is
    # FFT/bandwidth-dominated, so HBM utilization is the binding ceiling —
    # report both (see tools/profiler.py for the per-kernel breakdown).
    peak_bf16 = 197e12
    peak_hbm = 819e9
    print(
        json.dumps(
            {
                "metric": "stft+filterbank+deconvolution realtime factor",
                "value": round(realtime_factor, 1),
                "unit": "x realtime per chip (fp32, 48kHz)",
                "vs_baseline": round(realtime_factor / 1000.0, 3),
                "mfu": round(flops / dt / peak_bf16, 5) if flops else None,
                "achieved_tflops": (
                    round(flops / dt / 1e12, 3) if flops else None
                ),
                # UNCAPPED cost-model estimates, labeled by basis: bytes
                # are XLA's cost-analysis "bytes accessed" (can
                # double-count fused reads, so >1.0 is possible and is
                # reported as-is rather than clamped to a fake ceiling).
                "hbm_utilization_vs_wall_cost_model": (
                    round(bytes_accessed / dt / peak_hbm, 4)
                    if bytes_accessed
                    else None
                ),
                "hbm_utilization_vs_kernel_time_cost_model": (
                    round(bytes_accessed / kernel_dt / peak_hbm, 4)
                    if bytes_accessed and kernel_dt
                    else None
                ),
                "device_kernel_ms_per_iter_profiled": (
                    round(kernel_dt * 1e3, 3) if kernel_dt else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
