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
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_pipeline(sos_bank, reg_eps):
    from dsptoolbox_tpu.ops.iir import sosfilt
    from dsptoolbox_tpu.ops.spectral import stft

    def pipeline(x, excitation_spectrum):
        # x: (batch, T) audio at 48 kHz
        # 1) STFT analysis
        _, _, S = stft(
            x,
            sampling_rate_hz=48000,
            window_length_samples=1024,
            overlap_percent=50.0,
        )
        energy = jnp.sum(jnp.abs(S) ** 2, axis=(-1, -2))

        # 2) Filter-bank filtering (4 crossover SOS cascades, batched)
        bands = []
        for sos in sos_bank:
            y, _ = sosfilt(sos, x)
            bands.append(y)
        bands = jnp.stack(bands, axis=1)  # (batch, bands, T)

        # 3) Regularized spectral deconvolution against the excitation
        X = jnp.fft.rfft(x, axis=-1)
        H = jnp.conj(excitation_spectrum) / (
            jnp.abs(excitation_spectrum) ** 2 + reg_eps
        )
        ir = jnp.fft.irfft(X * H, axis=-1)
        return energy, bands, ir

    return pipeline


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
    exc = jnp.fft.rfft(
        jax.device_put(rng.standard_normal(T).astype(np.float32))
    )
    reg = jnp.asarray(
        np.full(T // 2 + 1, 1e-3, dtype=np.float32)
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

    fn = jax.jit(build_pipeline(sos_bank, reg))

    # warmup/compile
    out = fn(x, exc)
    jax.block_until_ready(out)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(x, exc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    audio_seconds = batch * seconds_per_signal
    realtime_factor = audio_seconds / dt

    print(
        json.dumps(
            {
                "metric": "stft+filterbank+deconvolution realtime factor",
                "value": round(realtime_factor, 1),
                "unit": "x realtime per chip (fp32, 48kHz)",
                "vs_baseline": round(realtime_factor / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
