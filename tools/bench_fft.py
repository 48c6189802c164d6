"""FFT floor attribution: is the ~3 ms/call TPU FFT cost the FFT or the
program launch?

Round-3 roofline data (docs/roofline_r3.jsonl) named XLA's ~3 ms-per-call
TPU FFT the dominant primitive cost of the library. This measures the
decomposition directly, value-fetch synced, on distinct device-derived
buffers:

  A) k separate jitted programs, one rfft each        (k launches)
  B) ONE jitted program containing k independent rffts (1 launch)
  C) ONE batched rfft over a (k, N) buffer             (1 launch)
  D) empty-ish control program (x * 2)                 (launch floor)

If B/C ≈ D while A ≈ k × D, the launch — not the FFT — is the binding
constraint, and the fix is program fusion (`dsp.pipeline`), not a custom
FFT kernel.

Run on the real TPU:  python tools/bench_fft.py [N] [k]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_iters = 30

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal((k, N)).astype(np.float32))
    scale = jax.jit(lambda a, c: a * c)
    # distinct device-derived inputs per timed call (the backend memoizes
    # identical (program, buffer) executions)
    n_calls = 4 * (2 + n_iters)
    bufs = [scale(base, 1.0 + 1e-6 * i) for i in range(n_calls)]
    for b in bufs:
        float(b[0, 0])  # materialize & drain
    cnt = {"i": -1}

    def nxt():
        cnt["i"] += 1
        return bufs[cnt["i"] % len(bufs)]

    one_fft = jax.jit(lambda x: jnp.sum(jnp.abs(jnp.fft.rfft(x[0]))))

    def a_many_programs():
        acc = 0.0
        for j in range(k):
            acc = one_fft(nxt()) + 0 * acc
        return acc

    @jax.jit
    def b_one_program_k_ffts(x):
        return sum(
            jnp.sum(jnp.abs(jnp.fft.rfft(x[j]))) for j in range(k)
        )

    @jax.jit
    def c_batched(x):
        return jnp.sum(jnp.abs(jnp.fft.rfft(x, axis=1)))

    @jax.jit
    def d_control(x):
        return jnp.sum(x * 2.0)

    def timeit(fn):
        out = fn(nxt())
        float(np.asarray(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = fn(nxt())
            float(np.asarray(out))
            best = min(best, (time.perf_counter() - t0) / n_iters)
        return best

    def timeit_a():
        out = a_many_programs()
        float(np.asarray(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iters):
                out = a_many_programs()
            float(np.asarray(out))
            best = min(best, (time.perf_counter() - t0) / n_iters)
        return best

    res = {
        "N": N,
        "k": k,
        "a_k_programs_ms": round(timeit_a() * 1e3, 3),
        "b_one_program_k_ffts_ms": round(
            timeit(b_one_program_k_ffts) * 1e3, 3
        ),
        "c_one_batched_rfft_ms": round(timeit(c_batched) * 1e3, 3),
        "d_launch_control_ms": round(timeit(d_control) * 1e3, 3),
    }
    res["per_fft_inside_program_ms"] = round(
        max(res["b_one_program_k_ffts_ms"] - res["d_launch_control_ms"], 0)
        / k,
        4,
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
