"""Fused Pallas DAS kernel vs the XLA packed-quadratic oracle.

On-chip perf evidence lives in BASELINE.md (round 5); here the kernel
runs in interpret mode on the CPU mesh and must match `_das_map_core`
bit-closely, including the uniform-grid rotation-recurrence path and
padding edges.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsptoolbox_tpu.beamforming.beamforming import _das_map_core
from dsptoolbox_tpu.ops.pallas_das import das_map_fused


@pytest.mark.parametrize(
    "M,G,F",
    [(64, 900, 37), (9, 20, 13), (25, 130, 5), (64, 128, 16)],
)
@pytest.mark.parametrize("uniform", [False, True])
def test_matches_xla_core(M, G, F, uniform):
    rng = np.random.default_rng(0)
    amp = jnp.asarray(rng.uniform(0.5, 1.0, (M, G)).astype(np.float32))
    diff = jnp.asarray(
        (rng.standard_normal((M, G)) * 0.01).astype(np.float32)
    )
    k = jnp.asarray(np.linspace(10.0, 400.0, F).astype(np.float32))
    cre = jnp.asarray(rng.standard_normal((F, M, M)).astype(np.float32))
    cim = jnp.asarray(rng.standard_normal((F, M, M)).astype(np.float32))
    ref = np.asarray(jax.jit(_das_map_core)(amp, diff, k, cre, cim))
    got = np.asarray(
        das_map_fused(
            amp, diff, k, cre, cim, interpret=True, uniform_grid=uniform
        )
    )
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 5e-5, err


def test_public_das_map_forced_pallas():
    """`set_pallas_das("on")` routes the public DAS map through the
    kernel (interpret mode off-TPU) and matches the default XLA path."""
    import dsptoolbox_tpu as dsp
    from dsptoolbox_tpu import beamforming as bfm
    from dsptoolbox_tpu import _config

    _x = np.arange(0, 1.1, 0.5)
    xx, yy = np.meshgrid(_x, _x, indexing="ij")
    ma = bfm.MicArray(
        dict(x=xx.flatten(), y=yy.flatten(), z=np.zeros(xx.size))
    )
    src = bfm.MonopoleSource(
        dsp.generators.noise(0.2, 16000, seed=0), [0, 0.4, 0.5]
    )
    sig = src.get_signals_on_array(ma)
    g = bfm.Regular2DGrid(
        np.arange(-0.2, 0.2, 0.2), np.arange(-0.4, 0.5, 0.2),
        ["x", "y"], value3=0.5,
    )
    st = bfm.SteeringVector(formulation=bfm.SteeringVectorType.TrueLocation)

    def one_map():
        return np.asarray(
            bfm.BeamformerDASFrequency(sig, ma, g, st).get_beamformer_map(
                2000, 3
            )
        )

    base = one_map()
    _config.set_pallas_das("on")
    try:
        forced = one_map()
    finally:
        _config.set_pallas_das("auto")
    err = np.max(np.abs(forced - base)) / np.max(np.abs(base))
    assert err < 1e-4, err
