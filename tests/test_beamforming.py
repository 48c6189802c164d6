"""Beamforming tests: geometry, steering vectors, and oracle maps.

Deterministic source material (a chirp) is propagated to the array in both
frameworks so beamformer maps can be compared numerically.
"""

import numpy as np
import pytest

import dsptoolbox_tpu as dsp
from dsptoolbox_tpu import beamforming as bf

EXAMPLE = "/root/reference/example_data"

_x = np.arange(0, 1.1, 0.25)
_xx, _yy, _zz = np.meshgrid(_x, _x, _x, indexing="ij")
POINTS = dict(x=_xx.flatten(), y=_yy.flatten(), z=_zz.flatten())


class TestGeometry:
    def test_grid_basics(self):
        g = bf.Grid(positions=POINTS)
        assert np.all([0, 1] == g.extent["x"])
        assert g.number_of_points == len(_x) ** 3
        d = g.get_distances_to_point([0, 0, 0])
        assert d.shape == (g.number_of_points,)
        g.find_nearest_point([-0.2, 0.1, -1])

    def test_regular_grids(self):
        g2 = bf.Regular2DGrid(
            line1=_x, line2=_x, dimensions=("x", "y"), value3=2
        )
        assert g2.number_of_points == len(_x) ** 2
        g3 = bf.Regular3DGrid(_x, _x, _x)
        assert g3.number_of_points == len(_x) ** 3
        gl = bf.LineGrid(line=_x, dimension="x", value2=0, value3=1)
        assert gl.number_of_points == len(_x)

    def test_mic_array(self, ref):
        m_m = bf.MicArray(POINTS)
        m_r = ref.beamforming.MicArray(POINTS)
        assert (
            m_m.array_center_channel_number
            == m_r.array_center_channel_number
        )
        np.testing.assert_allclose(
            m_m.array_center_coordinates, m_r.array_center_coordinates
        )
        np.testing.assert_allclose(m_m.aperture, m_r.aperture)
        np.testing.assert_allclose(
            m_m.get_maximum_frequency_range(),
            m_r.get_maximum_frequency_range(),
        )


class TestSteeringVector:
    @pytest.mark.parametrize(
        "formulation",
        ["Classic", "Inverse", "TruePower", "TrueLocation"],
    )
    def test_oracle(self, ref, formulation):
        ma_m = bf.MicArray(POINTS)
        ma_r = ref.beamforming.MicArray(POINTS)
        xval = np.arange(-0.5, 0.5, 0.1)
        g_m = bf.Regular2DGrid(xval, xval, ["x", "y"], value3=1)
        g_r = ref.beamforming.Regular2DGrid(
            xval, xval, ["x", "y"], value3=1
        )
        k = np.array([1000, 1200]) * np.pi * 2 / 343
        st_m = bf.SteeringVector(
            formulation=getattr(bf.SteeringVectorType, formulation)
        )
        st_r = ref.beamforming.SteeringVector(
            formulation=getattr(
                ref.beamforming.SteeringVectorType, formulation
            )
        )
        h_m = np.asarray(st_m.get_vector(k, g_m, ma_m))
        h_r = st_r.get_vector(k, g_r, ma_r)
        np.testing.assert_allclose(h_m, h_r, atol=1e-5)


@pytest.fixture(scope="module")
def array_signal_pair(ref):
    """Chirp monopole at [0, 0.4, 0.5] captured on a planar array."""
    ma_pts = {k: v.copy() for k, v in POINTS.items()}
    ma_pts["z"] = np.zeros(len(ma_pts["x"]))
    ma_m = bf.MicArray(ma_pts)
    ma_r = ref.beamforming.MicArray(ma_pts)
    c_m = dsp.pad_trim(
        dsp.resample(dsp.Signal(f"{EXAMPLE}/chirp_mono.wav"), 10000), 20000
    )
    c_r = ref.pad_trim(
        ref.resample(ref.Signal(f"{EXAMPLE}/chirp_mono.wav"), 10000), 20000
    )
    src_m = bf.MonopoleSource(c_m, [0, 0.4, 0.5])
    src_r = ref.beamforming.MonopoleSource(c_r, [0, 0.4, 0.5])
    s_m = src_m.get_signals_on_array(ma_m)
    s_r = src_r.get_signals_on_array(ma_r)
    return (ma_m, s_m), (ma_r, s_r)


class TestMonopoleTransmission:
    def test_signals_on_array_oracle(self, ref, close, array_signal_pair):
        (_, s_m), (_, s_r) = array_signal_pair
        close(s_m.time_data, s_r.time_data, 5e-4, "monopole on array")


def _grids(ref):
    xval = np.arange(-0.2, 0.2, 0.1)
    yval = np.arange(-0.5, 0.5, 0.1)
    g_m = bf.Regular2DGrid(xval, yval, ["x", "y"], value3=0.5)
    g_r = ref.beamforming.Regular2DGrid(
        xval, yval, ["x", "y"], value3=0.5
    )
    return g_m, g_r


class TestFrequencyBeamformers:
    def test_das_oracle(self, ref, close, array_signal_pair):
        (ma_m, s_m), (ma_r, s_r) = array_signal_pair
        g_m, g_r = _grids(ref)
        st_m = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        st_r = ref.beamforming.SteeringVector(
            formulation=ref.beamforming.SteeringVectorType.TrueLocation
        )
        b_m = bf.BeamformerDASFrequency(s_m, ma_m, g_m, st_m)
        b_r = ref.beamforming.BeamformerDASFrequency(s_r, ma_r, g_r, st_r)
        m_m = b_m.get_beamformer_map(2000, 0, remove_csm_diagonal=True)
        m_r = b_r.get_beamformer_map(2000, 0, remove_csm_diagonal=True)
        close(np.asarray(m_m), np.asarray(m_r), 1e-3, "DAS map")

    @pytest.mark.parametrize(
        "name,kwargs",
        [
            ("BeamformerFunctional", dict(gamma=10)),
            (
                "BeamformerCleanSC",
                dict(
                    maximum_iterations=10,
                    safety_factor=0.5,
                    remove_csm_diagonal=True,
                ),
            ),
        ],
    )
    def test_other_beamformers_oracle(
        self, ref, close, array_signal_pair, name, kwargs
    ):
        (ma_m, s_m), (ma_r, s_r) = array_signal_pair
        g_m, g_r = _grids(ref)
        st_m = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        st_r = ref.beamforming.SteeringVector(
            formulation=ref.beamforming.SteeringVectorType.TrueLocation
        )
        b_m = getattr(bf, name)(s_m, ma_m, g_m, st_m)
        b_r = getattr(ref.beamforming, name)(s_r, ma_r, g_r, st_r)
        m_m = np.asarray(b_m.get_beamformer_map(2000, 0, **kwargs))
        m_r = np.asarray(b_r.get_beamformer_map(2000, 0, **kwargs))
        close(m_m, m_r, 5e-3, f"{name} map")

    @pytest.mark.parametrize("remove_diag", [False, True])
    def test_clean_sc_device_matches_host_loop(
        self, ref, array_signal_pair, remove_diag
    ):
        """The batched on-device CLEAN-SC (one program, lax.fori_loop
        with masked early exit) must match the host per-bin oracle
        loop."""
        from dsptoolbox_tpu import _config

        (ma_m, s_m), _ = array_signal_pair
        g_m, _ = _grids(ref)
        st = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        b = bf.BeamformerCleanSC(s_m, ma_m, g_m, st)
        kwargs = dict(
            maximum_iterations=10,
            safety_factor=0.5,
            remove_csm_diagonal=remove_diag,
        )
        assert _config.clean_sc_on_device()
        m_dev = np.asarray(b.get_beamformer_map(2000, 3, **kwargs))
        _config.set_clean_sc_on_device(False)
        try:
            m_host = np.asarray(b.get_beamformer_map(2000, 3, **kwargs))
        finally:
            _config.set_clean_sc_on_device(True)
        np.testing.assert_allclose(
            m_dev,
            m_host,
            rtol=1e-3,
            atol=1e-5 * np.max(np.abs(m_host)),
        )

    def test_orthogonal_oracle(self, ref, array_signal_pair):
        # The orthogonal beamformer scatters each eigenvalue's energy to
        # the argmax of its eigenvector map; for noise-subspace
        # eigenvectors that argmax is decided by fp32-level CSM noise, so
        # only the dominant structure is comparable to the f64 oracle.
        (ma_m, s_m), (ma_r, s_r) = array_signal_pair
        g_m, g_r = _grids(ref)
        st_m = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        st_r = ref.beamforming.SteeringVector(
            formulation=ref.beamforming.SteeringVectorType.TrueLocation
        )
        b_m = bf.BeamformerOrthogonal(s_m, ma_m, g_m, st_m)
        b_r = ref.beamforming.BeamformerOrthogonal(s_r, ma_r, g_r, st_r)
        # only the dominant (signal-subspace) eigenvalue is numerically
        # stable — the noise-subspace scatter locations are decided by
        # fp32-level CSM noise and cannot match an f64 oracle
        m_m = np.asarray(
            b_m.get_beamformer_map(2000, 3, number_eigenvalues=1)
        )
        m_r = np.asarray(
            b_r.get_beamformer_map(2000, 3, number_eigenvalues=1)
        )
        assert np.unravel_index(np.argmax(m_m), m_m.shape) == (
            np.unravel_index(np.argmax(m_r), m_r.shape)
        )
        np.testing.assert_allclose(m_m.max(), m_r.max(), rtol=1e-3)
        # full map (all eigenvalues) must still run
        b_m.get_beamformer_map(2000, 0, number_eigenvalues=None)

    def test_mvdr_runs(self, array_signal_pair):
        (ma_m, s_m), _ = array_signal_pair
        xval = np.arange(-0.2, 0.2, 0.1)
        yval = np.arange(-0.5, 0.5, 0.1)
        g_m = bf.Regular2DGrid(xval, yval, ["x", "y"], value3=0.5)
        st_m = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        b_m = bf.BeamformerMVDR(s_m, ma_m, g_m, st_m)
        try:
            m = np.asarray(b_m.get_beamformer_map(2000, 0, gamma=10))
            assert np.all(np.isfinite(m))
        except np.linalg.LinAlgError:
            pass

    def test_das_map_follows_grid_reassignment(self, array_signal_pair):
        # the cached steering amp/diff must invalidate when the grid is
        # swapped for another of the same size (regression: id-only key)
        (ma_m, s_m), _ = array_signal_pair
        xval = np.arange(-0.2, 0.2, 0.1)
        yval = np.arange(-0.2, 0.2, 0.1)
        g_a = bf.Regular2DGrid(xval, yval, ["x", "y"], value3=0.5)
        g_b = bf.Regular2DGrid(
            xval + 0.15, yval, ["x", "y"], value3=0.5
        )  # same shape, shifted region
        st = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        das = bf.BeamformerDASFrequency(s_m, ma_m, g_a, st)
        m_a = das.get_beamformer_map(2000, 3)
        das.grid = g_b
        m_b = das.get_beamformer_map(2000, 3)
        fresh = bf.BeamformerDASFrequency(s_m, ma_m, g_b, st)
        m_fresh = fresh.get_beamformer_map(2000, 3)
        np.testing.assert_allclose(m_b, m_fresh, rtol=1e-5)
        assert not np.allclose(m_a, m_b)

    def test_mvdr_device_loaded_solve_matches_f64_oracle(self):
        # Device path: equilibrated + diagonally-loaded Cholesky solve in
        # one program. Oracle: the same loaded system solved in host f64.
        # Target 1e-4 (VERDICT round-1 item 5).
        from scipy.integrate import simpson

        ma_pts = {k: v.copy() for k, v in POINTS.items()}
        ma_pts["z"] = np.zeros(len(ma_pts["x"]))
        ma_m = bf.MicArray(ma_pts)
        src = bf.MonopoleSource(
            dsp.generators.noise(
                length_seconds=1.5, sampling_rate_hz=16000, seed=11
            ),
            [0.1, -0.1, 0.5],
        )
        s_m = src.get_signals_on_array(ma_m)
        xval = np.arange(-0.2, 0.2, 0.05)
        yval = np.arange(-0.2, 0.2, 0.05)
        g_m = bf.Regular2DGrid(xval, yval, ["x", "y"], value3=0.5)
        st_m = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        b_m = bf.BeamformerMVDR(s_m, ma_m, g_m, st_m)
        gamma = 10.0
        m_dev = b_m.get_beamformer_map(2000, 3, gamma=gamma)

        f, csm, h = b_m._csm_and_steering(2000, 3)
        csm64 = np.asarray(csm, dtype=np.complex128)
        d = np.einsum("fii->fi", csm64).real
        loaded = csm64 + 10.0 ** (-gamma / 10.0) * (
            d[:, :, None] * np.eye(csm64.shape[-1])[None]
        )
        csm_1 = np.linalg.inv(loaded)
        h64 = np.asarray(h, dtype=np.complex128)
        denom = np.einsum("fmg,fmg->gf", np.conj(h64), csm_1 @ h64).real
        mp = 1 / denom
        mp = (
            simpson(mp, dx=f[1] - f[0], axis=1)
            if len(f) > 1
            else mp.squeeze()
        )
        m_oracle = b_m.grid.reconstruct_map_shape(mp)
        rel = np.abs(m_dev - m_oracle) / np.abs(m_oracle).max()
        assert rel.max() < 1e-4, f"loaded MVDR off by {rel.max():.2e}"
        # the loaded solve must also be stable on the raw (rank-deficient,
        # cond ~1e9) coherent-scene CSM where the unloaded inverse is
        # numerically meaningless
        assert np.all(np.isfinite(m_dev))

    def test_mvdr_device_form_matches_f64_oracle(self):
        # solve_on_device=False: the inverse is f64 host (reference-exact,
        # no loading); the quadratic form runs on device. Compare the full
        # map against an all-f64 host evaluation. (A noise source keeps
        # the CSM invertible — the shared chirp fixture's coherent CSM is
        # exactly singular.)
        from scipy.integrate import simpson

        ma_pts = {k: v.copy() for k, v in POINTS.items()}
        ma_pts["z"] = np.zeros(len(ma_pts["x"]))
        ma_m = bf.MicArray(ma_pts)
        src = bf.MonopoleSource(
            dsp.generators.noise(
                length_seconds=1.5, sampling_rate_hz=16000, seed=11
            ),
            [0.1, -0.1, 0.5],
        )
        s_m = src.get_signals_on_array(ma_m)
        # independent sensor noise: full-rank, invertible CSM (a purely
        # coherent scene's CSM is near-singular by construction)
        td = s_m.time_data
        td = td + np.random.default_rng(3).normal(
            0.0, 1e-3, td.shape
        )
        s_m.time_data = td
        xval = np.arange(-0.2, 0.2, 0.05)
        yval = np.arange(-0.2, 0.2, 0.05)
        g_m = bf.Regular2DGrid(xval, yval, ["x", "y"], value3=0.5)
        st_m = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        b_m = bf.BeamformerMVDR(s_m, ma_m, g_m, st_m)
        m_new = b_m.get_beamformer_map(2000, 3, solve_on_device=False)

        f, csm, h = b_m._csm_and_steering(2000, 3)
        csm_1 = np.linalg.inv(np.asarray(csm, dtype=np.complex128))
        h64 = np.asarray(h, dtype=np.complex128)
        denom = np.einsum("fmg,fmg->gf", np.conj(h64), csm_1 @ h64).real
        mp = 1 / denom
        mp = (
            simpson(mp, dx=f[1] - f[0], axis=1)
            if len(f) > 1
            else mp.squeeze()
        )
        m_old = b_m.grid.reconstruct_map_shape(mp)
        rel = np.abs(m_new - m_old) / np.abs(m_old).max()
        # projections onto near-null eigenvectors cancel in the compute
        # dtype; ~1e-3 of map max ≈ 0.006 dB — invisible on a dB map
        assert rel.max() < 5e-3, f"MVDR device form off by {rel.max():.2e}"
        assert np.unravel_index(np.argmax(m_new), m_new.shape) == (
            np.unravel_index(np.argmax(m_old), m_old.shape)
        )


class TestTimeBeamformer:
    def test_das_time_oracle(self, ref, close, array_signal_pair):
        (ma_m, s_m), (ma_r, s_r) = array_signal_pair
        xval = np.arange(-0.5, 0.5, 0.1)
        g_m = bf.LineGrid(xval, "y", 0.5, 0)
        g_r = ref.beamforming.LineGrid(xval, "y", 0.5, 0)
        b_m = bf.BeamformerDASTime(s_m, ma_m, g_m)
        b_r = ref.beamforming.BeamformerDASTime(s_r, ma_r, g_r)
        out_m = b_m.get_beamformer_output()
        out_r = b_r.get_beamformer_output()
        close(
            out_m.time_data, out_r.time_data, 1e-3, "DAS time output"
        )

    def test_das_time_chunked_equals_single_chunk(
        self, array_signal_pair, monkeypatch
    ):
        """Multi-chunk grid execution (tiny chunk budget) must equal the
        one-chunk path — exercises the last-chunk edge padding + trim."""
        from dsptoolbox_tpu.beamforming import beamforming as bfm

        (ma_m, s_m), _ = array_signal_pair
        xval = np.arange(-0.5, 0.5, 0.15)
        g_m = bf.LineGrid(xval, "y", 0.5, 0)
        b_m = bf.BeamformerDASTime(s_m, ma_m, g_m)
        full = np.asarray(b_m.get_beamformer_output().time_data)
        monkeypatch.setattr(bfm, "_DAS_TIME_CHUNK_BYTES", 1.0)
        chunked = np.asarray(b_m.get_beamformer_output().time_data)
        # fp32 einsum accumulation order differs per chunk width
        np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-6)


class TestArrayXml:
    """BASELINE config 5: array.xml geometry -> beamforming sweep."""

    def test_from_xml_geometry(self):
        ma = bf.MicArray.from_xml(f"{EXAMPLE}/array.xml")
        assert ma.number_of_points == 64
        assert ma.aperture > 0

    def test_das_sweep_localizes_source(self):
        ma = bf.MicArray.from_xml(f"{EXAMPLE}/array.xml")
        center = ma.array_center_coordinates
        true_pos = [center[0] + 0.1, center[1], center[2] + 0.5]
        src = bf.MonopoleSource(
            dsp.generators.noise(0.4, 16000, seed=3), true_pos
        )
        sig = src.get_signals_on_array(ma)
        xs = np.linspace(center[0] - 0.3, center[0] + 0.3, 13)
        ys = np.linspace(center[1] - 0.3, center[1] + 0.3, 13)
        g = bf.Regular2DGrid(xs, ys, ["x", "y"], value3=center[2] + 0.5)
        st = bf.SteeringVector(
            formulation=bf.SteeringVectorType.TrueLocation
        )
        m = np.asarray(
            bf.BeamformerDASFrequency(sig, ma, g, st).get_beamformer_map(
                2000, 3
            )
        )
        peak = np.unravel_index(np.argmax(m), m.shape)
        px, py = xs[peak[0]], ys[peak[1]]
        assert abs(px - true_pos[0]) < 0.11, (px, true_pos[0])
        assert abs(py - true_pos[1]) < 0.11, (py, true_pos[1])
