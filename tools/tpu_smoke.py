"""Hardware validation sweep: run the public API end-to-end on a real TPU
and assert every stage's numerics against committed CPU-oracle goldens.

Takes ~8-10 minutes over a tunneled backend (every stage compiles).

Usage:
    python tools/tpu_smoke.py                 # on TPU: run + golden asserts
    python tools/tpu_smoke.py --make-golden   # on CPU: regenerate goldens

Covers the full module surface — measurement pipeline (deconvolve, window,
RT), spectra/CSM/spectrogram/ISTFT, filter banks (LR, gammatone, QMF),
transforms (hilbert, cepstrum, CWT, VQT, warp, DFT), effects, generators,
beamforming, room acoustics, distances, transfer-function estimators —
exercising every complex-boundary path (`_config.run_jitted_complex`) in
BOTH directions. Each stage's outputs are digest-compared to
`tools/golden/tpu_smoke_golden.npz` (fp32 cross-backend tolerances, see
docs/parity_notes.md); a stage that runs but produces wrong numbers FAILS.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MAKE_GOLDEN = "--make-golden" in sys.argv

if MAKE_GOLDEN:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import dsptoolbox_tpu as dsp  # noqa: E402
from dsptoolbox_tpu import beamforming as bfm  # noqa: E402
from golden import GoldenChecker  # noqa: E402

EXAMPLE = "/root/reference/example_data"


def stage(name):
    print(f"[tpu-smoke] {name}", flush=True)


def main():
    gc = GoldenChecker(MAKE_GOLDEN)
    tf = dsp.transfer_functions

    # ---- measurement pipeline
    chirp = dsp.Signal(f"{EXAMPLE}/chirp.wav")
    rec = dsp.Signal(f"{EXAMPLE}/chirp_stereo.wav")
    ir = tf.spectral_deconvolve(rec, chirp.get_channels(0), padding=True)
    ir_w, _ = tf.window_ir(ir, 2**14)
    gc.check("deconvolve_window_ir", ir_w.time_data, rtol=5e-3)
    stage("spectral deconvolution + windowing")
    rir = dsp.ImpulseResponse(f"{EXAMPLE}/rir.wav")
    rt, corr = dsp.room_acoustics.reverb_time(
        rir, dsp.room_acoustics.ReverbTime.T20
    )
    gc.check("rt20", rt, rtol=1e-3)
    stage(f"RT20 = {np.round(np.asarray(rt), 3)}")

    # ---- spectra / spectrogram / istft
    s = dsp.pad_trim(dsp.Signal(f"{EXAMPLE}/speech.flac"), 2**15)
    t, f, sp = s.get_spectrogram()
    gc.check("spectrogram", np.asarray(sp), rtol=5e-3)
    back = dsp.transforms.istft(sp, original_signal=s)
    err = float(np.max(np.abs(back.time_data - s.time_data)))
    assert err < 1e-4, err
    stage(f"spectrogram + ISTFT roundtrip (err {err:.1e})")
    st = dsp.pad_trim(dsp.Signal(f"{EXAMPLE}/chirp_stereo.wav"), 2**15)
    _, csm = st.get_csm()
    gc.check("welch_csm", np.asarray(csm), rtol=5e-3)
    _, spec_w = st.get_spectrum()
    gc.check("welch_spectrum", np.asarray(spec_w), rtol=5e-3)
    stage("welch PSD + CSM")

    # ---- filter banks
    fb = dsp.filterbanks.linkwitz_riley_crossovers(
        [500, 2000], order=4, sampling_rate_hz=st.sampling_rate_hz
    )
    mb_lr = fb.filter_signal(st, dsp.FilterBankMode.Parallel)
    gc.check("lr_band0", mb_lr.bands[0].time_data, rtol=5e-3)
    s8 = dsp.pad_trim(
        dsp.resample(dsp.Signal(f"{EXAMPLE}/chirp_mono.wav"), 8000), 8192
    )
    gt = dsp.filterbanks.auditory_filters_gammatone(
        [300, 1500], sampling_rate_hz=8000
    )
    # broadband seeded noise: the early-chirp slice in `s8` is below the
    # gammatone band, which makes the output ~1e-4-scale pure filter
    # rounding — useless as a cross-backend comparison signal
    gn = dsp.pad_trim(dsp.generators.noise(1.1, 8000, seed=3), 8192)
    gt_rec = gt.reconstruct(gt.filter_signal(gn, dsp.FilterBankMode.Parallel))
    gc.check("gammatone_reconstruct", gt_rec.time_data, rtol=5e-3)
    qmf = dsp.filterbanks.qmf_crossover(
        dsp.Filter.iir_filter(8, 2000.0, dsp.FilterPassType.Lowpass, 8000)
    )
    mb = qmf.filter_signal(
        s8, dsp.FilterBankMode.Parallel, downsample=True
    )
    qmf_rec = qmf.reconstruct_signal(mb, upsample=True)
    gc.check("qmf_reconstruct", qmf_rec.time_data, rtol=5e-3, atol=5e-3)
    stage("LR + gammatone (complex SOS) + QMF")

    # ---- transforms
    hil = dsp.transforms.hilbert(st.get_channels(0))
    gc.check("hilbert", hil.time_data, rtol=5e-3)
    cep = dsp.transforms.cepstrum(st.get_channels(0), True)
    gc.check("cepstrum", np.asarray(cep), rtol=5e-3)
    cwt_out = dsp.transforms.cwt(
        s8, np.linspace(100, 200, 4),
        dsp.transforms.MorletWavelet(b=None, h=3, step=1e-3), None,
    )
    gc.check("cwt", np.asarray(cwt_out), rtol=1e-2)
    vqt_out = dsp.transforms.vqt(s8, octaves=[2, 3])
    gc.check("vqt", np.asarray(vqt_out[-1]), rtol=1e-2)
    warp_out = dsp.transforms.warp(rir, -0.5, False, 128)
    gc.check("warp", warp_out.time_data, rtol=1e-2)
    dft_out = dsp.transforms.dft(
        dsp.pad_trim(chirp, 10000), np.array([100.0, 250.0, 997.0])
    )
    gc.check("dft", np.asarray(dft_out), rtol=5e-3)
    stage("hilbert + cepstrum + CWT + VQT + warp + DFT")

    # ---- effects / standard
    comp = dsp.effects.Compressor(threshold_dbfs=-15)
    comp_out = comp.apply(s8)
    gc.check("compressor", comp_out.time_data, rtol=5e-3)
    sub = dsp.effects.SpectralSubtractor(
        adaptive_mode=True, threshold_rms_dbfs=-30,
        block_length_s=0.15, spectrum_to_subtract=False,
    )
    sub_out = sub.apply(s8)
    gc.check("spectral_subtractor", sub_out.time_data, rtol=1e-2)
    env = dsp.envelope(s8, True, None)
    gc.check("envelope", np.asarray(env), rtol=5e-3)
    lufs = dsp.lufs_integrated(s8)
    gc.check("lufs", np.asarray(lufs), rtol=1e-3)
    fd = dsp.fractional_delay(s8, 0.001)
    gc.check("fractional_delay", fd.time_data, rtol=5e-3)
    dsp.dither(s8)  # stochastic: run-only
    det = dsp.detrend(s8, polynomial_order=1)
    gc.check("detrend", det.time_data, rtol=5e-3)
    noi = dsp.generators.noise(0.5, 48000, seed=1)
    gc.check("noise_seed1", noi.time_data, rtol=5e-3)
    stage("effects + level/delay/dither/detrend + noise")

    # ---- transfer-function estimators & co
    # well-conditioned H1: lowpassed chirp vs the chirp (coherent pair;
    # H1 between unrelated signals is noise-amplified at low-energy bins
    # and diverges between backends by construction)
    lp = dsp.Filter.iir_filter(
        4, 2000.0, dsp.FilterPassType.Lowpass, chirp.sampling_rate_hz
    )
    # seeded broadband floor: bins the chirp never excites make the
    # S_xy/S_xx ratio pure noise, which diverges between backends by
    # construction — condition every bin instead
    exc = dsp.Signal(
        None,
        np.asarray(chirp.time_data)[:, 0] * 0.9
        + 0.01
        * np.asarray(
            dsp.generators.noise(
                chirp.length_samples / chirp.sampling_rate_hz,
                chirp.sampling_rate_hz,
                seed=7,
            ).time_data
        )[: chirp.length_samples, 0],
        chirp.sampling_rate_hz,
    )
    h1 = tf.compute_transfer_function(
        lp.filter_signal(exc), exc, 1024,
        mode=tf.TransferFunctionType.H1,
    )
    # DC/Nyquist excluded: Welch segment detrending leaves those bins
    # unexcited, so the H1 ratio there is backend-dependent noise
    gc.check("h1_estimator", np.asarray(h1.spectral_data)[1:-1],
             rtol=1e-2, atol=5e-3)
    smo = tf.complex_smoothing(rir, 6.0, tf.SmoothingDomain.RealImaginary)
    gc.check("complex_smoothing", np.asarray(smo.spectral_data), rtol=1e-2, atol=5e-3)
    fdw = tf.window_frequency_dependent(dsp.pad_trim(rir, 4096), 8)
    gc.check("fdw", np.asarray(fdw.spectral_data), rtol=1e-2)
    harm = tf.harmonics_from_chirp_ir(
        rir, chirp_range_hz=[20, 20e3], chirp_length_s=2, n_harmonics=2
    )
    gc.check("harmonics0", harm[0].time_data, rtol=1e-2)
    f4096 = np.fft.rfftfreq(4096, 1 / s.sampling_rate_hz)
    spec = dsp.Spectrum(
        f4096, np.abs(np.fft.rfft(np.asarray(s.time_data[:4096, 0])))
    )
    mpm = tf.min_phase_from_mag(
        spec, s.sampling_rate_hz, ir_length_samples=4096
    )
    gc.check("min_phase_from_mag", mpm.time_data, rtol=1e-2)
    _, minph = tf.minimum_phase(rir)
    gc.check("minimum_phase", np.asarray(minph), rtol=1e-2)
    stage("H1 + complex smoothing + FDW + harmonics + min-phase")

    # ---- distances
    lsd = dsp.distances.log_spectral(
        rec.get_channels(0), rec.get_channels(1),
        method="welch", f_range_hz=[200, 5000],
        energy_normalization=True, spectrum_parameters=None,
    )
    gc.check("log_spectral", np.asarray(lsd), rtol=5e-3)
    sisdr = dsp.distances.si_sdr(rec.get_channels(0), rec.get_channels(1))
    gc.check("si_sdr", np.asarray(sisdr), rtol=5e-3)
    stage("distances")

    # ---- beamforming + room acoustics
    _x = np.arange(0, 1.1, 0.5)
    xx, yy = np.meshgrid(_x, _x, indexing="ij")
    ma = bfm.MicArray(
        dict(x=xx.flatten(), y=yy.flatten(), z=np.zeros(xx.size))
    )
    src = bfm.MonopoleSource(
        dsp.generators.noise(0.25, 16000, seed=0), [0, 0.4, 0.5]
    )
    sig = src.get_signals_on_array(ma)
    g = bfm.Regular2DGrid(
        np.arange(-0.2, 0.2, 0.2), np.arange(-0.4, 0.5, 0.2),
        ["x", "y"], value3=0.5,
    )
    st_vec = bfm.SteeringVector(
        formulation=bfm.SteeringVectorType.TrueLocation
    )
    das_map = bfm.BeamformerDASFrequency(
        sig, ma, g, st_vec
    ).get_beamformer_map(2000, 3)
    gc.check("das_map", np.asarray(das_map), rtol=1e-2)
    room = dsp.room_acoustics.ShoeboxRoom([4.0, 3.0, 2.5], t60_s=0.3)
    srir = dsp.room_acoustics.generate_synthetic_rir(
        room, [1, 1, 1], [2.5, 2, 1.2], 16000, max_order=6
    )
    gc.check("synthetic_rir", srir.time_data, rtol=1e-2)
    stage("beamforming DAS map + synthetic RIR")

    # ---- realtime streaming classes
    import scipy.signal as ssig

    from dsptoolbox_tpu import realtime as rt

    rng = np.random.default_rng(0)
    xblk = rng.standard_normal(512) * 0.3
    b, a = ssig.butter(4, 0.3)
    fi = rt.IIRFilter(b, a)
    fi.set_n_channels(1)
    iir_blocks = [fi.process_block(blk, 0) for blk in xblk.reshape(4, 128)]
    gc.check("rt_iir", np.concatenate(iir_blocks), rtol=5e-3)
    fu = rt.FIRUniformPartitioned(ssig.firwin(256, 0.25))
    fu.prepare(128, 1)
    up_blocks = [fu.process_block(blk, 0) for blk in xblk.reshape(4, 128)]
    gc.check("rt_upols", np.concatenate(up_blocks), rtol=5e-3)
    stage("realtime streaming (IIR/UPOLS)")

    gc.finish()
    print("[tpu-smoke] ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
