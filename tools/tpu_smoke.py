"""Hardware validation sweep: run the public API end-to-end on a real TPU.

Takes ~8-10 minutes over a tunneled backend (every stage compiles).

Usage (on a machine with TPU access):
    python tools/tpu_smoke.py

Covers the full module surface — measurement pipeline (deconvolve, window,
RT), spectra/CSM/spectrogram/ISTFT, filter banks (LR, gammatone, QMF),
transforms (hilbert, cepstrum, CWT, VQT, warp, DFT), effects, generators,
beamforming, room acoustics, distances, transfer-function estimators —
exercising every complex-boundary path (`_config.run_jitted_complex`).
Prints one line per stage; exits non-zero on the first failure.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import dsptoolbox_tpu as dsp  # noqa: E402
from dsptoolbox_tpu import beamforming as bfm  # noqa: E402

EXAMPLE = "/root/reference/example_data"


def stage(name):
    print(f"[tpu-smoke] {name}", flush=True)


def main():
    tf = dsp.transfer_functions

    # ---- measurement pipeline
    chirp = dsp.Signal(f"{EXAMPLE}/chirp.wav")
    rec = dsp.Signal(f"{EXAMPLE}/chirp_stereo.wav")
    ir = tf.spectral_deconvolve(rec, chirp.get_channels(0), padding=True)
    ir_w, _ = tf.window_ir(ir, 2**14)
    stage("spectral deconvolution + windowing")
    rir = dsp.ImpulseResponse(f"{EXAMPLE}/rir.wav")
    rt, corr = dsp.room_acoustics.reverb_time(
        rir, dsp.room_acoustics.ReverbTime.T20
    )
    stage(f"RT20 = {np.round(np.asarray(rt), 3)}")

    # ---- spectra / spectrogram / istft
    s = dsp.pad_trim(dsp.Signal(f"{EXAMPLE}/speech.flac"), 2**15)
    t, f, sp = s.get_spectrogram()
    back = dsp.transforms.istft(sp, original_signal=s)
    err = float(np.max(np.abs(back.time_data - s.time_data)))
    assert err < 1e-4, err
    stage(f"spectrogram + ISTFT roundtrip (err {err:.1e})")
    st = dsp.pad_trim(dsp.Signal(f"{EXAMPLE}/chirp_stereo.wav"), 2**15)
    st.get_csm()
    st.get_spectrum()
    stage("welch PSD + CSM")

    # ---- filter banks
    fb = dsp.filterbanks.linkwitz_riley_crossovers(
        [500, 2000], order=4, sampling_rate_hz=st.sampling_rate_hz
    )
    fb.filter_signal(st, dsp.FilterBankMode.Parallel)
    s8 = dsp.pad_trim(dsp.resample(dsp.Signal(f"{EXAMPLE}/chirp_mono.wav"), 8000), 8192)
    gt = dsp.filterbanks.auditory_filters_gammatone(
        [300, 1500], sampling_rate_hz=8000
    )
    gt.reconstruct(gt.filter_signal(s8, dsp.FilterBankMode.Parallel))
    qmf = dsp.filterbanks.qmf_crossover(
        dsp.Filter.iir_filter(8, 2000.0, dsp.FilterPassType.Lowpass, 8000)
    )
    mb = qmf.filter_signal(
        s8, dsp.FilterBankMode.Parallel, downsample=True
    )
    qmf.reconstruct_signal(mb, upsample=True)
    stage("LR + gammatone (complex SOS) + QMF")

    # ---- transforms
    dsp.transforms.hilbert(st.get_channels(0))
    dsp.transforms.cepstrum(st.get_channels(0), True)
    dsp.transforms.cwt(
        s8, np.linspace(100, 200, 4),
        dsp.transforms.MorletWavelet(b=None, h=3, step=1e-3), None,
    )
    dsp.transforms.vqt(s8, octaves=[2, 3])
    dsp.transforms.warp(rir, -0.5, False, 128)
    dsp.transforms.dft(
        dsp.pad_trim(chirp, 10000), np.array([100.0, 250.0, 997.0])
    )
    stage("hilbert + cepstrum + CWT + VQT + warp + DFT")

    # ---- effects / standard
    comp = dsp.effects.Compressor(threshold_dbfs=-15)
    comp.apply(s8)
    sub = dsp.effects.SpectralSubtractor(
        adaptive_mode=True, threshold_rms_dbfs=-30,
        block_length_s=0.15, spectrum_to_subtract=False,
    )
    sub.apply(s8)
    dsp.envelope(s8, True, None)
    dsp.lufs_integrated(s8)
    dsp.fractional_delay(s8, 0.001)
    dsp.dither(s8)
    dsp.detrend(s8, polynomial_order=1)
    dsp.generators.noise(0.5, 48000, seed=1)
    stage("effects + level/delay/dither/detrend + noise")

    # ---- transfer-function estimators & co
    tf.compute_transfer_function(
        rec, chirp, 1024,
        mode=tf.TransferFunctionType.H1,
    )
    tf.complex_smoothing(rir, 6.0, tf.SmoothingDomain.RealImaginary)
    tf.window_frequency_dependent(dsp.pad_trim(rir, 4096), 8)
    tf.harmonics_from_chirp_ir(
        rir, chirp_range_hz=[20, 20e3], chirp_length_s=2, n_harmonics=2
    )
    f4096 = np.fft.rfftfreq(4096, 1 / s.sampling_rate_hz)
    spec = dsp.Spectrum(
        f4096, np.abs(np.fft.rfft(np.asarray(s.time_data[:4096, 0])))
    )
    tf.min_phase_from_mag(
        spec, s.sampling_rate_hz, ir_length_samples=4096
    )
    tf.minimum_phase(rir)
    stage("H1 + complex smoothing + FDW + harmonics + min-phase")

    # ---- distances
    dsp.distances.log_spectral(
        rec.get_channels(0), rec.get_channels(1),
        method="welch", f_range_hz=[200, 5000],
        energy_normalization=True, spectrum_parameters=None,
    )
    dsp.distances.si_sdr(rec.get_channels(0), rec.get_channels(1))
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
    bfm.BeamformerDASFrequency(sig, ma, g, st_vec).get_beamformer_map(
        2000, 3
    )
    room = dsp.room_acoustics.ShoeboxRoom([4.0, 3.0, 2.5], t60_s=0.3)
    dsp.room_acoustics.generate_synthetic_rir(
        room, [1, 1, 1], [2.5, 2, 1.2], 16000, max_order=6
    )
    stage("beamforming DAS map + synthetic RIR")

    # ---- realtime streaming classes
    import scipy.signal as ssig

    from dsptoolbox_tpu import realtime as rt

    rng = np.random.default_rng(0)
    xblk = rng.standard_normal(512) * 0.3
    b, a = ssig.butter(4, 0.3)
    fi = rt.IIRFilter(b, a)
    fi.set_n_channels(1)
    for blk in xblk.reshape(4, 128):
        fi.process_block(blk, 0)
    fu = rt.FIRUniformPartitioned(ssig.firwin(256, 0.25))
    fu.prepare(128, 1)
    for blk in xblk.reshape(4, 128):
        fu.process_block(blk, 0)
    stage("realtime streaming (IIR/UPOLS)")

    print("[tpu-smoke] ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
