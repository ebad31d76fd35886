"""Measurement-toolkit matrix — mirrors reference src/util.rs unit coverage
(the functions every test tier asserts against must themselves be right)."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr

FS = 48_000.0


def test_rms_known():
    assert float(sdr.rms(np.ones(100, np.float32))) == pytest.approx(1.0)
    t = np.sin(2 * np.pi * 1000 * np.arange(4800) / FS).astype(np.float32)
    assert float(sdr.rms(t)) == pytest.approx(1 / np.sqrt(2), rel=1e-2)


def test_tone_generators():
    a = np.asarray(sdr.tone(FS, 1000.0, 4800))
    assert a.dtype == np.float32 and len(a) == 4800
    z = np.asarray(sdr.gen_complex_tone(FS, 1000.0, 4800))
    assert z.dtype == np.complex64
    np.testing.assert_allclose(np.abs(z), 1.0, atol=1e-5)


def test_snr_db_at_coarse_metric_conventions():
    """snr_db_at is the reference's COARSE single-bin metric: a clean real
    sine reads ~0 dB (half the power is the "noise" residual — documented
    behavior, kept for parity), and heavy noise drags it well below."""
    rng = np.random.default_rng(0)
    t = np.asarray(sdr.tone(FS, 3000.0, 8192))
    clean = float(sdr.snr_db_at(FS, 3000.0, t))
    assert -1.0 < clean < 1.0
    noisy = float(sdr.snr_db_at(FS, 3000.0,
                                t + sdr.awgn(rng, 8192, 1.0,
                                             complex_=False)))
    assert noisy < clean - 3.0


def test_power_spectrum_peak_location():
    z = np.asarray(sdr.gen_complex_tone(FS, 6000.0, 8192))
    power_db, bin_hz = sdr.power_spectrum(z, FS)
    peak_hz = int(np.argmax(power_db)) * bin_hz
    assert abs(peak_hz - 6000.0) < 2 * bin_hz


def test_power_spectrum_fft_size_clamped():
    # clamp [64, 4096] (ref util.rs:96): tiny and huge inputs both work
    for n in (10, 1 << 16):
        power_db, bin_hz = sdr.power_spectrum(
            np.ones(n, np.complex64), FS)
        assert 64 // 2 + 1 <= len(power_db) <= 4096 // 2 + 1


def test_nb_spectrum_snr_monotone_in_noise():
    rng = np.random.default_rng(1)
    z = np.asarray(sdr.gen_complex_tone(FS, 2000.0, 1 << 14))
    vals = []
    for scale in (0.01, 0.1, 0.5):
        vals.append(float(sdr.nb_spectrum_snr_db(
            z + sdr.awgn(rng, len(z), scale), FS, 2000.0)))
    assert vals[0] > vals[1] > vals[2]


def test_wb_spectrum_snr_in_band_vs_out():
    """Mean in-band vs median out-of-band (OFDM-style, carrier + width)."""
    rng = np.random.default_rng(2)
    n = 4096
    spec = np.zeros(n, np.complex64)
    band = (np.abs(np.fft.fftfreq(n, 1 / FS)) < 4000.0)
    spec[band] = (rng.standard_normal(band.sum()) +
                  1j * rng.standard_normal(band.sum())).astype(np.complex64)
    z = np.fft.ifft(spec).astype(np.complex64)
    z = (z / np.sqrt(np.mean(np.abs(z) ** 2))).astype(np.complex64)
    z = z + sdr.awgn(rng, n, 1e-3)
    # positive-frequency half-band centred at 2 kHz, 4 kHz wide
    snr = float(sdr.wb_spectrum_snr_db(z, FS, 2000.0, 4000.0))
    assert snr > 20.0


def test_spectrum_bw_measures_band():
    """AM-style occupied bandwidth around a carrier."""
    rng = np.random.default_rng(3)
    n = 4096
    spec = np.zeros(n, np.complex64)
    f = np.fft.fftfreq(n, 1 / FS)
    band = np.abs(f - 6000.0) < 2000.0
    spec[band] = (rng.standard_normal(band.sum()) +
                  1j * rng.standard_normal(band.sum())).astype(np.complex64)
    z = np.fft.ifft(spec).astype(np.complex64)
    bw = float(sdr.spectrum_bw_hz(z, FS, 6000.0))
    assert 2000.0 < bw < 8000.0


def test_atan2_approx_max_error():
    """5th-order minimax in f32: max error ≲ 2e-3 rad over the circle."""
    th = np.linspace(-np.pi, np.pi, 10001).astype(np.float32)
    y, x = np.sin(th), np.cos(th)
    approx = np.asarray(sdr.atan2_approx(y, x))
    err = np.abs(((approx - th + np.pi) % (2 * np.pi)) - np.pi)
    assert float(err.max()) < 2e-3


def test_awgn_scale_and_determinism():
    rng1 = np.random.default_rng(5)
    rng2 = np.random.default_rng(5)
    a = sdr.awgn(rng1, 4096, 0.5)
    b = sdr.awgn(rng2, 4096, 0.5)
    assert np.array_equal(a, b)
    assert np.iscomplexobj(a)
    # total complex rms == scale (per-dim scale/√2 convention)
    assert float(np.sqrt(np.mean(np.abs(a) ** 2))) == pytest.approx(
        0.5, rel=0.05)
    r = sdr.awgn(rng1, 4096, 0.5, complex_=False)
    assert r.dtype == np.float32
    assert float(np.sqrt(np.mean(r ** 2))) == pytest.approx(0.5, rel=0.05)


def test_measure_reports_positive_rate():
    msps, dt = sdr.measure(lambda: np.fft.fft(np.ones(1 << 12)), 1 << 12,
                           repeats=2)
    assert msps > 0.0 and dt > 0.0


def test_spectrum_scan_finds_channels():
    """Three noise-like channels of known center/width/power: the scanner
    reports all three, strongest first, centers within an RBW and widths
    within 10%; empty band → no segments."""
    import orion_sdr_tpu as sdr
    fs = 8e6
    n = 1 << 19
    rng = np.random.default_rng(0)
    noise = 0.02 * (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                    ).astype(np.complex64)
    x = noise.copy()
    chans = ((-2.4e6, 0.9e6, 0.2), (0.2e6, 0.9e6, 0.1), (2.9e6, 0.3e6, 0.05))
    for fc, bw, amp in chans:
        m = int(bw / fs * n)
        spec = np.zeros(n, np.complex128)
        c0 = int((fc / fs) * n) % n
        idx = (np.arange(m) - m // 2 + c0) % n
        spec[idx] = rng.standard_normal(m) + 1j * rng.standard_normal(m)
        sig = np.fft.ifft(spec)
        sig *= amp / np.sqrt(np.mean(np.abs(sig) ** 2))
        x += sig.astype(np.complex64)

    segs = sdr.spectrum_scan(x, fs)
    assert len(segs) == 3
    rbw = fs / 4096
    for seg, (fc, bw, _) in zip(segs, chans):   # strongest-first == chans
        assert abs(seg.center_hz - fc) < rbw, (seg, fc)
        assert abs(seg.bw_hz - bw) < 0.1 * bw, (seg, bw)
        assert seg.snr_db > 10.0
    assert sdr.spectrum_scan(noise, fs) == []
    with pytest.raises(ValueError):
        sdr.spectrum_scan(np.zeros((2, 512), np.complex64), fs)
    with pytest.raises(ValueError):
        sdr.spectrum_scan(np.zeros(100, np.complex64), fs)
