"""Blind modulation classification (beyond the reference): the full mode
matrix through classify_signal, and scan→classify over a mixed band."""

import numpy as np
import pytest

import orion_sdr_tpu as o
from orion_sdr_tpu.classify import classify_signal, band_survey
from orion_sdr_tpu.dsp.osc import rotate

FS = 48_000.0
N = 1 << 16


def _cls(z, fs=FS):
    return classify_signal(
        np.ascontiguousarray(np.asarray(z), dtype=np.complex64), fs)


def test_classify_mode_matrix():
    rng = np.random.default_rng(0)
    t = np.arange(N) / FS
    key = (np.sin(2 * np.pi * 3.0 * t) > 0).astype(np.float32)
    cases = {
        "cw": (o.cw_mod(key, FS, 600.0)[0], FS),
        "am": (o.am_mod((0.6 * np.sin(2 * np.pi * 1000 * t)
                         ).astype(np.float32), FS)[0], FS),
        "ssb": (o.ssb_mod((0.5 * np.sin(2 * np.pi * 800 * t)
                           + 0.4 * np.sin(2 * np.pi * 1900 * t)
                           ).astype(np.float32), FS, 2800.0, 1500.0)[0], FS),
        "fm": (o.fm_mod((0.5 * np.sin(2 * np.pi * 1000 * t)
                         ).astype(np.float32), FS, 5000.0)[0], FS),
        "psk31": (o.bpsk31_mod_bits(
            rng.integers(0, 2, 256).astype(np.uint8), 8000.0)[0], 8000.0),
        "fsk": (o.pocsag_mod([o.PocsagPage(address=0x123, function=3,
                                           text="HELLO WORLD PAGE")],
                             38400.0), 38400.0),
        "noise": ((rng.standard_normal(N) + 1j * rng.standard_normal(N)
                   ).astype(np.complex64) * 0.1, FS),
    }
    t2 = np.arange(1 << 17) / 240e3
    cases["fm_stereo"] = (o.fm_stereo_mod(
        (0.8 * np.sin(2 * np.pi * 1000 * t2)).astype(np.float32),
        (0.8 * np.sin(2 * np.pi * 2500 * t2)).astype(np.float32),
        240e3)[0], 240e3)
    params = o.DvbTFrameParams(o.DvbTLinkParams("1/8", "qpsk", "1/2"))
    frame = o.DvbTFrameMod(params).modulate(
        rng.integers(0, 256, 300).astype(np.uint8))
    cases["ofdm"] = (frame.iq[:1 << 17], 1142857.0)

    for want, (z, fs) in cases.items():
        got = _cls(z, fs)
        assert got.label == want, (want, got.label, got.features)


def test_classify_validation():
    with pytest.raises(ValueError):
        classify_signal(np.zeros(100, np.complex64), FS)
    silent = classify_signal(np.zeros(8192, np.complex64), FS)
    assert silent.label == "noise"


def test_band_survey_mixed_band():
    """Scan-then-classify: AM + FM + POCSAG at known centers in one
    capture; leakage skirts are gated out by relative power."""
    rng = np.random.default_rng(0)
    fs = 1_000_000.0
    n = 1 << 19
    t = np.arange(n) / fs

    def at(z, c):
        return np.asarray(rotate(np.ascontiguousarray(
            np.asarray(z)[:n], np.complex64), c, fs)[0])

    band = (at(o.am_mod((0.6 * np.sin(2 * np.pi * 1000 * t)
                         ).astype(np.float32), fs)[0], -300e3)
            + at(o.fm_mod((0.5 * np.sin(2 * np.pi * 1000 * t)
                           ).astype(np.float32), fs, 5000.0)[0], -100e3)
            + 0.7 * at(o.pocsag_mod(
                [o.PocsagPage(address=0x123, function=3,
                              text="HELLO WORLD PAGE FILLER TEXT HERE")] * 6,
                fs), 150e3)).astype(np.complex64)
    band = band + (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                   ).astype(np.complex64) * 0.004
    entries = band_survey(band, fs)
    got = {round(e.segment.center_hz / 1e3): e.signal.label for e in entries}
    assert got.get(-300) == "am"
    assert got.get(-100) == "fm"
    assert got.get(150) == "fsk"
    assert len(entries) == 3          # no leakage litter


def test_band_decode_dispatches_receivers():
    """The capstone: one call decodes AM audio, POCSAG text, and PSK31
    text from a blind wideband capture."""
    from orion_sdr_tpu.classify import band_decode
    rng = np.random.default_rng(0)
    fs = 500_000.0
    n = 1 << 19
    t = np.arange(n) / fs

    def at(z, c, g=1.0):
        zz = np.ascontiguousarray(np.asarray(z)[:n], np.complex64)
        if len(zz) < n:
            zz = np.concatenate([zz, np.zeros(n - len(zz), np.complex64)])
        return g * np.asarray(rotate(zz, c, fs)[0])

    am = o.am_mod((0.6 * np.sin(2 * np.pi * 800 * t)).astype(np.float32),
                  fs)[0]
    pg = o.pocsag_mod([o.PocsagPage(address=0x123, function=3,
                                    text="PAGE ME NOW")] * 4, fs)
    band = (at(am, -150e3) + at(pg, 100e3, 0.8)).astype(np.complex64)
    band = band + (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                   ).astype(np.complex64) * 0.004
    entries = {round(e.segment.center_hz / 1e3): e
               for e in band_decode(band, fs)}
    assert entries[-150].signal.label == "am"
    audio = entries[-150].audio
    assert audio is not None
    spec = np.abs(np.fft.rfft(audio[2000:] * np.hanning(len(audio) - 2000)))
    f = np.fft.rfftfreq(len(audio) - 2000, 1 / entries[-150].fs_audio)
    assert abs(f[np.argmax(spec[5:]) + 5] - 800.0) < 10.0
    assert entries[100].signal.label == "fsk"
    assert entries[100].text == "PAGE ME NOW"


def test_capture_file_io_roundtrip(tmp_path):
    """WAV/NPZ capture IO: an FM stereo signal written as an IQ WAV reads
    back and still decodes its RDS text."""
    from orion_sdr_tpu import io as sio
    rng = np.random.default_rng(0)
    z = ((rng.standard_normal(5000) + 1j * rng.standard_normal(5000)) * 0.3
         ).astype(np.complex64)
    p = str(tmp_path / "cap.wav")
    sio.write_iq_wav(p, z, 48000.0)
    back, fs = sio.read_iq_wav(p)
    assert fs == 48000.0 and back.shape == z.shape
    scale = np.vdot(back, z).real / np.vdot(back, back).real
    assert np.max(np.abs(back * scale - z)) < 2e-3      # 16-bit quantization

    p2 = str(tmp_path / "cap.npz")
    sio.write_iq_npy(p2, z, 96000.0)
    z2, fs2 = sio.read_iq_npy(p2)
    assert fs2 == 96000.0
    np.testing.assert_array_equal(z2, z)

    audio = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000.0)
             ).astype(np.float32)
    p3 = str(tmp_path / "a.wav")
    sio.write_audio_wav(p3, audio, 8000.0)
    a2, afs = sio.read_audio_wav(p3)
    assert afs == 8000.0
    corr = np.dot(a2, audio) / np.sqrt(np.dot(a2, a2) * np.dot(audio, audio))
    assert corr > 0.9999

    # end-to-end through a mode: RDS text survives the 16-bit WAV
    bits = R_bits()
    iq = np.asarray(o.fm_stereo_mod(
        (0.5 * np.sin(2 * np.pi * 1000 * np.arange(1 << 18) / 240e3)
         ).astype(np.float32),
        (0.5 * np.sin(2 * np.pi * 2500 * np.arange(1 << 18) / 240e3)
         ).astype(np.float32), 240e3, rds_bits=bits)[0])
    p4 = str(tmp_path / "fm.wav")
    sio.write_iq_wav(p4, iq, 240000.0)
    ziq, zfs = sio.read_iq_wav(p4)
    out = o.fm_stereo_demod(ziq, zfs, decode_rds=True)
    assert out.rds.ps_name == "ORIONFM "


def R_bits():
    from orion_sdr_tpu.codec import rds as R
    return R.rds_encode_groups(R.rds_groups_0a(0x52A1, ps_name="ORIONFM "))


def test_band_decode_rtty_rf_fsk():
    """HF-style RTTY (RF frequency-shift, 170 Hz) found blind: classified
    fsk, POCSAG attempt fails, the RTTY fallback decodes the text."""
    from orion_sdr_tpu import dsp, band_decode
    from orion_sdr_tpu.codec.rtty import baudot_encode, rtty_frame_bits
    rng = np.random.default_rng(0)
    fsr = 8000.0
    line = rtty_frame_bits(baudot_encode("CQ DE ORION SDR 599"))
    sps = fsr / 45.45
    n = int(len(line) * sps)
    k = np.minimum((np.arange(n) / sps).astype(int), len(line) - 1)
    iq = np.exp(1j * np.cumsum(
        2 * np.pi * np.where(line[k] == 1, -85.0, 85.0) / fsr)
        ).astype(np.complex64)
    fs_w = 256_000.0
    wide = dsp.band_compose(iq[None], [60e3], fs_w, fsr)
    wide = wide + (rng.standard_normal(len(wide))
                   + 1j * rng.standard_normal(len(wide))
                   ).astype(np.complex64) * 0.003
    entries = band_decode(wide, fs_w)
    assert len(entries) == 1
    assert entries[0].signal.label == "fsk"
    assert entries[0].text == "CQ DE ORION SDR 599"


def test_band_decode_ssb_audio():
    """Blind SSB: audio recovered with tone RELATIONS exact (absolute
    pitch carries the blind dial estimate's error — inherent to SSB)."""
    from orion_sdr_tpu import band_decode
    fs = 500_000.0
    n = 1 << 19
    t = np.arange(n) / fs
    ssb = o.ssb_mod((0.5 * np.sin(2 * np.pi * 800 * t)
                     + 0.4 * np.sin(2 * np.pi * 1900 * t)
                     ).astype(np.float32), fs, 2800.0, 1500.0)[0]
    band = np.asarray(rotate(np.ascontiguousarray(
        np.asarray(ssb), np.complex64), -120e3, fs)[0])
    rng = np.random.default_rng(0)
    band = band + (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                   ).astype(np.complex64) * 0.002
    entries = band_decode(band, fs)
    assert len(entries) == 1 and entries[0].signal.label == "ssb"
    audio = entries[0].audio
    assert audio is not None
    seg = audio[2000:]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1 / entries[0].fs_audio)
    p1 = int(np.argmax(spec))
    guard = spec.copy()
    guard[max(p1 - 5, 0):p1 + 6] = 0.0    # adjacent leakage of peak 1
    p2 = int(np.argmax(guard))
    spacing = abs(f[p2] - f[p1])
    assert abs(spacing - 1100.0) < 20.0    # 1900−800 preserved


def test_band_decode_cw_morse_text():
    """CW station found blind, classified by its keyed-carrier envelope,
    text decoded by morse_decode."""
    from orion_sdr_tpu import band_decode
    fs = 250_000.0
    n = 1 << 20
    env = np.asarray(o.MorseEncoder(fs, 30.0).encode_text("CQ TEST K"),
                     np.float32)
    env = np.pad(env, (0, max(0, n - len(env))))[:n]
    cw, _ = o.cw_mod(env, fs, 0.0)
    z = np.asarray(rotate(np.ascontiguousarray(np.asarray(cw), np.complex64),
                          80e3, fs)[0])
    rng = np.random.default_rng(1)
    z = z + (rng.standard_normal(n) + 1j * rng.standard_normal(n)
             ).astype(np.complex64) * 0.01
    entries = band_decode(z, fs)
    assert len(entries) == 1 and entries[0].signal.label == "cw"
    assert entries[0].text == "CQ TEST K"
