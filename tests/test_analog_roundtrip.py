"""Analog mode roundtrips (mirrors reference tests/roundtrip/{cw,am,ssb,fm,pm}.rs)."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr
from orion_sdr_tpu import modulate as mod
from orion_sdr_tpu import demodulate as dem

from helpers import tone_snr_db, tail

FS = 48_000.0


def real_tone(fs, f_hz, n, amp):
    return (amp * np.sin(2 * np.pi * f_hz * np.arange(n) / fs)).astype(np.float32)


class TestFm:
    def test_roundtrip_fm_quadrature(self):
        n = 32_768
        audio_in = real_tone(FS, 1000.0, n, 0.5)
        iq, _ = mod.fm_mod(audio_in, FS, 2500.0)
        audio_out, _ = dem.fm_demod(iq, FS, 2500.0, 5000.0)
        snr = tone_snr_db(FS, 1000.0, tail(np.asarray(audio_out), 0.75))
        assert snr > 20.0, f"FM roundtrip SNR too low: {snr:.1f} dB"

    def test_fm_with_translate(self):
        n = 32_768
        audio_in = real_tone(FS, 800.0, n, 0.5)
        iq, _ = mod.fm_mod(audio_in, FS, 2500.0, rf_hz=9000.0)
        audio_out, _ = dem.fm_demod(iq, FS, 2500.0, 5000.0, translate_hz=9000.0)
        snr = tone_snr_db(FS, 800.0, tail(np.asarray(audio_out), 0.75))
        assert snr > 20.0, f"FM+translate SNR too low: {snr:.1f} dB"

    def test_fm_streaming_equals_batch(self):
        n = 8192
        audio_in = real_tone(FS, 1000.0, n, 0.5)
        iq_full, _ = mod.fm_mod(audio_in, FS, 2500.0)
        a, st = mod.fm_mod(audio_in[:3000], FS, 2500.0)
        b, _ = mod.fm_mod(audio_in[3000:], FS, 2500.0, state=st)
        np.testing.assert_allclose(
            np.concatenate([a, b]), np.asarray(iq_full), atol=2e-3)


class TestAm:
    def test_roundtrip_am_envelope(self):
        n = 32_768
        audio_in = real_tone(FS, 1000.0, n, 0.5)
        iq, _ = mod.am_mod(audio_in, FS, 0.0, carrier_level=0.8, modulation_index=0.5)
        audio_out, _ = dem.am_demod(iq, FS, 5000.0)
        snr = tone_snr_db(FS, 1000.0, tail(np.asarray(audio_out)))
        assert snr > 24.0, f"AM roundtrip SNR too low: {snr:.1f} dB"

    def test_roundtrip_am_abs_approx(self):
        n = 32_768
        audio_in = real_tone(FS, 1000.0, n, 0.5)
        iq, _ = mod.am_mod(audio_in, FS, 0.0, carrier_level=0.8, modulation_index=0.5)
        audio_out, _ = dem.am_demod(iq, FS, 5000.0, method="abs_approx")
        snr = tone_snr_db(FS, 1000.0, tail(np.asarray(audio_out)))
        assert snr > 15.0, f"AM abs-approx SNR too low: {snr:.1f} dB"


class TestSsb:
    def test_roundtrip_ssb_usb_product(self):
        n = 32_768
        f_audio = 1200.0
        audio_in = real_tone(FS, f_audio, n, 0.4)
        iq, _ = mod.ssb_mod(audio_in, FS, 2800.0, 1500.0, 0.0, usb=True)
        audio_out, _ = dem.ssb_demod(iq, FS, 1500.0, 2800.0)
        s = np.asarray(audio_out)[int(0.120 * FS):]
        snr = tone_snr_db(FS, f_audio, s)
        assert snr > 18.0, f"SSB roundtrip SNR too low: {snr:.1f} dB"

    def test_ssb_suppresses_opposite_sideband(self):
        # USB-modulated audio must have little energy below the carrier.
        n = 32_768
        audio_in = real_tone(FS, 1000.0, n, 0.5)
        iq, _ = mod.ssb_mod(audio_in, FS, 2800.0, 1500.0, 0.0, usb=True)
        iq = np.asarray(iq)[4096:]
        # signal sits at audio_if + f = 2500 Hz; image would be at -2500+... i.e. 500 Hz below IF
        spec = np.fft.fft(iq * np.hanning(len(iq)))
        freqs = np.fft.fftfreq(len(iq), 1 / FS)
        p_usb = np.abs(spec[np.argmin(np.abs(freqs - 2500.0))])
        p_lsb = np.abs(spec[np.argmin(np.abs(freqs + 2500.0))])
        assert 20 * np.log10(p_usb / (p_lsb + 1e-12)) > 30.0


class TestPm:
    def test_roundtrip_pm(self):
        n = 32_768
        audio_in = real_tone(FS, 1000.0, n, 0.5)
        iq, _ = mod.pm_mod(audio_in, FS, 1.0)
        audio_out, _ = dem.pm_demod(iq, FS, 1.0, 5000.0)
        # quadrature PM detector outputs d/dt of message — still a 1 kHz tone
        snr = tone_snr_db(FS, 1000.0, tail(np.asarray(audio_out)))
        assert snr > 20.0, f"PM roundtrip SNR too low: {snr:.1f} dB"


class TestCw:
    def test_roundtrip_cw_envelope(self):
        n = 24_000
        key_f = 5.0
        key_env = ((np.arange(n) * key_f / FS) % 1.0 < 0.5).astype(np.float32)
        iq, _ = mod.cw_mod(key_env, FS, 700.0, 3.0, 3.0)
        audio, _ = dem.cw_demod(iq, FS, 300.0)
        skip = int(0.100 * FS)
        a = np.asarray(audio)[skip:]
        k = key_env[skip:]
        on_rms = sdr.rms(a[k > 0.5])
        off_rms = sdr.rms(a[k <= 0.5])
        contrast_db = 20 * np.log10(on_rms / (off_rms + 1e-12))
        assert contrast_db > 14.0, f"CW contrast too low: {contrast_db:.1f} dB"
