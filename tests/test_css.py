"""Chirp spread spectrum (LoRa-style) PHY — beyond the reference (no
spread-spectrum modes). Dechirp+FFT demod, unknown offset, sub-noise
decode."""

import numpy as np
import pytest

from orion_sdr_tpu.modulate.css import css_mod, css_samples_per_symbol
from orion_sdr_tpu.demodulate.css import css_demod

MSG = b"hello chirp world"


@pytest.mark.parametrize("sf", [7, 9])
def test_css_roundtrip_unknown_offset(sf):
    iq = css_mod(MSG, sf=sf)
    buf = np.concatenate([np.zeros(777, np.complex64), iq,
                          np.zeros(500, np.complex64)])
    out = css_demod(buf, sf=sf)
    assert out is not None and out.crc_ok and out.payload == MSG


def test_css_below_noise_floor():
    """The spread-spectrum point: SF9 decodes at −5 dB IQ SNR (processing
    gain ≈ 10·log10(2^9) ≈ 27 dB)."""
    iq = css_mod(MSG, sf=9)
    ok = 0
    for seed in range(5):
        rng = np.random.default_rng(seed)
        z = np.concatenate([np.zeros(300, np.complex64), iq])
        z = z + ((rng.standard_normal(len(z))
                  + 1j * rng.standard_normal(len(z))).astype(np.complex64)
                 * np.sqrt(1.0 / 10 ** -0.5 / 2))       # −5 dB
        out = css_demod(z, sf=9)
        ok += bool(out and out.payload == MSG and out.crc_ok)
    assert ok == 5


def test_css_crc_guards_corruption():
    iq = css_mod(MSG, sf=7).copy()
    spsym = css_samples_per_symbol(7, 125_000.0, 125_000.0)
    # annihilate two payload symbols
    k = (8 + 2 + 3) * spsym
    iq[k:k + 2 * spsym] = 0
    out = css_demod(iq, sf=7)
    assert out is None or not out.crc_ok or out.payload == MSG


def test_css_validation_and_silence():
    with pytest.raises(ValueError):
        css_mod(b"x", sf=4)
    with pytest.raises(ValueError):
        css_mod(b"x", sf=7, fs=100_000.0)    # fs/bw·2^sf not integer
    assert css_demod(np.zeros(200_000, np.complex64), sf=7) is None
