"""Analog + single-carrier digital permutation matrix — per-mode roundtrips
under noise, streaming chunk invariance, and RF-offset cases (mirrors the
reference's per-mode roundtrip files)."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr
from tests.helpers import tone_snr_db

FS = 48_000.0


def _tone(n, hz, amp=0.4):
    return (amp * np.sin(2 * np.pi * hz * np.arange(n) / FS)
            ).astype(np.float32)


def _awgn(rng, x, scale):
    if np.iscomplexobj(x):
        return x + (rng.standard_normal(len(x)) +
                    1j * rng.standard_normal(len(x))
                    ).astype(np.complex64) * scale
    return x + rng.standard_normal(len(x)).astype(np.float32) * scale


# ── analog modes under channel noise ─────────────────────────────────────────

@pytest.mark.parametrize("noise", [0.0, 0.02, 0.1])
def test_fm_roundtrip_noise(noise):
    audio = _tone(1 << 15, 1000.0)
    iq, _ = sdr.fm_mod(audio, FS, 5000.0)
    rx = _awgn(np.random.default_rng(1), np.asarray(iq), noise)
    out, _ = sdr.fm_demod(rx, FS, 5000.0, 3000.0)
    out = np.asarray(out)
    floor = 30.0 if noise == 0.0 else 15.0
    assert tone_snr_db(FS, 1000.0, out[4000:]) > floor


@pytest.mark.parametrize("noise", [0.0, 0.05])
def test_am_roundtrip_noise(noise):
    audio = _tone(1 << 15, 700.0)
    iq, _ = sdr.am_mod(audio, FS, carrier_level=1.0, modulation_index=0.8)
    rx = _awgn(np.random.default_rng(2), np.asarray(iq), noise)
    out, _ = sdr.am_demod(rx, FS, 3000.0)
    assert tone_snr_db(FS, 700.0, np.asarray(out)[4000:]) > 12.0


@pytest.mark.parametrize("usb", [True, False])
def test_ssb_sidebands(usb):
    """USB recovers the tone in place; LSB through the same product demod
    lands mirrored about the audio IF (2·if − f) — the BFO convention."""
    audio = _tone(1 << 15, 900.0)
    iq, _ = sdr.ssb_mod(audio, FS, 3000.0, 1500.0, usb=usb)
    out, _ = sdr.ssb_demod(np.asarray(iq), FS, 1500.0, 3000.0)
    expect = 900.0 if usb else 2 * 1500.0 - 900.0
    assert tone_snr_db(FS, expect, np.asarray(out)[4000:]) > 8.0


@pytest.mark.parametrize("noise", [0.0, 0.05])
def test_pm_roundtrip_noise(noise):
    audio = _tone(1 << 15, 600.0)
    iq, _ = sdr.pm_mod(audio, FS, 1.2)
    rx = _awgn(np.random.default_rng(3), np.asarray(iq), noise)
    out, _ = sdr.pm_demod(rx, FS, 1.2, 3000.0)
    assert tone_snr_db(FS, 600.0, np.asarray(out)[4000:]) > 12.0


def test_fm_stream_state_chunk_invariance():
    """The functional demod with carried state is chunk-boundary invariant
    (the Block wrapper relies on this)."""
    audio = _tone(1 << 14, 800.0)
    iq = np.asarray(sdr.fm_mod(audio, FS, 5000.0)[0])
    one, _ = sdr.fm_demod(iq, FS, 5000.0, 3000.0)
    state = None
    parts = []
    for c in np.array_split(iq, 5):
        y, state = sdr.fm_demod(c, FS, 5000.0, 3000.0, state=state)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(one),
                               atol=3e-5)


def test_fm_translate_offset_carrier():
    """FM at a translated carrier: demod with translate_hz recovers."""
    audio = _tone(1 << 15, 1000.0)
    iq, _ = sdr.fm_mod(audio, FS, 5000.0, rf_hz=8000.0)
    out, _ = sdr.fm_demod(np.asarray(iq), FS, 5000.0, 3000.0,
                          translate_hz=8000.0)
    assert tone_snr_db(FS, 1000.0, np.asarray(out)[4000:]) > 25.0


# ── single-carrier digital: orders × rf × noise BER ─────────────────────────

@pytest.mark.parametrize("order", ["bpsk", "qpsk", "qam16", "qam64",
                                   "qam256"])
@pytest.mark.parametrize("rf", [0.0, 6000.0])
def test_digital_noiseless_bit_exact_rf(order, rf):
    rng = np.random.default_rng(7)
    bps = sdr.BITS_PER_SYMBOL[order]
    bits = rng.integers(0, 2, 256 * bps).astype(np.uint8)
    iq, _ = sdr.digital_mod(bits, order, FS, rf_hz=rf)
    out, _ = sdr.digital_demod(np.asarray(iq), order, FS, rf_hz=rf)
    assert np.array_equal(np.asarray(out)[:len(bits)], bits)


@pytest.mark.parametrize("order,noise,max_ber", [
    ("bpsk", 0.3, 1e-3), ("qpsk", 0.2, 1e-3), ("qam16", 0.08, 1e-2)])
def test_digital_noise_ber(order, noise, max_ber):
    rng = np.random.default_rng(8)
    bps = sdr.BITS_PER_SYMBOL[order]
    bits = rng.integers(0, 2, 4096 * bps).astype(np.uint8)
    iq, _ = sdr.digital_mod(bits, order, FS)
    rx = _awgn(rng, np.asarray(iq), noise)
    out, _ = sdr.digital_demod(rx, order, FS)
    ber = np.mean(np.asarray(out)[:len(bits)] != bits)
    assert ber <= max_ber, f"{order} BER {ber}"


def test_soft_llr_magnitude_orders_with_distance():
    """LLR magnitude grows with distance from the decision boundary."""
    far = np.asarray(sdr.soft_llr(np.array([2.0 + 0j]), "bpsk"))
    near = np.asarray(sdr.soft_llr(np.array([0.1 + 0j]), "bpsk"))
    assert abs(far[0]) > abs(near[0]) > 0
