"""OTFS delay-Doppler waveform tests (the second member of the reference's
planned multicarrier family — unimplemented there, so the diversity claims
are qualified against this framework's own OFDM)."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr
from orion_sdr_tpu.multicarrier import CarrierPlan
from orion_sdr_tpu.ofdm import OfdmConfig, ofdm_mod, ofdm_demod, ofdm_decide
from orion_sdr_tpu.otfs import (isfft, sfft, otfs_mod, otfs_demod,
                                otfs_num_symbols)

FS = 1e6


def make_cfg(order="qpsk", n_fft=64, cp=16, **kw):
    plan = CarrierPlan(n_fft, cp).with_contiguous_data()
    return OfdmConfig(plan, FS, constellation=order, **kw)


def test_sfft_unitary_inverse():
    rng = np.random.default_rng(0)
    z = (rng.standard_normal((3, 8, 24)) +
         1j * rng.standard_normal((3, 8, 24))).astype(np.complex64)
    tf = np.asarray(isfft(z))
    np.testing.assert_allclose(np.mean(np.abs(tf) ** 2),
                               np.mean(np.abs(z) ** 2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sfft(tf)), z, atol=1e-5)


@pytest.mark.parametrize("order", ["bpsk", "qpsk", "qam16"])
def test_roundtrip_bit_exact(order):
    rng = np.random.default_rng(1)
    cfg = make_cfg(order)
    n_dopp = 8
    bits = rng.integers(0, 2, cfg.bits_per_ofdm_symbol() * 2 * n_dopp
                        ).astype(np.uint8)
    assert otfs_num_symbols(cfg, len(bits), n_dopp) == 2 * n_dopp
    iq, _ = otfs_mod(cfg, bits, n_dopp)
    dd, _ = otfs_demod(cfg, iq, n_dopp)
    np.testing.assert_array_equal(np.asarray(ofdm_decide(cfg, dd)), bits)


def test_rf_carrier_and_static_multipath():
    rng = np.random.default_rng(2)
    cfg = make_cfg("qpsk", rf_hz=5000.0)
    n_dopp = 4
    bits = rng.integers(0, 2, cfg.bits_per_ofdm_symbol() * n_dopp
                        ).astype(np.uint8)
    iq = np.asarray(otfs_mod(cfg, bits, n_dopp)[0])
    chan = np.array([1.0, 0.3 * np.exp(1j * 0.5)], np.complex64)
    rx = np.convolve(iq, chan)[:len(iq)]
    est = np.fft.fft(chan, 64).astype(np.complex64)
    dd, _ = otfs_demod(cfg, rx, n_dopp, estimate=est)
    np.testing.assert_array_equal(np.asarray(ofdm_decide(cfg, dd)), bits)


def test_frequency_diversity_vs_ofdm():
    """A near-null 2-tap channel wipes out the carriers at the notch: plain
    OFDM loses those columns outright (MMSE shrinks them to zero), while
    the OTFS SFFT spreads every symbol across all carriers so the frame
    decodes with a fraction of the errors."""
    rng = np.random.default_rng(3)
    cfg = make_cfg("qpsk")
    n_dopp = 16
    bits = rng.integers(0, 2, cfg.bits_per_ofdm_symbol() * n_dopp
                        ).astype(np.uint8)
    chan = np.array([1.0, -0.98], np.complex64)   # deep notch at DC edge
    est = np.fft.fft(chan, 64).astype(np.complex64)
    sigma = 0.02
    nv = 64 * 2 * sigma ** 2   # per-bin: unity-gain FFT scales σ²ₜ by n_fft

    def run(mod_fn, demod_fn):
        iq = np.asarray(mod_fn(cfg, bits)[0])
        rx = np.convolve(iq, chan)[:len(iq)]
        rx = rx + (rng.standard_normal(len(rx)) +
                   1j * rng.standard_normal(len(rx))
                   ).astype(np.complex64) * sigma
        soft = demod_fn(cfg, rx)
        out = np.asarray(ofdm_decide(cfg, soft))
        return float(np.mean(out != bits))

    from orion_sdr_tpu.ofdm import mmse_equalize
    from orion_sdr_tpu.multicarrier import symbol_fft, grid_extract

    def ofdm_rx(cfg, rx):
        g = cfg.grid()
        freq = symbol_fft(rx, g.n_fft, g.cp_len, n_symbols=n_dopp)
        return grid_extract(g, mmse_equalize(freq, est, nv))

    ber_ofdm = run(lambda c, b: ofdm_mod(c, b),
                   lambda c, rx: ofdm_rx(c, rx))
    ber_otfs = run(lambda c, b: otfs_mod(c, b, n_dopp),
                   lambda c, rx: otfs_demod(c, rx, n_dopp, estimate=est,
                                            noise_var=nv)[0])
    print(f"\nnotch channel BER: OFDM {ber_ofdm:.4f} vs OTFS {ber_otfs:.4f}")
    assert ber_ofdm > 0.01           # the notch really bites
    assert ber_otfs < 0.3 * ber_ofdm


def test_time_diversity_vs_ofdm():
    """Two of 16 symbols hit a deep time-selective fade (amplitude 0.03).
    With a per-symbol MMSE equalizer plain OFDM loses those symbols' bits
    to noise; OTFS's Doppler-axis spreading recovers the whole frame."""
    rng = np.random.default_rng(4)
    cfg = make_cfg("qpsk")
    n_dopp = 16
    n_fft, cp = 64, 16
    sps = n_fft + cp
    bits = rng.integers(0, 2, cfg.bits_per_ofdm_symbol() * n_dopp
                        ).astype(np.uint8)
    gains = np.ones(n_dopp, np.float32)
    gains[[5, 11]] = 0.03
    sigma = 0.02
    nv = n_fft * 2 * sigma ** 2   # per-bin (unity-gain FFT)
    # per-symbol flat estimate (n_sym, n_fft)
    est = np.repeat(gains[:, None], n_fft, axis=1).astype(np.complex64)

    def channel(iq):
        g_t = np.repeat(gains, sps).astype(np.float32)
        rx = iq[:n_dopp * sps] * g_t
        return rx + (rng.standard_normal(len(rx)) +
                     1j * rng.standard_normal(len(rx))
                     ).astype(np.complex64) * sigma

    from orion_sdr_tpu.ofdm import mmse_equalize
    from orion_sdr_tpu.multicarrier import symbol_fft, grid_extract

    iq = np.asarray(ofdm_mod(cfg, bits)[0])
    g = cfg.grid()
    freq = symbol_fft(channel(iq), n_fft, cp, n_symbols=n_dopp)
    soft = grid_extract(g, mmse_equalize(freq, est, nv))
    ber_ofdm = float(np.mean(np.asarray(ofdm_decide(cfg, soft)) != bits))

    iq = np.asarray(otfs_mod(cfg, bits, n_dopp)[0])
    dd, _ = otfs_demod(cfg, channel(iq), n_dopp, estimate=est, noise_var=nv)
    ber_otfs = float(np.mean(np.asarray(ofdm_decide(cfg, dd)) != bits))
    print(f"\ntime-fade BER: OFDM {ber_ofdm:.4f} vs OTFS {ber_otfs:.4f}")
    assert ber_ofdm > 0.02           # the fade really bites
    assert ber_otfs < 0.3 * ber_ofdm
