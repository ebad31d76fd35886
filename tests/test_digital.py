"""Single-carrier digital tests (mirrors reference roundtrip/{bpsk,qpsk,qam}.rs)."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr
from orion_sdr_tpu import constellation as con
from orion_sdr_tpu.modulate.digital import digital_mod
from orion_sdr_tpu.demodulate.digital import digital_demod

FS = 48_000.0
ALL_ORDERS = ["bpsk", "qpsk", "qam16", "qam64", "qam256"]


def rand_bits(rng, n):
    return rng.integers(0, 2, n).astype(np.uint8)


class TestConstellation:
    @pytest.mark.parametrize("order", ALL_ORDERS)
    def test_map_decide_roundtrip(self, order):
        rng = np.random.default_rng(0)
        bps = con.BITS_PER_SYMBOL[order]
        bits = rand_bits(rng, 240 * bps)
        syms = con.map_bits(bits, order)
        out = np.asarray(con.decide(syms, order))
        np.testing.assert_array_equal(out, bits)

    @pytest.mark.parametrize("order", ALL_ORDERS)
    def test_unit_average_energy(self, order):
        # every constellation is normalized to unit average symbol energy
        pts = con.constellation_points(order)
        assert np.mean(np.abs(pts) ** 2) == pytest.approx(1.0, rel=1e-5)

    def test_qam16_gray_adjacency(self):
        # adjacent amplitude levels must differ in exactly one bit (Gray)
        lv = con._axis_table(4)
        order_idx = np.argsort(lv)
        for a, b in zip(order_idx[:-1], order_idx[1:]):
            assert bin(a ^ b).count("1") == 1

    @pytest.mark.parametrize("order", ALL_ORDERS)
    def test_soft_llr_signs_match_hard(self, order):
        rng = np.random.default_rng(1)
        bps = con.BITS_PER_SYMBOL[order]
        bits = rand_bits(rng, 64 * bps)
        syms = con.map_bits(bits, order)
        llr = np.asarray(con.soft_llr(syms, order))
        # positive LLR => bit 0
        hard = (llr < 0).astype(np.uint8)
        np.testing.assert_array_equal(hard, bits)

    def test_bpsk_llr_scale(self):
        syms = np.array([1.0 + 0j, -0.5 + 0j], np.complex64)
        llr = np.asarray(con.soft_llr(syms, "bpsk"))
        np.testing.assert_allclose(llr, [4.0, -2.0], atol=1e-6)


class TestPipeline:
    @pytest.mark.parametrize("order", ALL_ORDERS)
    def test_noiseless_roundtrip_baseband(self, order):
        rng = np.random.default_rng(2)
        bps = con.BITS_PER_SYMBOL[order]
        bits = rand_bits(rng, 120 * bps)
        iq, _ = digital_mod(bits, order, FS, 0.0, 1.0)
        out, _ = digital_demod(iq, order, FS, 0.0, 1.0)
        np.testing.assert_array_equal(np.asarray(out), bits)

    @pytest.mark.parametrize("order", ["qpsk", "qam64"])
    def test_noiseless_roundtrip_with_carrier(self, order):
        rng = np.random.default_rng(3)
        bps = con.BITS_PER_SYMBOL[order]
        bits = rand_bits(rng, 120 * bps)
        iq, _ = digital_mod(bits, order, FS, 12_000.0, 1.0)
        out, _ = digital_demod(iq, order, FS, 12_000.0, 1.0)
        np.testing.assert_array_equal(np.asarray(out), bits)

    def test_qam16_awgn_low_ber(self):
        rng = np.random.default_rng(4)
        bits = rand_bits(rng, 4 * 4096)
        iq, _ = digital_mod(bits, "qam16", FS, 0.0, 1.0)
        iq = np.asarray(iq) + sdr.awgn(rng, iq.shape, 0.05)
        out, _ = digital_demod(iq, "qam16", FS, 0.0, 1.0)
        ber = np.mean(np.asarray(out) != bits)
        assert ber < 1e-3, f"BER {ber}"

    def test_batched_channels(self):
        rng = np.random.default_rng(5)
        bits = rng.integers(0, 2, (8, 2 * 256)).astype(np.uint8)
        iq, _ = digital_mod(bits, "qpsk", FS)
        assert iq.shape == (8, 256)
        out, _ = digital_demod(iq, "qpsk", FS)
        np.testing.assert_array_equal(np.asarray(out), bits)


def test_estimate_cfo_mpsk_blind():
    """Blind M-power CFO estimation (beyond the reference, which assumes a
    known rf_hz): QPSK burst with 1234.5 Hz offset estimated within 2 Hz."""
    from orion_sdr_tpu.demodulate.digital import estimate_cfo_mpsk
    from orion_sdr_tpu.dsp.osc import rotate
    rng = np.random.default_rng(0)
    fs = 100_000.0
    bits = rng.integers(0, 2, 4096).astype(np.int64)
    sym = ((1 - 2 * bits[0::2]) + 1j * (1 - 2 * bits[1::2])) / np.sqrt(2)
    iq = np.repeat(sym, 8).astype(np.complex64)
    z = np.asarray(rotate(iq, 1234.5, fs)[0])
    z = z + 0.05 * (rng.standard_normal(len(z))
                    + 1j * rng.standard_normal(len(z))).astype(np.complex64)
    assert abs(estimate_cfo_mpsk(z, fs, 4) - 1234.5) < 2.0


def test_fde_equalize_deep_isi():
    """SC-FDE (beyond the reference — no single-carrier equalizer): a
    0.9-magnitude echo at 1 symbol gives ~18% raw QPSK BER; the MMSE
    frequency-domain equalizer recovers error-free bits."""
    from orion_sdr_tpu.demodulate.digital import fde_equalize
    rng = np.random.default_rng(0)
    n_sym = 8192
    bits = rng.integers(0, 2, 2 * n_sym).astype(np.int64)
    sym = ((1 - 2 * bits[0::2]) + 1j * (1 - 2 * bits[1::2])) / np.sqrt(2)
    x = sym.astype(np.complex64)

    def ber(rx, off):
        b0 = (rx.real < 0).astype(np.int64)
        b1 = (rx.imag < 0).astype(np.int64)
        got = np.empty(2 * len(rx), np.int64)
        got[0::2], got[1::2] = b0, b1
        return np.mean(got != bits[2 * off: 2 * off + len(got)])

    h = np.zeros(6, np.complex64)
    h[0], h[1], h[4] = 1.0, 0.9 * np.exp(1j * 2.1), 0.35 * np.exp(-1j * 0.7)
    y = np.convolve(x, h)[:len(x)].astype(np.complex64)
    y = y + 0.03 * (rng.standard_normal(len(y))
                    + 1j * rng.standard_normal(len(y))).astype(np.complex64)
    eq = fde_equalize(y, x[:512], block=256, noise_var=2e-3)
    assert ber(y[512:7000], 512) > 0.1          # the channel really bites
    assert ber(eq[512:7000], 512) < 0.001
    with pytest.raises(ValueError):
        fde_equalize(y, x[:4])


def test_burst_modem_qam_orders():
    """Single-carrier burst modem (beyond the reference): RRC shaping,
    polyphase-energy timing, CFO-tolerant segmented preamble search,
    data-aided phase-ramp fit, DD tracking — error-free through unknown
    delay + 0.21%-of-baud CFO + 1.1 rad phase + 34 dB SNR for every
    order."""
    from orion_sdr_tpu.modulate.digital import burst_mod, burst_preamble
    from orion_sdr_tpu.demodulate.digital import burst_demod
    from orion_sdr_tpu.dsp.osc import rotate
    rng = np.random.default_rng(0)
    sps = 8
    pre = burst_preamble(32)
    for order, nb in (("qpsk", 512), ("qam16", 1024), ("qam64", 1536),
                      ("qam256", 2048)):
        bits = rng.integers(0, 2, nb).astype(np.uint8)
        iq = burst_mod(bits, order, sps, preamble_syms=pre)
        z = np.concatenate([np.zeros(37, np.complex64), iq,
                            np.zeros(50, np.complex64)])
        z, _ = rotate(z, 0.0021 * sps, float(sps))
        z = np.asarray(z) * np.exp(1j * 1.1)
        z = z + 0.02 * (rng.standard_normal(len(z))
                        + 1j * rng.standard_normal(len(z))
                        ).astype(np.complex64)
        got, _ = burst_demod(z, order, sps, pre)
        n = min(len(got), len(bits))
        assert np.mean(got[:n] != bits[:n]) == 0.0, order
    with pytest.raises(ValueError):
        burst_demod(np.zeros(64, np.complex64), "qpsk", sps, pre)


def test_symbol_sync_gardner_tracks_offset():
    """The Gardner loop (for streaming use) locks a half-sample timing
    offset on a QPSK stream."""
    from orion_sdr_tpu.modulate.digital import burst_mod, burst_preamble
    from orion_sdr_tpu.demodulate.digital import symbol_sync_gardner
    rng = np.random.default_rng(1)
    sps = 8
    bits = rng.integers(0, 2, 2048).astype(np.uint8)
    iq = burst_mod(bits, "qpsk", sps)
    from orion_sdr_tpu.modulate.digital import rrc_taps
    from orion_sdr_tpu.dsp.fir import fir_filter_aligned
    import jax.numpy as jnp
    zf = np.asarray(fir_filter_aligned(jnp.asarray(iq), rrc_taps(sps)))
    syms, _ = symbol_sync_gardner(zf, sps + 0.0, len(zf) // sps - 10,
                                  mu0=3.0)   # off-peak but not the
                                             # metastable half-symbol point
    syms = np.asarray(syms)[200:]        # past acquisition
    # locked symbols cluster at the QPSK points (normalized stream)
    mags = np.abs(syms)
    assert float(np.std(mags)) < 0.25 * float(np.mean(mags))
