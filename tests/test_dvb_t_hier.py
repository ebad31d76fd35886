"""Hierarchical DVB-T (EN 300 744 §4.3.5/§5.1) — beyond the reference,
which implements only the non-hierarchical Figure-9a path
(waveform/dvb_t.rs:112-268). Non-uniform constellations, TPS hierarchy
signalling, dual-stream frame roundtrips, and the graceful-degradation
contract (HP survives noise that kills LP)."""

import numpy as np
import pytest

from orion_sdr_tpu.waveform.dvb_t import (
    DVB_T_ALPHAS, DvbTHierLinkParams, DvbTHierFrameParams,
    dvb_t_axis, axis_scale, dvb_t_map_symbols, dvb_t_demap_symbols,
    dvb_t_soft_llrs,
)
from orion_sdr_tpu.waveform.dvb_t_tps import TpsWord
from orion_sdr_tpu.modulate.dvb_t_frame import DvbTHierFrameMod
from orion_sdr_tpu.demodulate.dvb_t_frame import DvbTHierFrameDemod


def _payload(n, seed):
    return np.random.default_rng(seed).integers(0, 256, n).astype(np.uint8)


def _awgn(iq, snr_db, seed):
    rng = np.random.default_rng(seed)
    sig_p = float(np.mean(np.abs(iq) ** 2))
    sigma = np.sqrt(sig_p / 10 ** (snr_db / 10) / 2)
    return iq + ((rng.standard_normal(len(iq)) +
                  1j * rng.standard_normal(len(iq)))
                 .astype(np.complex64) * sigma)


# ── non-uniform constellation known answers (spec Figures 9b/9c) ─────────────

def test_nonuniform_axis_tables_and_scales():
    # 16-QAM: axis magnitudes {α, α+2}; normalization 1/√20 (α=2), 1/√52 (α=4)
    assert np.array_equal(dvb_t_axis(4, 2), np.float32([4, 2, -4, -2]))
    assert np.array_equal(dvb_t_axis(4, 4), np.float32([6, 4, -6, -4]))
    assert axis_scale(4, 2) == pytest.approx(1 / np.sqrt(20))
    assert axis_scale(4, 4) == pytest.approx(1 / np.sqrt(52))
    # 64-QAM: magnitudes {α, α+2, α+4, α+6}; 1/√60 (α=2), 1/√108 (α=4)
    assert np.array_equal(dvb_t_axis(6, 2),
                          np.float32([8, 6, 2, 4, -8, -6, -2, -4]))
    assert axis_scale(6, 2) == pytest.approx(1 / np.sqrt(60))
    assert axis_scale(6, 4) == pytest.approx(1 / np.sqrt(108))
    # α = 1 reproduces the uniform grid exactly
    assert np.array_equal(dvb_t_axis(4, 1), np.float32([3, 1, -3, -1]))
    assert axis_scale(4, 1) == pytest.approx(axis_scale(4))


def test_nonuniform_alpha_validation():
    with pytest.raises(ValueError):
        dvb_t_axis(4, 3)
    with pytest.raises(ValueError):
        dvb_t_axis(2, 2)          # no hierarchical QPSK
    with pytest.raises(ValueError):
        DvbTHierLinkParams(constellation="qpsk", alpha=2).validate()
    with pytest.raises(ValueError):
        DvbTHierLinkParams(constellation="qam16", alpha=3).validate()


@pytest.mark.parametrize("v", [4, 6])
@pytest.mark.parametrize("alpha", DVB_T_ALPHAS)
def test_nonuniform_map_demap_llr_exhaustive(v, alpha):
    labels = np.arange(1 << v)
    bits = ((labels[:, None] >> np.arange(v - 1, -1, -1)) & 1
            ).astype(np.uint8).reshape(-1)
    syms = dvb_t_map_symbols(bits, v, alpha)
    # unit mean symbol energy
    assert float(np.mean(np.abs(np.asarray(syms)) ** 2)) == pytest.approx(
        1.0, rel=1e-5)
    assert np.array_equal(
        np.asarray(dvb_t_demap_symbols(syms, v, alpha)).reshape(-1), bits)
    llr = np.asarray(dvb_t_soft_llrs(syms, v, alpha)).reshape(-1)
    assert np.array_equal((llr < 0).astype(np.uint8), bits)


def test_nonuniform_quadrants_separate_with_alpha():
    """Raising α must widen the quadrant (HP) minimum distance and shrink
    the intra-cluster (LP) spacing — the protection trade hierarchy makes."""
    def dists(alpha):
        t = dvb_t_axis(6, alpha) * axis_scale(6, alpha)
        pos = np.sort(t[t > 0])
        return 2 * pos[0], pos[1] - pos[0]     # quadrant gap, LP spacing
    q1, l1 = dists(1)
    q2, l2 = dists(2)
    q4, l4 = dists(4)
    assert q1 < q2 < q4
    assert l1 > l2 > l4


# ── TPS hierarchy signalling (§4.6.2.5) ──────────────────────────────────────

def test_tps_hierarchy_word_roundtrip():
    w = TpsWord(frame_number=3, constellation="qam64", code_rate_hp="1/2",
                guard="1/4", cell_id=0xAB, hierarchy=4, code_rate_lp="7/8")
    assert TpsWord.unpack(w.pack()) == w
    # α = 1 (hierarchy by multiplexing on the uniform grid) is distinct
    # from non-hierarchical on the wire
    w1 = TpsWord(constellation="qam16", hierarchy=1, code_rate_lp="2/3")
    got = TpsWord.unpack(w1.pack())
    assert got.hierarchy == 1 and got.code_rate_lp == "2/3"


def test_tps_non_hierarchical_wire_compat():
    """Default words keep the reference's exact packing: hierarchy bits 000,
    LP rate mirroring HP, and the roundtrip restores code_rate_lp=None."""
    w = TpsWord(frame_number=2, constellation="qam16", code_rate_hp="2/3",
                guard="1/16", cell_id=9)
    bits = w.pack()
    assert np.array_equal(bits[1 + 26:1 + 29], [0, 0, 0])        # s26..s28
    assert np.array_equal(bits[1 + 29:1 + 32], bits[1 + 32:1 + 35])
    got = TpsWord.unpack(bits)
    assert got == w and got.hierarchy == 0 and got.code_rate_lp is None


# ── dual-stream frame roundtrips ─────────────────────────────────────────────

def test_hier_frame_roundtrip_unknown_offset():
    link = DvbTHierLinkParams(guard="1/8", constellation="qam16", alpha=2,
                              code_rate_hp="1/2", code_rate_lp="3/4")
    params = DvbTHierFrameParams(link=link, frame_number=1, cell_id=0x42)
    hp, lp = _payload(400, 0), _payload(1200, 1)
    frame = DvbTHierFrameMod(params).modulate(hp, lp)
    buf = np.concatenate([np.zeros(913, np.complex64), frame.iq,
                          np.zeros(500, np.complex64)])
    rx = DvbTHierFrameDemod(params).decode(buf, frame.n_symbols,
                                           len(hp), len(lp))
    assert np.array_equal(rx.hp_payload, hp)
    assert rx.lp_payload is not None and np.array_equal(rx.lp_payload, lp)
    assert rx.tps.hierarchy == 2 and rx.tps.code_rate_lp == "3/4"
    assert rx.tps.constellation == "qam16" and rx.tps.cell_id == 0x42


def test_hier_frame_qam64_alpha1_multiplexing_only():
    """α = 1: uniform grid, hierarchy purely by stream multiplexing."""
    link = DvbTHierLinkParams(guard="1/32", constellation="qam64", alpha=1,
                              code_rate_hp="2/3", code_rate_lp="2/3")
    params = DvbTHierFrameParams(link=link)
    hp, lp = _payload(300, 2), _payload(900, 3)
    frame = DvbTHierFrameMod(params).modulate(hp, lp)
    rx = DvbTHierFrameDemod(params).decode(frame.iq, frame.n_symbols,
                                           len(hp), len(lp))
    assert np.array_equal(rx.hp_payload, hp)
    assert np.array_equal(rx.lp_payload, lp)


def test_hier_graceful_degradation():
    """The contract hierarchy exists for: at mid SNR the embedded-QPSK HP
    stream decodes while the LP stream's FEC fails — the receiver reports
    the HP payload with lp_payload=None instead of failing the frame.
    (Measured thresholds for qam64 α=4 HP r1/2 / LP r2/3: both decode at
    22 dB; LP fails from ~20 dB down; HP holds to ~5 dB.)"""
    link = DvbTHierLinkParams(guard="1/32", constellation="qam64", alpha=4,
                              code_rate_hp="1/2", code_rate_lp="2/3")
    params = DvbTHierFrameParams(link=link)
    hp, lp = _payload(400, 4), _payload(800, 5)
    frame = DvbTHierFrameMod(params).modulate(hp, lp)
    dem = DvbTHierFrameDemod(params)

    rx = dem.decode(_awgn(frame.iq, 24.0, 42), frame.n_symbols,
                    len(hp), len(lp))
    assert np.array_equal(rx.hp_payload, hp)
    assert rx.lp_payload is not None and np.array_equal(rx.lp_payload, lp)

    rx = dem.decode(_awgn(frame.iq, 9.0, 42), frame.n_symbols,
                    len(hp), len(lp))
    assert np.array_equal(rx.hp_payload, hp)     # HP rides the wide quadrants
    assert rx.lp_payload is None                 # LP is gone at 9 dB — by design


def test_hier_stream_demod_chunked_two_frames():
    """Streaming receive of two back-to-back hierarchical frames at unknown
    offset, chunk-boundary invariant."""
    from orion_sdr_tpu.demodulate.dvb_t_stream import DvbTHierFrameStreamDemod
    from orion_sdr_tpu.demodulate.dvb_t_frame import DvbTHierRxFrame
    link = DvbTHierLinkParams(guard="1/32", constellation="qam16", alpha=2,
                              code_rate_hp="1/2", code_rate_lp="2/3")
    params = DvbTHierFrameParams(link=link)
    hp, lp = _payload(300, 6), _payload(700, 7)
    mod = DvbTHierFrameMod(params)
    f1 = mod.modulate(hp, lp)
    f2 = mod.modulate(hp[::-1].copy(), lp[::-1].copy())
    stream = np.concatenate([np.zeros(500, np.complex64), f1.iq, f2.iq,
                             np.zeros(300, np.complex64)])

    def run(chunk):
        sd = DvbTHierFrameStreamDemod(params, f1.n_symbols, len(hp), len(lp))
        out = []
        for i in range(0, len(stream), chunk):
            out += sd.feed(stream[i:i + chunk])
        out += sd.flush()
        return [r for r in out if isinstance(r, DvbTHierRxFrame)]

    for chunk in (40_000, 170_000):
        frames = run(chunk)
        assert len(frames) == 2, chunk
        assert np.array_equal(frames[0].hp_payload, hp)
        assert np.array_equal(frames[0].lp_payload, lp)
        assert np.array_equal(frames[1].hp_payload, hp[::-1])
        assert np.array_equal(frames[1].lp_payload, lp[::-1])
    with pytest.raises(NotImplementedError):
        DvbTHierFrameStreamDemod(params, f1.n_symbols, 1, 1) \
            .with_integer_cfo_correction()


def test_blind_decode_no_prior_parameters():
    """Fully blind receive: guard, constellation, code rate, hierarchy and
    payload extent all recovered from the signal itself."""
    from orion_sdr_tpu.demodulate.dvb_t_frame import dvb_t_blind_decode
    from orion_sdr_tpu.waveform.dvb_t import DvbTLinkParams, DvbTFrameParams
    from orion_sdr_tpu.modulate.dvb_t_frame import DvbTFrameMod
    payload = _payload(500, 20)
    for guard, order, rate in (("1/8", "qpsk", "2/3"),
                               ("1/32", "qam16", "3/4")):
        params = DvbTFrameParams(DvbTLinkParams(guard, order, rate), 1, 7)
        frame = DvbTFrameMod(params).modulate(payload)
        buf = np.concatenate([np.zeros(1234, np.complex64), frame.iq])
        out = dvb_t_blind_decode(buf)
        assert out.guard == guard
        assert out.tps.constellation == order
        assert out.tps.code_rate_hp == rate
        assert np.array_equal(out.payload[:len(payload)], payload)

    # hierarchical, blind
    link = DvbTHierLinkParams(guard="1/16", constellation="qam16", alpha=2,
                              code_rate_hp="1/2", code_rate_lp="3/4")
    hp, lp = _payload(300, 21), _payload(900, 22)
    frame = DvbTHierFrameMod(DvbTHierFrameParams(link=link)).modulate(hp, lp)
    out = dvb_t_blind_decode(frame.iq)
    assert out.tps.hierarchy == 2
    assert np.array_equal(out.payload[:len(hp)], hp)
    assert out.lp_payload is not None
    assert np.array_equal(out.lp_payload[:len(lp)], lp)


def test_blind_decode_multi_frame_capture_awgn():
    """A capture holding two frames at 6 dB: the descending-capacity retry
    decodes the first frame; the stricter TPS unpack (sync word + length
    field) rejects noise-region false words."""
    from orion_sdr_tpu.demodulate.dvb_t_frame import dvb_t_blind_decode
    from orion_sdr_tpu.waveform.dvb_t import DvbTLinkParams, DvbTFrameParams
    from orion_sdr_tpu.modulate.dvb_t_frame import DvbTFrameMod
    payload = _payload(500, 23)
    params = DvbTFrameParams(DvbTLinkParams("1/8", "qpsk", "1/2"), 2, 3)
    frame = DvbTFrameMod(params).modulate(payload)
    sig_p = float(np.mean(np.abs(frame.iq) ** 2))
    rng = np.random.default_rng(0)
    buf = np.concatenate([np.zeros(3000, np.complex64), frame.iq, frame.iq])
    buf = buf + ((rng.standard_normal(len(buf))
                  + 1j * rng.standard_normal(len(buf))
                  ).astype(np.complex64) * np.sqrt(sig_p / 10 ** 0.6 / 2))
    out = dvb_t_blind_decode(buf)
    assert out.guard == "1/8" and out.n_symbols == 68
    assert np.array_equal(out.payload[:len(payload)], payload)


def test_tps_unpack_rejects_noise_words():
    from orion_sdr_tpu.waveform.dvb_t_tps import TpsWord, tps_decode_frame
    for seed in range(100):
        rng = np.random.default_rng(seed)
        cells = (rng.standard_normal((68, 17))
                 + 1j * rng.standard_normal((68, 17))).astype(np.complex64)
        assert TpsWord.unpack(tps_decode_frame(cells)) is None
