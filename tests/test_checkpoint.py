"""Checkpoint / resume of streaming receiver state (beyond the reference:
SURVEY §5 "Checkpoint / resume: absent").

Contract under test: feed part of a stream, ``save_checkpoint``, restore
into a FRESH same-config receiver (fresh process semantics), feed the rest —
decoded output must equal the uninterrupted run exactly. Splits are placed
at awkward boundaries (mid-symbol, mid-frame) so the carried state is
load-bearing, mirroring the chunk-invariance tests."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr
from orion_sdr_tpu.checkpoint import state_dict, load_state_dict


def _roundtrip_via_file(tmp_path, obj, fresh):
    p = str(tmp_path / "ckpt.npz")
    sdr.save_checkpoint(p, obj)
    return sdr.load_checkpoint(p, fresh)


# ── PSK31 ────────────────────────────────────────────────────────────────────

def test_psk31_bpsk_resume_matches_continuous(tmp_path):
    msg = "checkpoint resume text"
    iq = np.asarray(sdr.bpsk31_mod_text(msg, 8000.0, rf_hz=800.0))
    one = sdr.Psk31Stream.new_bpsk(8000.0, 800.0)
    t_one = one.feed(iq) + one.flush()
    assert msg in t_one

    cut = len(iq) // 2 + 137                 # mid-symbol
    first = sdr.Psk31Stream.new_bpsk(8000.0, 800.0)
    t_a = first.feed(iq[:cut])
    resumed = _roundtrip_via_file(tmp_path, first,
                                  sdr.Psk31Stream.new_bpsk(8000.0, 800.0))
    t_b = resumed.feed(iq[cut:]) + resumed.flush()
    assert t_a + t_b == t_one


def test_psk31_qpsk_resume_matches_continuous(tmp_path):
    """QPSK carries the most state: rotator phase, PLL, StreamingViterbi
    path memory, varicode shift registers — all must survive the file."""
    msg = "qpsk stateful resume"
    iq = np.asarray(sdr.qpsk31_mod_text(msg, 8000.0, rf_hz=1000.0))
    one = sdr.Psk31Stream.new_qpsk(8000.0, 1000.0)
    t_one = one.feed(iq) + one.flush()
    assert msg in t_one

    first = sdr.Psk31Stream.new_qpsk(8000.0, 1000.0)
    t = first.feed(iq[: len(iq) // 3 + 71])
    mid = _roundtrip_via_file(tmp_path, first,
                              sdr.Psk31Stream.new_qpsk(8000.0, 1000.0))
    t += mid.feed(iq[len(iq) // 3 + 71: 2 * len(iq) // 3])
    last = load_state_dict(sdr.Psk31Stream.new_qpsk(8000.0, 1000.0),
                           state_dict(mid))      # in-memory hop too
    t += last.feed(iq[2 * len(iq) // 3:]) + last.flush()
    assert t == t_one


# ── FT8 ──────────────────────────────────────────────────────────────────────

def test_ft8_stream_resume_decodes_and_keeps_hash_table(tmp_path):
    from orion_sdr_tpu.message import NonStd, Standard

    dec = sdr.Ft8StreamDecoder.new_ft8(12000.0, 950.0, 1150.0)
    p1 = sdr.pack77(NonStd("CQ", "PJ4/K1ABC"), dec.hash_table)
    iq = np.asarray(sdr.ft8_mod(sdr.ft8_encode(p1), 12000.0, base_hz=1012.5))
    assert dec.feed(iq[: len(iq) // 2]) == []     # partial frame buffered
    resumed = _roundtrip_via_file(
        tmp_path, dec, sdr.Ft8StreamDecoder.new_ft8(12000.0, 950.0, 1150.0))
    res = resumed.feed(iq[len(iq) // 2:])
    assert res and res[0].message.call_de == "PJ4/K1ABC"
    # the hash table crossed the checkpoint: the hashed call resolves
    ht2 = sdr.CallsignHashTable()
    p2 = sdr.pack77(NonStd("PJ4/K1ABC", "W9XYZ"), ht2)
    assert sdr.unpack77(p2, resumed.hash_table).call_to == "<PJ4/K1ABC>"


# ── COFDM frame stream ───────────────────────────────────────────────────────

def _ofdm_link():
    from orion_sdr_tpu.sync.ofdm_sync import OfdmPreamble
    plan = sdr.CarrierPlan(256, 64).with_contiguous_data(edge_guard=16)
    cfg = sdr.OfdmConfig(plan, fs=1e6)
    pre = OfdmPreamble(repeat_len=128, num_repeats=4).with_training_symbol(
        plan.n_fft, plan.cp_len)
    return cfg, pre


def test_ofdm_frame_stream_resume_mid_frame(tmp_path):
    from orion_sdr_tpu.frame import FramePacket, FrameMetadata, McsTable
    cfg, pre = _ofdm_link()
    table = McsTable.default_ladder()
    payload = np.random.default_rng(5).integers(0, 256, 150).astype(np.uint8)
    mod = sdr.OfdmFrameMod(cfg, table, pre)
    iq = mod.modulate_frame(FramePacket(FrameMetadata(3, 1), payload), 0xC0)
    buf = np.concatenate([np.zeros(777, np.complex64), iq,
                          np.zeros(100, np.complex64)])

    s = sdr.OfdmFrameStreamDemod(cfg, table, pre)
    assert s.feed(buf[: len(buf) // 2]) == []     # incomplete → hold
    resumed = _roundtrip_via_file(
        tmp_path, s, sdr.OfdmFrameStreamDemod(cfg, table, pre))
    res = resumed.feed(buf[len(buf) // 2:]) + resumed.flush()
    frames = [r for r in res if hasattr(r, "packet")]
    assert len(frames) == 1
    assert np.array_equal(frames[0].packet.payload, payload)
    assert frames[0].diagnostics.timing_offset_samples == 777


def test_checkpoint_config_mismatch_raises(tmp_path):
    from orion_sdr_tpu.frame import McsTable
    cfg, pre = _ofdm_link()
    table = McsTable.default_ladder()
    s = sdr.OfdmFrameStreamDemod(cfg, table, pre)
    p = str(tmp_path / "s.npz")
    sdr.save_checkpoint(p, s)
    plan2 = sdr.CarrierPlan(256, 64).with_contiguous_data(edge_guard=24)
    cfg2 = sdr.OfdmConfig(plan2, fs=1e6)
    with pytest.raises(ValueError, match="fingerprint"):
        sdr.load_checkpoint(p, sdr.OfdmFrameStreamDemod(cfg2, table, pre))
    with pytest.raises(ValueError, match="saved state is for"):
        sdr.load_checkpoint(p, sdr.Psk31Stream.new_bpsk(8000.0))


def test_checkpoint_structural_mismatch_raises():
    saved = state_dict(sdr.Psk31Stream.new_qpsk(8000.0))
    with pytest.raises(ValueError):
        load_state_dict(sdr.Psk31Stream.new_bpsk(8000.0), saved)


# ── DVB-T stream (buffered-state transfer; decode paths covered above) ──────

def test_dvb_t_stream_buffer_state_survives(tmp_path):
    from orion_sdr_tpu.waveform.dvb_t import DvbTLinkParams
    params = sdr.DvbTFrameParams(DvbTLinkParams("1/8", "qpsk", "1/2"), 0, 0)
    s = sdr.DvbTFrameStreamDemod(params, n_symbols=68, payload_len=64)
    rng = np.random.default_rng(7)
    chunk = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)
             ).astype(np.complex64)
    s.feed(chunk)                               # far below one frame: buffers
    resumed = _roundtrip_via_file(
        tmp_path, s,
        sdr.DvbTFrameStreamDemod(params, n_symbols=68, payload_len=64))
    assert np.array_equal(resumed.view_buf(), s.view_buf())
    assert resumed.sps == s.sps


def test_band_receiver_resume_matches_continuous(tmp_path):
    """The band receiver's whole state tree — channelizer phases/FIR
    tails/remainder plus every per-channel stream buffer — survives the
    file; resuming mid-capture decodes exactly like the uninterrupted
    run."""
    from orion_sdr_tpu.multicarrier import CarrierPlan
    from orion_sdr_tpu.sync.ofdm_sync import OfdmPreamble

    plan = CarrierPlan(256, 64).with_contiguous_data(edge_guard=16)
    cfg = sdr.OfdmConfig(plan, fs=1e6)
    pre = OfdmPreamble(repeat_len=128, num_repeats=4
                       ).with_training_symbol(256, 64)
    table = sdr.McsTable.default_ladder()
    payload = np.random.default_rng(70).integers(0, 256, 90).astype(np.uint8)
    iq = sdr.OfdmFrameMod(cfg, table, pre).modulate_frame(
        sdr.FramePacket(sdr.FrameMetadata(4, 1), payload), 8)
    fs_wide, fc = 4e6, 0.7e6
    n_wide = 4 * (len(iq) + 4000)
    k = np.arange(n_wide)
    x = np.zeros(n_wide, np.complex128)
    up = np.repeat(np.asarray(iq, np.complex128), 4) / 4.0   # single channel:
    x[5000:5000 + len(up)] = up                              # ZOH images land
    x *= np.exp(2j * np.pi * fc * k / fs_wide)               # out of band
    x = x.astype(np.complex64)

    def fresh():
        return sdr.OfdmFrameBandStreamDemod(cfg, table, pre, [fc], fs_wide)

    one = fresh()
    ref = one.feed(x).get(0, []) + one.flush().get(0, [])
    ok = [r for r in ref if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)

    cut = len(x) // 2 + 777                     # mid-frame, off-block
    a = fresh()
    got = a.feed(x[:cut]).get(0, [])
    resumed = _roundtrip_via_file(tmp_path, a, fresh())
    got += resumed.feed(x[cut:]).get(0, [])
    got += resumed.flush().get(0, [])
    ok2 = [r for r in got if hasattr(r, "packet")]
    assert ok2 and np.array_equal(ok2[0].packet.payload, payload)


def test_hier_dvb_t_stream_resume_mid_frame(tmp_path):
    """The reflective walker covers the hierarchical stream receiver, and
    α participates in the config fingerprint."""
    import orion_sdr_tpu as sdr
    link = sdr.DvbTHierLinkParams(guard="1/32", constellation="qam16",
                                  alpha=2, code_rate_hp="1/2",
                                  code_rate_lp="2/3")
    params = sdr.DvbTHierFrameParams(link=link)
    rng = np.random.default_rng(0)
    hp = rng.integers(0, 256, 300).astype(np.uint8)
    lp = rng.integers(0, 256, 700).astype(np.uint8)
    frame = sdr.DvbTHierFrameMod(params).modulate(hp, lp)
    stream = np.concatenate([np.zeros(500, np.complex64), frame.iq])
    cut = len(stream) // 2

    def fresh(p=params):
        return sdr.DvbTHierFrameStreamDemod(p, frame.n_symbols,
                                            len(hp), len(lp))

    a = fresh()
    out = a.feed(stream[:cut])
    resumed = _roundtrip_via_file(tmp_path, a, fresh())
    out += resumed.feed(stream[cut:]) + resumed.flush()
    frames = [r for r in out if isinstance(r, sdr.DvbTHierRxFrame)]
    assert len(frames) == 1
    assert np.array_equal(frames[0].hp_payload, hp)
    assert np.array_equal(frames[0].lp_payload, lp)

    # a different alpha is a different config: resume must refuse
    b = fresh()
    b.feed(stream[:cut])
    other = fresh(sdr.DvbTHierFrameParams(link=sdr.DvbTHierLinkParams(
        guard="1/32", constellation="qam16", alpha=4)))
    path = str(tmp_path / "hier.npz")
    from orion_sdr_tpu.checkpoint import save_checkpoint, load_checkpoint
    save_checkpoint(path, b)
    with pytest.raises(ValueError):
        load_checkpoint(path, other)
