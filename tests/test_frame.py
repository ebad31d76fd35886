"""COFDM frame layer tests — mirrors reference tests/roundtrip/ofdm_frame.rs
(header/MCS/scrambler/interleaver/streaming-hold permutations) and the
block-plan/chain unit tests."""

import numpy as np
import pytest

from orion_sdr_tpu.multicarrier import CarrierPlan
from orion_sdr_tpu.ofdm import OfdmConfig
from orion_sdr_tpu.sync.ofdm_sync import OfdmPreamble
from orion_sdr_tpu.dsp.osc import rotate
from orion_sdr_tpu.frame import (
    FramePacket, FrameMetadata, RxError, OuterFec, InnerFec, InterleaverKind,
    ScramblerKind, Mcs, McsTable, BlockPlan, block_plan, encode_chain,
    decode_chain, pack_header_fields, HEADER_FIELD_BYTES,
    OfdmFrameMod, OfdmFrameDemod, OfdmFrameStreamDemod,
    SCRAMBLER_BEFORE_OUTER, SCRAMBLER_AFTER_INNER, BCH_INFO_BITS,
    append_crc, check_and_strip_crc,
)

FS = 1e6


def _link(plan_args=(256, 64), edge_guard=16, **cfg_kw):
    plan = CarrierPlan(*plan_args).with_contiguous_data(edge_guard=edge_guard)
    cfg = OfdmConfig(plan, fs=FS, **cfg_kw)
    pre = OfdmPreamble(repeat_len=128, num_repeats=4).with_training_symbol(
        plan.n_fft, plan.cp_len)
    return cfg, pre


def _payload(n=200, seed=0):
    return np.random.default_rng(seed).integers(0, 256, n).astype(np.uint8)


# ── chain plumbing ───────────────────────────────────────────────────────────

def test_crc_append_strip():
    data = _payload(32, 1)
    for crc in ("none", "crc16", "crc32"):
        framed = append_crc(crc, data)
        out, ok = check_and_strip_crc(crc, framed)
        assert ok and np.array_equal(out, data)
        if crc != "none":
            bad = framed.copy()
            bad[0] ^= 1
            _, ok = check_and_strip_crc(crc, bad)
            assert not ok


@pytest.mark.parametrize("outer,inner,oil,iil,scr,pos", [
    (OuterFec.bch(8), InnerFec.ldpc("N512R12"),
     InterleaverKind.none(), InterleaverKind.block(16, 32),
     ScramblerKind.additive(0b1001, 15, 0x5A5A), SCRAMBLER_AFTER_INNER),
    (OuterFec.reed_solomon(204, 16), InnerFec.convolutional("3/4", "dvb_k7"),
     InterleaverKind.convolutional(12, 17), InterleaverKind.none(),
     ScramblerKind.dvb_t_energy_dispersal(), SCRAMBLER_BEFORE_OUTER),
    (OuterFec.none(), InnerFec.ldpc("N576R23"),
     InterleaverKind.none(), InterleaverKind.none(),
     ScramblerKind.none(), SCRAMBLER_BEFORE_OUTER),
])
def test_chain_roundtrip_with_errors(outer, inner, oil, iil, scr, pos):
    payload = _payload(100, 2)
    plan = block_plan(len(payload), "crc32", outer, inner, oil, iil)
    coded = encode_chain(payload, "crc32", outer, inner, oil, iil, scr, pos, 99)
    assert len(coded) == plan.coded_bits
    llrs = np.where(coded == 0, 4.0, -4.0).astype(np.float32)
    rng = np.random.default_rng(3)
    llrs[rng.choice(len(llrs), len(llrs) // 150 + 2, replace=False)] *= -1
    out, ok = decode_chain(llrs, plan, "crc32", outer, inner, oil, iil,
                           scr, pos, 99)
    assert ok and np.array_equal(out, payload)


def test_chain_detects_uncorrectable():
    payload = _payload(60, 4)
    outer, inner = OuterFec.none(), InnerFec.none()
    il = InterleaverKind.none()
    plan = block_plan(len(payload), "crc32", outer, inner, il, il)
    coded = encode_chain(payload, "crc32", outer, inner, il, il,
                         ScramblerKind.none(), SCRAMBLER_BEFORE_OUTER, 0)
    llrs = np.where(coded == 0, 4.0, -4.0).astype(np.float32)
    llrs[7] *= -1   # single bit error, no FEC → CRC must catch it
    out, ok = decode_chain(llrs, plan, "crc32", outer, inner, il, il,
                           ScramblerKind.none(), SCRAMBLER_BEFORE_OUTER, 0)
    assert not ok


def test_block_plan_bch_fragmentation():
    p = block_plan(100, "crc32", OuterFec.bch(8), InnerFec.none(),
                   InterleaverKind.none(), InterleaverKind.none())
    assert p.framed_bytes == 104
    n_blocks = -(-104 * 8 // BCH_INFO_BITS)
    assert p.outer_coded_bits % n_blocks == 0


def test_header_fields_pack():
    f = pack_header_fields(3, 0x01020304, 0xAABBCCDD, 0x5A, 0xDEADBEEF)
    assert len(f) == HEADER_FIELD_BYTES == 14
    assert f[0] == 3 and list(f[1:5]) == [1, 2, 3, 4]
    assert int.from_bytes(bytes(f[10:14]), "big") == 0xDEADBEEF


# ── frame roundtrips (mirrors roundtrip/ofdm_frame.rs) ───────────────────────

def test_frame_noiseless_ldpc_bch():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(200, 5)
    mod = OfdmFrameMod(cfg, table, pre)
    iq = mod.modulate_frame(FramePacket(FrameMetadata(7, 1), payload), 0xDEAD)
    out = OfdmFrameDemod(cfg, table).decode(iq[pre.total_len():])
    assert np.array_equal(out.payload, payload)
    assert out.metadata.sequence_num == 7 and out.metadata.mcs_index == 1


def test_frame_awgn_flat():
    # ref roundtrip_frame_awgn: noise power = 0.10 × signal power, known start
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(150, 6)
    mod = OfdmFrameMod(cfg, table, pre)
    iq = mod.modulate_frame(FramePacket(FrameMetadata(1, 1), payload), 7)
    body = iq[pre.total_len():]
    sig_power = float(np.mean(np.abs(body) ** 2))
    rng = np.random.default_rng(0xC0FFEE)
    noise = (rng.standard_normal(len(body)) + 1j * rng.standard_normal(len(body))
             ).astype(np.complex64) * np.sqrt(sig_power * 0.10 / 2)
    out = OfdmFrameDemod(cfg, table).decode(body + noise)
    assert np.array_equal(out.payload, payload)


def test_frame_all_mcs_indices():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    mod = OfdmFrameMod(cfg, table, pre)
    demod = OfdmFrameDemod(cfg, table)
    payload = _payload(64, 8)
    for mcs in range(len(table)):
        iq = mod.modulate_frame(FramePacket(FrameMetadata(mcs, mcs), payload), 0)
        out = demod.decode(iq[pre.total_len():])
        assert np.array_equal(out.payload, payload), mcs


def test_frame_scrambler_per_frame_seed():
    cfg, pre = _link()
    cfg = cfg.with_scrambler(ScramblerKind.additive(0b110, 7, 0, per_frame=True))
    table = McsTable.default_ladder()
    mod = OfdmFrameMod(cfg, table, pre)
    payload = _payload(100, 9)
    iq1 = mod.modulate_frame(FramePacket(FrameMetadata(0, 1), payload), 111)
    iq2 = mod.modulate_frame(FramePacket(FrameMetadata(0, 1), payload), 222)
    assert not np.allclose(iq1, iq2)   # different whitening
    demod = OfdmFrameDemod(cfg, table)
    for iq in (iq1, iq2):
        out = demod.decode(iq[pre.total_len():])
        assert np.array_equal(out.payload, payload)


def test_frame_rs_conv_interleaved():
    cfg, pre = _link()
    cfg = cfg.with_outer_interleaver(InterleaverKind.convolutional(12, 17)) \
             .with_scrambler(ScramblerKind.dvb_t_energy_dispersal())
    table = McsTable([Mcs("qpsk", InnerFec.convolutional("2/3", "dvb_k7"),
                          OuterFec.reed_solomon(204, 16))])
    mod = OfdmFrameMod(cfg, table, pre)
    payload = _payload(300, 10)
    iq = mod.modulate_frame(FramePacket(FrameMetadata(0, 0), payload), 0)
    out = OfdmFrameDemod(cfg, table).decode(iq[pre.total_len():])
    assert np.array_equal(out.payload, payload)


def test_frame_decode_batch_mixed_mcs():
    """Batched aligned receive: mixed MCS/payload groups + a corrupted-header
    frame must come back as per-frame results in order."""
    cfg, pre = _link()
    cfg = cfg.with_scrambler(ScramblerKind.additive(0b110, 7, 0, per_frame=True))
    table = McsTable.default_ladder()
    mod = OfdmFrameMod(cfg, table, pre)
    specs = [(3, 1, 64, 101), (4, 1, 64, 202), (5, 3, 120, 303)]
    payloads = [_payload(n, 20 + i) for i, (_, _, n, _) in enumerate(specs)]
    bodies = [mod.modulate_frame(
        FramePacket(FrameMetadata(seq, mcs), p), seed)[pre.total_len():]
        for (seq, mcs, _, seed), p in zip(specs, payloads)]
    rng = np.random.default_rng(0xBA7C4)
    bad = bodies[0].copy()
    bad[:2000] = (rng.standard_normal(2000) + 1j * rng.standard_normal(2000)
                  ).astype(np.complex64)   # header trashed
    rows = bodies + [bad]
    n = max(len(b) for b in rows)
    batch = np.zeros((len(rows), n), np.complex64)
    for i, b in enumerate(rows):
        sig = float(np.mean(np.abs(b) ** 2))
        # 0.02 noise scale (~17 dB): above the qam64 ladder step's waterline
        noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                 ).astype(np.complex64) * np.sqrt(sig * 0.02 / 2)
        batch[i, :len(b)] = b
        batch[i] += noise
    out = OfdmFrameDemod(cfg, table).decode_batch(batch)
    for i, ((seq, mcs, _, _), p) in enumerate(zip(specs, payloads)):
        assert isinstance(out[i], FramePacket), out[i]
        assert np.array_equal(out[i].payload, p)
        assert out[i].metadata.sequence_num == seq
        assert out[i].metadata.mcs_index == mcs
    assert isinstance(out[3], RxError)


def test_frame_decode_batch_rs_conv_matches_single():
    cfg, pre = _link()
    cfg = cfg.with_outer_interleaver(InterleaverKind.convolutional(12, 17)) \
             .with_scrambler(ScramblerKind.dvb_t_energy_dispersal())
    table = McsTable([Mcs("qpsk", InnerFec.convolutional("2/3", "dvb_k7"),
                          OuterFec.reed_solomon(204, 16))])
    mod = OfdmFrameMod(cfg, table, pre)
    payloads = [_payload(300, 30), _payload(300, 31)]
    bodies = [mod.modulate_frame(
        FramePacket(FrameMetadata(i, 0), p), 0)[pre.total_len():]
        for i, p in enumerate(payloads)]
    out = OfdmFrameDemod(cfg, table).decode_batch(np.stack(bodies))
    for got, p in zip(out, payloads):
        assert isinstance(got, FramePacket) and np.array_equal(got.payload, p)


def test_frame_header_crc_mismatch_on_garbage():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    rng = np.random.default_rng(11)
    garbage = (rng.standard_normal(8000) + 1j * rng.standard_normal(8000)
               ).astype(np.complex64)
    with pytest.raises(RxError):
        OfdmFrameDemod(cfg, table).decode(garbage)


# ── streaming receiver ───────────────────────────────────────────────────────

def _frame_iq(cfg, pre, table, payload, seq=7, mcs=1, seed=0xDEAD):
    mod = OfdmFrameMod(cfg, table, pre)
    return mod.modulate_frame(FramePacket(FrameMetadata(seq, mcs), payload), seed)


def test_stream_unknown_offset_cfo_noise():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(200, 12)
    iq = _frame_iq(cfg, pre, table, payload)
    buf = np.concatenate([np.zeros(3000, np.complex64), iq,
                          np.zeros(2000, np.complex64)])
    z, _ = rotate(buf, 37.0, FS)
    rng = np.random.default_rng(13)
    buf = np.asarray(z) + (rng.standard_normal(len(buf)) +
                           1j * rng.standard_normal(len(buf))
                           ).astype(np.complex64) * 0.01
    s = OfdmFrameStreamDemod(cfg, table, pre)
    res = []
    for i in range(0, len(buf), 20000):
        res += s.feed(buf[i:i + 20000])
    res += s.flush()
    ok = [r for r in res if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)
    assert abs(ok[0].diagnostics.cfo_hz - 37.0) < 2.0


def test_stream_multipath_echo_with_noise():
    """Static in-guard multipath + 7 dB AWGN: the training-hold estimate
    (delay-domain denoised) + CSI-weighted LLRs must still decode. Guards
    the round-3 sensitivity work — the raw single-symbol estimate without
    denoising fails this channel below ~10 dB."""
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(200, 14)
    iq = _frame_iq(cfg, pre, table, payload)
    buf = np.concatenate([np.zeros(3000, np.complex64), iq,
                          np.zeros(2000, np.complex64)])
    echo = np.zeros_like(buf)
    echo[20:] = 0.4 * np.exp(1j * 0.7) * buf[:-20]   # 20-sample in-CP echo
    buf = buf + echo
    body = iq[pre.total_len():]
    sig = float(np.mean(np.abs(body) ** 2))
    sigma = np.sqrt(sig / (2 * 10 ** (7.0 / 10)))
    rng = np.random.default_rng(15)
    buf = buf + (rng.standard_normal(len(buf)) +
                 1j * rng.standard_normal(len(buf))
                 ).astype(np.complex64) * sigma
    s = OfdmFrameStreamDemod(cfg, table, pre)
    res = []
    for i in range(0, len(buf), 20000):
        res += s.feed(buf[i:i + 20000])
    res += s.flush()
    ok = [r for r in res if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)
    assert ok[0].diagnostics.timing_offset_samples == 3000


def test_stream_phase_noise_cpe_tracking():
    """Wiener oscillator phase noise (15 Hz linewidth) accumulates ~0.7 rad
    over the frame — fatal to the held training phase. phase_tracking='cpe'
    (per-symbol V&V + unwrap, beyond-reference) must ride it out."""
    from orion_sdr_tpu.channel import phase_noise_apply
    cfg, pre = _link()
    cfg = cfg.with_phase_tracking("cpe")
    table = McsTable.default_ladder()
    payload = _payload(200, 16)
    iq = _frame_iq(cfg, pre, table, payload)
    body = iq[pre.total_len():]
    sig = float(np.mean(np.abs(body) ** 2))
    decoded = 0
    for seed in (21, 22, 24):
        rng = np.random.default_rng(seed)
        buf = np.concatenate([np.zeros(2500, np.complex64), iq,
                              np.zeros(1500, np.complex64)])
        buf = phase_noise_apply(rng, buf, 15.0, FS)
        sigma = np.sqrt(sig / (2 * 10 ** (12.0 / 10)))
        buf = buf + (rng.standard_normal(len(buf)) +
                     1j * rng.standard_normal(len(buf))
                     ).astype(np.complex64) * sigma
        s = OfdmFrameStreamDemod(cfg, table, pre)
        res = []
        for i in range(0, len(buf), 20000):
            res += s.feed(buf[i:i + 20000])
        res += s.flush()
        ok = [r for r in res if hasattr(r, "packet")]
        decoded += bool(ok) and np.array_equal(ok[0].packet.payload, payload)
    assert decoded == 3


def test_stream_multipath_training_equalizer():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(200, 14)
    iq = _frame_iq(cfg, pre, table, payload)
    h = np.zeros(8, np.complex64)
    h[0], h[5] = 1.0, 0.35 * np.exp(1j * 0.7)
    buf = np.convolve(np.concatenate([np.zeros(1000, np.complex64), iq]),
                      h).astype(np.complex64)
    s = OfdmFrameStreamDemod(cfg, table, pre)
    res = s.feed(buf) + s.flush()
    ok = [r for r in res if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)


def test_stream_two_frames_in_order():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    p1, p2 = _payload(120, 15), _payload(80, 16)
    iq1 = _frame_iq(cfg, pre, table, p1, seq=7, mcs=1)
    iq2 = _frame_iq(cfg, pre, table, p2, seq=8, mcs=2)
    s = OfdmFrameStreamDemod(cfg, table, pre)
    res = s.feed(np.concatenate([iq1, np.zeros(500, np.complex64), iq2]))
    res += s.flush()
    frames = [r for r in res if hasattr(r, "packet")]
    assert [f.packet.metadata.sequence_num for f in frames] == [7, 8]
    assert np.array_equal(frames[0].packet.payload, p1)
    assert np.array_equal(frames[1].packet.payload, p2)


def test_stream_incomplete_hold_then_complete():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(200, 17)
    iq = _frame_iq(cfg, pre, table, payload)
    s = OfdmFrameStreamDemod(cfg, table, pre)
    assert s.feed(iq[:len(iq) // 2]) == []      # hold, no error
    res = s.feed(iq[len(iq) // 2:])
    ok = [r for r in res if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)


def test_stream_chunk_invariance():
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(150, 18)
    iq = _frame_iq(cfg, pre, table, payload)
    buf = np.concatenate([np.zeros(777, np.complex64), iq,
                          np.zeros(100, np.complex64)])
    one = OfdmFrameStreamDemod(cfg, table, pre)
    r_one = one.feed(buf) + one.flush()
    chunked = OfdmFrameStreamDemod(cfg, table, pre)
    r_chunks = []
    for i in range(0, len(buf), 1234):
        r_chunks += chunked.feed(buf[i:i + 1234])
    r_chunks += chunked.flush()
    pk1 = [r.packet.payload for r in r_one if hasattr(r, "packet")]
    pk2 = [r.packet.payload for r in r_chunks if hasattr(r, "packet")]
    assert len(pk1) == len(pk2) == 1
    assert np.array_equal(pk1[0], pk2[0])


@pytest.mark.parametrize("concat", ["ldpc_bch", "conv_rs"])
def test_frame_fer_zero_at_noise_0p2(concat):
    """Reference CI capstone: COFDM FER = 0 through noise_scale 0.2
    (≈7 dB; docs/performance.md:277-287) for BOTH concatenations."""
    cfg, pre = _link()
    if concat == "ldpc_bch":
        table = McsTable.default_ladder()
        mcs = 1                                    # qpsk, LDPC r1/2 + BCH t=8
    else:
        cfg = cfg.with_outer_interleaver(InterleaverKind.convolutional(12, 17))
        table = McsTable([Mcs("qpsk", InnerFec.convolutional("1/2", "dvb_k7"),
                              OuterFec.reed_solomon(60, 8))])
        mcs = 0
    mod = OfdmFrameMod(cfg, table, pre)
    demod = OfdmFrameDemod(cfg, table)
    rng = np.random.default_rng(0xFE2)
    n_frames, fails = 5, 0
    for i in range(n_frames):
        payload = _payload(180, 40 + i)
        body = mod.modulate_frame(FramePacket(FrameMetadata(i, mcs), payload),
                                  i)[pre.total_len():]
        sig = float(np.mean(np.abs(body) ** 2))
        noise = (rng.standard_normal(len(body)) +
                 1j * rng.standard_normal(len(body))
                 ).astype(np.complex64) * np.sqrt(sig * 0.2 / 2)
        try:
            out = demod.decode(body + noise)
            fails += not np.array_equal(out.payload, payload)
        except RxError:
            fails += 1
    assert fails == 0, f"{fails}/{n_frames} frames failed at noise 0.2"


# ── per-symbol pilot-interp equalizer on the generic frame path ──────────────

def _pilot_link(**cfg_kw):
    """Pilot-bearing generic plan: pilots every 8 carriers BRACKETING the
    contiguous data span (like DVB-T's edge continual pilots) — data bins
    beyond the outermost pilots would interpolate across the natural-bin-order
    wrap gap, degenerate in the reference too (interpolate_at,
    demodulate/ofdm.rs:392-426)."""
    plan = (CarrierPlan(256, 64)
            .with_pilot_carriers([(i, 1.0 + 0j) for i in range(-100, 101, 8)])
            .with_contiguous_data(edge_guard=27))
    cfg = OfdmConfig(plan, fs=FS, **cfg_kw)
    pre = OfdmPreamble(repeat_len=128, num_repeats=4).with_training_symbol(
        plan.n_fft, plan.cp_len)
    return cfg, pre


def test_pilot_interp_load_bearing_multipath():
    """Pilot interpolation is selectable — and load-bearing — on the GENERIC
    frame path (ref EqualizerMethod::PerSymbolPilotInterp,
    demodulate/ofdm.rs:241-448): a frequency-selective multipath capture
    decodes with 'pilot_interp' and fails with the flat/held estimate,
    mirroring the reference's scattered-vs-continual pair (docs/dvb.md:329-338)."""
    table = McsTable.default_ladder()
    payload = _payload(150, 77)
    cfg_hold, pre = _pilot_link()
    cfg_pi = cfg_hold.with_equalizer_method("pilot_interp")
    cfg_pi.validate()
    iq = _frame_iq(cfg_hold, pre, table, payload, mcs=2)
    h = np.zeros(8, np.complex64)
    h[0], h[5] = 1.0, 0.55 * np.exp(1j * 1.9)
    body = np.convolve(iq, h)[pre.total_len():].astype(np.complex64)
    out = OfdmFrameDemod(cfg_pi, table).decode(body)
    assert np.array_equal(out.payload, payload)
    with pytest.raises(RxError):
        OfdmFrameDemod(cfg_hold, table).decode(body)


def test_stream_pilot_interp_tracks_drifting_channel():
    """A channel that drifts WITHIN the packet: the training-symbol-hold
    estimate goes stale (ref rationale, demodulate/ofdm.rs:262-266) while
    per-symbol pilot re-estimation tracks it."""
    table = McsTable.default_ladder()
    payload = _payload(150, 78)
    cfg_hold, pre = _pilot_link()
    cfg_pi = cfg_hold.with_equalizer_method("pilot_interp")
    iq = _frame_iq(cfg_hold, pre, table, payload, mcs=2)
    # two-tap channel whose echo phase rotates across the capture
    delayed = np.concatenate([np.zeros(5, np.complex64), iq[:-5]])
    drift = np.exp(1j * np.linspace(0.0, 2.0 * np.pi, len(iq))
                   ).astype(np.complex64)
    rx = (iq + 0.55 * delayed * drift).astype(np.complex64)

    s_pi = OfdmFrameStreamDemod(cfg_pi, table, pre)
    res = s_pi.feed(rx) + s_pi.flush()
    ok = [r for r in res if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)

    s_hold = OfdmFrameStreamDemod(cfg_hold, table, pre)
    res = s_hold.feed(rx) + s_hold.flush()
    assert not any(hasattr(r, "packet") and
                   np.array_equal(r.packet.payload, payload) for r in res)


# ── multi-channel band receive (beyond-reference) ────────────────────────────

def test_band_receive_three_channels():
    """Three COFDM links at different centers in one 8 MS/s capture: the
    batched channelizer + per-channel streams must decode all three
    payloads (plus noise), chunk-boundary invariant."""
    from orion_sdr_tpu.frame import OfdmFrameBandStreamDemod
    cfg, pre = _link()
    table = McsTable.default_ladder()
    fs_wide = 8.0 * FS
    centers = [-2.1e6, 0.3e6, 1.5e6]
    payloads = [_payload(120, 40 + i) for i in range(3)]

    def up8(x):
        # exact bandlimited 8× upsampling: FFT zero-padding (the signal is
        # zero-guarded, so the circular wrap touches only dead air)
        x = np.concatenate([np.zeros(256), np.asarray(x, np.complex128),
                            np.zeros(256)])
        X = np.fft.fft(x)
        n = len(x)
        Y = np.zeros(8 * n, np.complex128)
        Y[: n // 2] = X[: n // 2]
        Y[-(n - n // 2):] = X[n // 2:]
        return 8.0 * np.fft.ifft(Y)

    rng = np.random.default_rng(50)
    n_wide = 120_000
    wide = np.zeros(n_wide, np.complex128)
    k = np.arange(n_wide)
    for i, (fc, p) in enumerate(zip(centers, payloads)):
        iq = _frame_iq(cfg, pre, table, p, seq=i, mcs=1, seed=i)
        up = np.zeros(n_wide, np.complex128)
        start = 3000 + 9000 * i
        x = up8(iq) / 8.0
        up[start:start + len(x)] = x
        wide += up * np.exp(2j * np.pi * fc * k / fs_wide)
    wide = wide.astype(np.complex64)
    sig = float(np.mean(np.abs(wide) ** 2))
    wide += (rng.standard_normal(n_wide) + 1j * rng.standard_normal(n_wide)
             ).astype(np.complex64) * np.sqrt(sig * 0.001 / 2)

    def run(chunk):
        rx = OfdmFrameBandStreamDemod(cfg, table, pre, centers, fs_wide)
        got = {}
        for i in range(0, n_wide, chunk):
            for c, res in rx.feed(wide[i:i + chunk]).items():
                got.setdefault(c, []).extend(res)
        for c, res in rx.flush().items():
            got.setdefault(c, []).extend(res)
        return got

    got = run(37_003)   # deliberately not a multiple of the decimation
    for c, p in enumerate(payloads):
        frames = [r for r in got.get(c, []) if hasattr(r, "packet")]
        assert frames, (c, got.get(c))
        assert np.array_equal(frames[0].packet.payload, p), c
        assert frames[0].packet.metadata.sequence_num == c

    # chunk-boundary invariance: different feed size, same three payloads
    got2 = run(50_000)
    for c, p in enumerate(payloads):
        frames = [r for r in got2.get(c, []) if hasattr(r, "packet")]
        assert frames and np.array_equal(frames[0].packet.payload, p), c


def test_scan_then_band_receive():
    """Blind gateway flow: spectrum_scan finds the occupied channels in a
    wideband capture, their centers feed the band receiver, both payloads
    decode — no prior knowledge of the channel plan."""
    import orion_sdr_tpu as sdr
    from orion_sdr_tpu.frame import OfdmFrameBandStreamDemod
    cfg, pre = _link()
    table = McsTable.default_ladder()
    fs_wide = 8.0 * FS
    true_centers = [-2.6e6, 1.7e6]
    payloads = [_payload(100, 60 + i) for i in range(2)]

    def up8(x):
        x = np.concatenate([np.zeros(256), np.asarray(x, np.complex128),
                            np.zeros(256)])
        X = np.fft.fft(x)
        n = len(x)
        Y = np.zeros(8 * n, np.complex128)
        Y[: n // 2] = X[: n // 2]
        Y[-(n - n // 2):] = X[n // 2:]
        return 8.0 * np.fft.ifft(Y)

    rng = np.random.default_rng(80)
    n_wide = 100_000
    wide = np.zeros(n_wide, np.complex128)
    k = np.arange(n_wide)
    for i, (fc, p) in enumerate(zip(true_centers, payloads)):
        iq = _frame_iq(cfg, pre, table, p, seq=i, mcs=1, seed=i)
        x = up8(iq) / 8.0
        row = np.zeros(n_wide, np.complex128)
        row[4000 + 7000 * i:4000 + 7000 * i + len(x)] = x
        wide += row * np.exp(2j * np.pi * fc * k / fs_wide)
    wide = wide.astype(np.complex64)
    sig = float(np.mean(np.abs(wide) ** 2))
    wide += (rng.standard_normal(n_wide) + 1j * rng.standard_normal(n_wide)
             ).astype(np.complex64) * np.sqrt(sig * 0.01 / 2)

    segs = sdr.spectrum_scan(wide, fs_wide, min_bw_hz=200e3)
    assert len(segs) == 2, segs
    found = sorted(s.center_hz for s in segs)
    for fc, got in zip(sorted(true_centers), found):
        # the centroid rides the preamble's random per-bin power comb
        # (~13 dB hotter than the body), so expect tens of kHz of skew;
        # the receiver's integer-CFO search (±bins of 3.9 kHz) plus S&C
        # fractional capture absorbs it — the decode below is the proof
        assert abs(got - fc) < 60_000.0, (fc, got)

    rx = OfdmFrameBandStreamDemod(cfg, table, pre,
                                  [s.center_hz for s in segs], fs_wide)
    got = {}
    for i in range(0, n_wide, 40_000):
        for c, res in rx.feed(wide[i:i + 40_000]).items():
            got.setdefault(c, []).extend(res)
    for c, res in rx.flush().items():
        got.setdefault(c, []).extend(res)
    decoded = {}
    for c in range(2):
        for r in got.get(c, []):
            if hasattr(r, "packet"):
                decoded[int(r.packet.metadata.sequence_num)] = \
                    r.packet.payload
    assert set(decoded) == {0, 1}, got
    for i, p in enumerate(payloads):
        assert np.array_equal(decoded[i], p)


def test_stream_roundtrip_transform_precoding():
    """DFT-s-OFDM (SC-FDMA) over the FULL frame stack: header and payload
    both ride the spread waveform, the streaming receiver acquires at an
    unknown offset with CFO + noise + in-guard multipath, and the payload
    comes back exact through frequency-domain equalization + despread."""
    cfg, pre = _link(transform_precoding=True)
    cfg.validate()
    table = McsTable.default_ladder()
    payload = _payload(200, 77)
    iq = _frame_iq(cfg, pre, table, payload, seq=5, mcs=2)
    chan = np.array([1.0, 0.3 * np.exp(1j * 0.9)], np.complex64)
    buf = np.concatenate([np.zeros(2500, np.complex64),
                          np.convolve(iq, chan)[:len(iq)],
                          np.zeros(1500, np.complex64)])
    z, _ = rotate(buf, 25.0, FS)
    rng = np.random.default_rng(78)
    buf = np.asarray(z) + (rng.standard_normal(len(buf)) +
                           1j * rng.standard_normal(len(buf))
                           ).astype(np.complex64) * 0.01
    s = OfdmFrameStreamDemod(cfg, table, pre)
    res = []
    for i in range(0, len(buf), 15000):
        res += s.feed(buf[i:i + 15000])
    res += s.flush()
    ok = [r for r in res if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)
    assert ok[0].packet.metadata.sequence_num == 5

    # precoded TX really is a different waveform: a plain-OFDM receiver
    # must NOT decode it
    plain = OfdmFrameStreamDemod(cfg.with_transform_precoding(False),
                                 table, pre)
    res = plain.feed(buf) + plain.flush()
    assert not [r for r in res if hasattr(r, "packet")]
