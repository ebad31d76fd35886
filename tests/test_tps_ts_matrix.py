"""TPS + TS layer permutation matrix — deepens coverage toward the
reference's unit/dvb_t_tps.rs tier (BCH(67,53) vectors, TPS word field
permutations, sync alternation, DBPSK frame codec; TS packetization edges)."""

import numpy as np
import pytest

from orion_sdr_tpu.waveform.dvb_t_tps import (
    TPS_SYNC_WORD_13, TPS_SYNC_WORD_24, tps_bch_parity, tps_bch_encode,
    tps_bch_decode, TpsWord, tps_encode_frame, tps_decode_frame,
    TPS_SYMBOLS_PER_FRAME,
)
from orion_sdr_tpu.waveform.dvb_t_ts import (
    TS_PACKET_LEN, TS_PAYLOAD_LEN, ts_packetize, ts_depacketize,
    ts_null_packet, ts_stuff_null_packets, ts_energy_disperse,
)


# ── TPS BCH(67,53) over GF(2^7) ──────────────────────────────────────────────

def test_tps_bch_roundtrip_clean():
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, 53).astype(np.uint8)
    cw = tps_bch_encode(info)
    assert len(cw) == 67
    out = tps_bch_decode(cw)
    assert out is not None and np.array_equal(out[:53], info)


@pytest.mark.parametrize("n_err", [1, 2])
def test_tps_bch_corrects_t2(n_err):
    rng = np.random.default_rng(n_err)
    info = rng.integers(0, 2, 53).astype(np.uint8)
    cw = tps_bch_encode(info)
    for trial in range(4):
        bad = cw.copy()
        pos = rng.choice(67, n_err, replace=False)
        bad[pos] ^= 1
        out = tps_bch_decode(bad)
        assert out is not None and np.array_equal(out[:53], info)


def test_tps_bch_rejects_heavy():
    rng = np.random.default_rng(9)
    info = rng.integers(0, 2, 53).astype(np.uint8)
    bad = tps_bch_encode(info)
    bad[::4] ^= 1
    out = tps_bch_decode(bad)
    assert out is None or not np.array_equal(out[:53], info)


# ── TpsWord field permutations ───────────────────────────────────────────────

@pytest.mark.parametrize("constellation", ["qpsk", "qam16", "qam64"])
@pytest.mark.parametrize("code_rate", ["1/2", "2/3", "3/4", "5/6", "7/8"])
def test_tps_word_constellation_rate(constellation, code_rate):
    w = TpsWord(frame_number=1, constellation=constellation,
                code_rate_hp=code_rate, guard="1/8", cell_id=0x34)
    out = TpsWord.unpack(w.pack())
    assert out == w


@pytest.mark.parametrize("guard", ["1/32", "1/16", "1/8", "1/4"])
def test_tps_word_guards(guard):
    w = TpsWord(frame_number=2, constellation="qpsk", code_rate_hp="1/2",
                guard=guard, cell_id=7)
    assert TpsWord.unpack(w.pack()) == w


@pytest.mark.parametrize("frame_number", [0, 1, 2, 3])
def test_tps_sync_word_alternates(frame_number):
    w = TpsWord(frame_number=frame_number, constellation="qpsk",
                code_rate_hp="1/2", guard="1/8", cell_id=0)
    want = TPS_SYNC_WORD_13 if frame_number % 2 == 0 else TPS_SYNC_WORD_24
    assert w.sync_word() == want
    assert TpsWord.unpack(w.pack()).frame_number == frame_number


def test_tps_word_rejects_garbage_bits():
    rng = np.random.default_rng(3)
    assert TpsWord.unpack(rng.integers(0, 2, 68).astype(np.uint8)) is None


def test_tps_dbpsk_frame_codec_roundtrip():
    w = TpsWord(frame_number=1, constellation="qam16", code_rate_hp="3/4",
                guard="1/16", cell_id=0xEF)
    bits = w.pack()
    cells = tps_encode_frame(bits)
    assert cells.shape == (TPS_SYMBOLS_PER_FRAME, 17)
    back = tps_decode_frame(cells)
    assert TpsWord.unpack(back) == w


def test_tps_dbpsk_survives_carrier_noise():
    rng = np.random.default_rng(5)
    w = TpsWord(frame_number=0, constellation="qpsk", code_rate_hp="1/2",
                guard="1/4", cell_id=77)
    cells = tps_encode_frame(w.pack())
    noisy = cells + (rng.standard_normal(cells.shape) +
                     1j * rng.standard_normal(cells.shape)) * 0.3
    assert TpsWord.unpack(tps_decode_frame(noisy.astype(np.complex64))) == w


# ── TS layer ─────────────────────────────────────────────────────────────────

@pytest.mark.parametrize("n", [0, 1, 186, 187, 188, 400])
def test_ts_packetize_depacketize_lengths(n):
    rng = np.random.default_rng(n)
    payload = rng.integers(0, 256, n).astype(np.uint8)
    ts = ts_packetize(payload)
    assert len(ts) % TS_PACKET_LEN == 0
    assert np.all(ts[::TS_PACKET_LEN] == 0x47)
    back = ts_depacketize(ts)
    assert back is not None and np.array_equal(back[:n], payload)


def test_ts_null_packet_shape_and_pid():
    p = ts_null_packet()
    assert len(p) == TS_PACKET_LEN and p[0] == 0x47
    pid = ((int(p[1]) & 0x1F) << 8) | int(p[2])
    assert pid == 0x1FFF


def test_ts_stuffing_reaches_target():
    payload = np.arange(100, dtype=np.uint8)
    ts = ts_packetize(payload)
    stuffed = ts_stuff_null_packets(ts, 8)
    assert len(stuffed) == 8 * TS_PACKET_LEN
    back = ts_depacketize(stuffed)
    assert back is not None and np.array_equal(back[:100], payload)


def test_ts_dispersal_group_sync_inversion():
    """EN 300 744: the first sync byte of each 8-packet group inverts to
    0xB8; the other seven stay 0x47; dispersal is self-inverse."""
    ts = ts_stuff_null_packets(ts_packetize(np.arange(50, dtype=np.uint8)),
                               16)
    d = ts_energy_disperse(ts)
    syncs = d[::TS_PACKET_LEN]
    assert syncs[0] == 0xB8 and syncs[8] == 0xB8
    assert np.all(syncs[1:8] == 0x47) and np.all(syncs[9:16] == 0x47)
    assert np.array_equal(ts_energy_disperse(d), ts)


def test_ts_depacketize_rejects_bad_sync():
    ts = ts_packetize(np.arange(10, dtype=np.uint8))
    bad = ts.copy()
    bad[0] = 0x48
    assert ts_depacketize(bad) is None
