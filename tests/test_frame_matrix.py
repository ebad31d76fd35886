"""COFDM frame permutation matrix — mirrors reference
tests/roundtrip/ofdm_frame.rs (28 tests): header-format × scrambler ×
interleaver × MCS × stream-hold combinations, each a full mod→demod
roundtrip."""

import numpy as np
import pytest

from orion_sdr_tpu.multicarrier import CarrierPlan
from orion_sdr_tpu.ofdm import OfdmConfig
from orion_sdr_tpu.sync.ofdm_sync import OfdmPreamble
from orion_sdr_tpu.frame import (
    FramePacket, FrameMetadata, RxError, OuterFec, InnerFec, InterleaverKind,
    ScramblerKind, Mcs, McsTable, OfdmFrameMod, OfdmFrameDemod,
    OfdmFrameStreamDemod, SCRAMBLER_BEFORE_OUTER, SCRAMBLER_AFTER_INNER,
)

FS = 1e6


def _cfg(**kw):
    plan = CarrierPlan(256, 64).with_contiguous_data(edge_guard=16)
    return OfdmConfig(plan, fs=FS, **kw)


def _pre(plan_n=256, cp=64):
    return OfdmPreamble(repeat_len=128, num_repeats=4).with_training_symbol(
        plan_n, cp)


def _roundtrip(cfg, table, payload, mcs=1, seq=3, seed=0x11):
    pre = _pre()
    iq = OfdmFrameMod(cfg, table, pre).modulate_frame(
        FramePacket(FrameMetadata(seq, mcs), payload), seed)
    out = OfdmFrameDemod(cfg, table).decode(iq[pre.total_len():])
    assert np.array_equal(out.payload, payload)
    assert out.metadata.sequence_num == seq and out.metadata.mcs_index == mcs
    return out


def _payload(n, seed):
    return np.random.default_rng(seed).integers(0, 256, n).astype(np.uint8)


# ── header CRC kind × payload CRC kind ───────────────────────────────────────

@pytest.mark.parametrize("hdr_crc", ["crc16", "crc32"])
@pytest.mark.parametrize("pay_crc", ["crc16", "crc32"])
def test_crc_kind_combinations(hdr_crc, pay_crc):
    cfg = _cfg().with_header_crc(hdr_crc).with_payload_crc(pay_crc)
    _roundtrip(cfg, McsTable.default_ladder(), _payload(120, 1))


# ── scrambler kind × position ────────────────────────────────────────────────

@pytest.mark.parametrize("pos", [SCRAMBLER_BEFORE_OUTER, SCRAMBLER_AFTER_INNER])
@pytest.mark.parametrize("scr", ["additive", "dvb"])
def test_scrambler_kind_position(scr, pos):
    s = (ScramblerKind.additive(0b1001, 15, 0x7A5) if scr == "additive"
         else ScramblerKind.dvb_t_energy_dispersal())
    cfg = _cfg().with_scrambler(s).with_scrambler_pos(pos)
    _roundtrip(cfg, McsTable.default_ladder(), _payload(150, 2))


def test_scrambler_per_frame_random_seed_roundtrips():
    cfg = _cfg().with_scrambler(
        ScramblerKind.additive(0b1001, 15, per_frame=True))
    cfg.validate()
    table = McsTable.default_ladder()
    pre = _pre()
    mod = OfdmFrameMod(cfg, table, pre)
    payload = _payload(90, 3)
    # two frames must scramble differently yet both decode
    iq1 = mod.modulate_frame(FramePacket(FrameMetadata(0, 1), payload), 0xAA)
    iq2 = mod.modulate_frame(FramePacket(FrameMetadata(1, 1), payload), 0xBB)
    assert not np.array_equal(iq1, iq2)
    demod = OfdmFrameDemod(cfg, table)
    for iq in (iq1, iq2):
        out = demod.decode(iq[pre.total_len():])
        assert np.array_equal(out.payload, payload)


# ── interleaver kinds on both positions ──────────────────────────────────────

@pytest.mark.parametrize("outer_il,inner_il", [
    (InterleaverKind.block(8, 16), InterleaverKind.none()),
    (InterleaverKind.none(), InterleaverKind.block(16, 32)),
    (InterleaverKind.block(8, 16), InterleaverKind.block(16, 32)),
    (InterleaverKind.convolutional(12, 17), InterleaverKind.none()),
    (InterleaverKind.convolutional(4, 5), InterleaverKind.block(8, 8)),
])
def test_interleaver_combinations(outer_il, inner_il):
    cfg = (_cfg().with_outer_interleaver(outer_il)
           .with_inner_interleaver(inner_il))
    _roundtrip(cfg, McsTable.default_ladder(), _payload(140, 4))


# ── MCS ladder sweep with burst errors ───────────────────────────────────────

@pytest.mark.parametrize("mcs", [0, 1, 2, 3])
def test_mcs_ladder_with_channel_noise(mcs):
    cfg = _cfg()
    table = McsTable.default_ladder()
    payload = _payload(110, 5 + mcs)
    pre = _pre()
    iq = OfdmFrameMod(cfg, table, pre).modulate_frame(
        FramePacket(FrameMetadata(0, mcs), payload), 1)
    body = iq[pre.total_len():]
    rng = np.random.default_rng(mcs)
    sig = float(np.mean(np.abs(body) ** 2))
    scale = [0.15, 0.1, 0.05, 0.02][mcs]     # higher orders need more SNR
    noise = (rng.standard_normal(len(body)) +
             1j * rng.standard_normal(len(body))
             ).astype(np.complex64) * np.sqrt(sig * scale / 2)
    out = OfdmFrameDemod(cfg, table).decode(body + noise)
    assert np.array_equal(out.payload, payload)


# ── custom MCS tables (conv inner, RS outer) ─────────────────────────────────

@pytest.mark.parametrize("rate", ["1/2", "2/3", "3/4"])
def test_custom_mcs_conv_rs(rate):
    cfg = _cfg().with_outer_interleaver(InterleaverKind.convolutional(12, 17))
    table = McsTable([Mcs("qpsk", InnerFec.convolutional(rate, "dvb_k7"),
                          OuterFec.reed_solomon(60, 8))])
    _roundtrip(cfg, table, _payload(130, 7), mcs=0)


@pytest.mark.parametrize("ldpc", ["N512R12", "N576R23", "N512R34"])
def test_custom_mcs_ldpc_codes(ldpc):
    table = McsTable([Mcs("qpsk", InnerFec.ldpc(ldpc), OuterFec.bch(4))])
    _roundtrip(_cfg(), table, _payload(100, 8), mcs=0)


@pytest.mark.parametrize("order", ["bpsk", "qpsk", "qam16", "qam64",
                                   "qam256"])
def test_all_constellations_frame(order):
    table = McsTable([Mcs(order, InnerFec.ldpc("N512R12"), OuterFec.bch(8))])
    _roundtrip(_cfg(), table, _payload(100, 9), mcs=0)


# ── ldpc decode rule selection end-to-end ────────────────────────────────────

@pytest.mark.parametrize("rule", ["sum_product", "min_sum", "scaled_min_sum"])
def test_ldpc_decode_rule_end_to_end(rule):
    cfg = _cfg().with_ldpc_decode_rule(rule)
    _roundtrip(cfg, McsTable.default_ladder(), _payload(100, 10))


# ── stream-hold / failure semantics ──────────────────────────────────────────

def test_stream_hold_across_many_tiny_feeds():
    cfg = _cfg()
    table = McsTable.default_ladder()
    payload = _payload(80, 11)
    pre = _pre()
    iq = OfdmFrameMod(cfg, table, pre).modulate_frame(
        FramePacket(FrameMetadata(9, 1), payload), 2)
    s = OfdmFrameStreamDemod(cfg, table, pre)
    res = []
    step = 509                                  # prime-size feeds
    for i in range(0, len(iq), step):
        res += s.feed(iq[i:i + step])
    res += s.flush()
    ok = [r for r in res if hasattr(r, "packet")]
    assert len(ok) == 1 and np.array_equal(ok[0].packet.payload, payload)
    assert not [r for r in res if isinstance(r, RxError)]


def test_stream_corrupt_frame_then_clean_frame():
    """A corrupted body emits an error and the receiver re-syncs onto the
    following clean frame (skip-past-preamble semantics)."""
    cfg = _cfg()
    table = McsTable.default_ladder()
    pre = _pre()
    p1, p2 = _payload(90, 12), _payload(90, 13)
    mod = OfdmFrameMod(cfg, table, pre)
    iq1 = mod.modulate_frame(FramePacket(FrameMetadata(0, 1), p1), 3)
    iq2 = mod.modulate_frame(FramePacket(FrameMetadata(1, 1), p2), 4)
    bad = iq1.copy()
    body_start = pre.total_len()
    bad[body_start + 200: body_start + 3000] = 0   # wreck the payload
    buf = np.concatenate([bad, np.zeros(300, np.complex64), iq2])
    s = OfdmFrameStreamDemod(cfg, table, pre)
    res = s.feed(buf) + s.flush()
    frames = [r for r in res if hasattr(r, "packet")]
    errors = [r for r in res if isinstance(r, RxError)]
    assert errors, "corrupt frame must surface a typed error"
    assert len(frames) == 1 and np.array_equal(frames[0].packet.payload, p2)


def test_stream_clear_resets_buffer():
    cfg = _cfg()
    table = McsTable.default_ladder()
    pre = _pre()
    payload = _payload(80, 14)
    iq = OfdmFrameMod(cfg, table, pre).modulate_frame(
        FramePacket(FrameMetadata(0, 1), payload), 5)
    s = OfdmFrameStreamDemod(cfg, table, pre)
    s.feed(iq[: len(iq) // 2])
    assert len(s) > 0
    s.clear()
    assert len(s) == 0
    # the half-frame is gone: feeding the rest yields nothing decodable
    res = s.feed(iq[len(iq) // 2:]) + s.flush()
    assert not [r for r in res if hasattr(r, "packet")]


def test_unknown_mcs_index_is_malformed_header():
    cfg = _cfg()
    table = McsTable.default_ladder()
    pre = _pre()
    payload = _payload(60, 15)
    # modulate with a one-entry table at index 0, decode with a table whose
    # get(0) is missing → malformed header
    tx_table = McsTable.default_ladder()
    iq = OfdmFrameMod(cfg, tx_table, pre).modulate_frame(
        FramePacket(FrameMetadata(0, 3), payload), 6)

    class Empty:
        def get(self, i):
            return None
    with pytest.raises(RxError):
        OfdmFrameDemod(cfg, Empty()).decode(iq[pre.total_len():])
