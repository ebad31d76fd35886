"""FT8 message-layer permutation matrix — deepens coverage toward the
reference's message unit tier (callsign packing classes, grid/report
extras, hash-table behavior, free-text alphabet bounds)."""

import numpy as np
import pytest

from orion_sdr_tpu.message import (
    pack77, unpack77, CallsignHashTable, Standard, FreeText, Telemetry,
    NonStd, hash22, packgrid, unpackgrid,
)
from orion_sdr_tpu.message.callsign import (
    pack_basecall, pack28, unpack28, pack58, unpack58,
)


# ── standard-callsign classes (ft8_lib-compatible packing) ───────────────────

@pytest.mark.parametrize("call", [
    "K1A",          # 1x1-ish short
    "KA1ABC",       # classic 2x3
    "W9XYZ",        # 1x3
    "VK9ABC",       # prefix with digit
    "G4AAA",        # UK style
    "9H1A",         # leading digit country
])
def test_basecall_pack_unpack(call):
    ht = CallsignHashTable()
    r = pack28(call, ht)
    assert r is not None
    n28, ip = r
    assert unpack28(n28, ip, 1, ht) == call


@pytest.mark.parametrize("special,expected", [
    ("CQ", "CQ"), ("DE", "DE"), ("QRZ", "QRZ")])
def test_special_tokens_roundtrip(special, expected):
    ht = CallsignHashTable()
    n28, ip = pack28(special, ht)
    assert unpack28(n28, ip, 1, ht) == expected


@pytest.mark.parametrize("extra", ["", "73", "RRR", "RR73", "FN42", "R-07",
                                   "+03", "-15", "R+12"])
def test_standard_message_extras(extra):
    ht = CallsignHashTable()
    msg = Standard("KA1ABC", "W9XYZ", extra)
    out = unpack77(pack77(msg, ht), ht)
    assert isinstance(out, Standard)
    assert out.call_to == "KA1ABC" and out.call_de == "W9XYZ"
    assert out.extra == extra


def test_grid_pack_unpack_corners():
    for g in ("AA00", "RR99", "JN58", "FN42", "RRR", "RR73", "73", ""):
        igrid, ir = packgrid(g)
        assert unpackgrid(igrid, ir) == g


def test_hashed_nonstd_callsign_resolves_after_save():
    """The standard call travels as a 12-bit hash in an i3=4 message; the
    receiver resolves it only once the full call was heard (saved) —
    ft8_lib semantics. The nonstandard call itself travels in full 58 bits."""
    ht_tx = CallsignHashTable()
    ht_rx = CallsignHashTable()
    msg = NonStd("PJ4/KA1ABC", "W9XYZ", "")
    payload = pack77(msg, ht_tx)
    out_cold = unpack77(payload, ht_rx)     # hash unknown → placeholder
    assert isinstance(out_cold, NonStd)
    assert "<" in out_cold.call_to          # hashed side unresolved
    ht_rx.save("PJ4/KA1ABC")
    out_warm = unpack77(payload, ht_rx)
    # resolved hashed callsigns keep ft8_lib's angle-bracket display form
    assert out_warm.call_to == "<PJ4/KA1ABC>"
    assert out_warm.call_de == "W9XYZ"


def test_hash22_matches_itself_and_differs_across_calls():
    a = hash22("KA1ABC")
    assert a == hash22("KA1ABC")
    assert a != hash22("W9XYZ")
    assert 0 <= a < (1 << 22)


def test_pack58_unpack58_compound():
    ht = CallsignHashTable()
    n58 = pack58("PJ4/K1ABC", ht)
    assert n58 is not None
    assert unpack58(n58, ht) == "PJ4/K1ABC"


# ── free text: alphabet and length bounds ────────────────────────────────────

def test_free_text_over_13_chars_unencodable():
    # 13-char base-42 limit: longer texts are unencodable (None), matching
    # the reference's Option return
    assert pack77(FreeText("hello world this is too long")) is None


@pytest.mark.parametrize("text", ["TNX 73", "R 579 MA", "A/B.C?1+2-3"])
def test_free_text_alphabet_roundtrip(text):
    ht = CallsignHashTable()
    out = unpack77(pack77(FreeText(text), ht), ht)
    assert out.text.strip() == text


# ── telemetry: 71-bit limit ──────────────────────────────────────────────────

def test_telemetry_roundtrip_and_msb_mask():
    ht = CallsignHashTable()
    data = bytes([0x07] + list(range(1, 9)))    # 71 bits max (top 5 of 9B?)
    out = unpack77(pack77(Telemetry(bytes(9)), ht), ht)
    assert isinstance(out, Telemetry)
    rng = np.random.default_rng(0)
    raw = bytearray(rng.integers(0, 256, 9).astype(np.uint8).tobytes())
    raw[0] &= 0x7F                               # 71-bit payload
    out = unpack77(pack77(Telemetry(bytes(raw)), ht), ht)
    assert bytes(out.data) == bytes(raw)


# ── payload bit-exactness across the codec boundary ──────────────────────────

def test_pack77_payload_is_10_bytes_77_bits():
    ht = CallsignHashTable()
    p = pack77(Standard("CQ", "KA1ABC", "FN42"), ht)
    p = np.frombuffer(bytes(p), np.uint8)
    assert len(p) == 10
    assert p[9] & 0x07 == 0                      # only 77 of 80 bits used
