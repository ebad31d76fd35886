"""AIS (ITU-R M.1371 types 1-3 over GMSK 9600) — beyond the reference
(no marine modes). Field codec, shared-HDLC framing, GMSK phy with
matched receive filtering."""

import numpy as np
import pytest

from orion_sdr_tpu.codec.ais import (AisPosition, ais_encode_position,
                                     ais_parse, ais_frames_to_bits,
                                     ais_bits_to_positions)
from orion_sdr_tpu.modulate.ais import ais_mod
from orion_sdr_tpu.demodulate.ais import ais_decode

FS = 96_000.0
SHIP_A = AisPosition(mmsi=211234567, lat=53.5421, lon=9.9845, sog_kt=12.3,
                     cog_deg=87.5, heading_deg=88, nav_status=0)
SHIP_B = AisPosition(mmsi=244000111, lat=-33.8568, lon=151.2153,
                     sog_kt=0.2, cog_deg=310.0, msg_type=3)


def test_position_field_codec_roundtrip():
    q = ais_parse(ais_encode_position(SHIP_A))
    assert q.mmsi == SHIP_A.mmsi
    assert abs(q.lat - SHIP_A.lat) < 1e-5
    assert abs(q.lon - SHIP_A.lon) < 1e-5
    assert q.sog_kt == 12.3 and q.cog_deg == 87.5 and q.heading_deg == 88
    # heading unavailable encodes as 511 → None
    assert ais_parse(ais_encode_position(
        AisPosition(mmsi=1, lat=0.0, lon=0.0))).heading_deg is None
    # non-position types return None
    bad = ais_encode_position(SHIP_A).copy()
    bad[:6] = [0, 0, 0, 1, 0, 1]      # type 5
    assert ais_parse(bad) is None


def test_bit_layer_roundtrip_two_frames():
    bits = ais_frames_to_bits([ais_encode_position(SHIP_A),
                               ais_encode_position(SHIP_B)])
    got = ais_bits_to_positions(bits)
    assert [g.mmsi for g in got] == [SHIP_A.mmsi, SHIP_B.mmsi]
    # a corrupted frame is FCS-dropped, the other survives
    bad = bits.copy()
    bad[60] ^= 1
    got2 = ais_bits_to_positions(bad)
    assert len(got2) == 1


def test_gmsk_end_to_end_awgn():
    iq = ais_mod([SHIP_A, SHIP_B])
    got = ais_decode(np.concatenate([np.zeros(500, np.complex64), iq]), FS)
    assert [g.mmsi for g in got] == [SHIP_A.mmsi, SHIP_B.mmsi]
    assert abs(got[1].lat - SHIP_B.lat) < 1e-5
    ok = 0
    for seed in range(5):
        rng = np.random.default_rng(seed)
        z = iq + ((rng.standard_normal(len(iq))
                   + 1j * rng.standard_normal(len(iq))).astype(np.complex64)
                  * np.sqrt(1.0 / 10 / 2))              # 10 dB
        ok += len(ais_decode(z, FS)) == 2
    assert ok == 5


def test_ais_validation():
    with pytest.raises(ValueError):
        ais_mod([SHIP_A], fs=19_200.0)
    assert ais_decode(np.zeros(50_000, np.complex64), FS) == []
