"""ADS-B 1090ES (Mode S DF17) — beyond the reference (no aviation modes).
CRC-24 wire compat against a published real-world frame, CPR global
decode, PPM capture decode with co-channel aircraft."""

import numpy as np
import pytest

from orion_sdr_tpu.codec import adsb as A
from orion_sdr_tpu.modulate.adsb import adsb_mod, adsb_frame_chips
from orion_sdr_tpu.demodulate.adsb import adsb_decode_capture

FS = 8_000_000.0


def test_real_world_frame_wire_compat():
    """The documented DF17 example 8D4840D6202CC371C32CE0576098 must decode
    to ICAO 4840D6, callsign KLM1023 — proves CRC-24, bit order, and the
    6-bit charset match deployed ADS-B."""
    bits = np.unpackbits(np.frombuffer(
        bytes.fromhex("8D4840D6202CC371C32CE0576098"), np.uint8))
    m = A.adsb_decode_frame(bits)
    assert m is not None and m.icao == 0x4840D6 and m.callsign == "KLM1023"


def test_crc_rejects_bit_error():
    f = A.adsb_encode_identification(0x123456, "TEST123")
    assert A.adsb_decode_frame(f) is not None
    bad = f.copy()
    bad[40] ^= 1
    assert A.adsb_decode_frame(bad) is None


def test_identification_roundtrip():
    m = A.adsb_decode_frame(A.adsb_encode_identification(0xABCDEF, "ORION1"))
    assert m.icao == 0xABCDEF and m.callsign == "ORION1"


@pytest.mark.parametrize("lat,lon", [(52.2572, 3.91937), (-33.9, 151.2),
                                     (0.01, -0.01), (65.0, -179.5)])
def test_cpr_global_pair_decode(lat, lon):
    even = A.cpr_encode(lat, lon, 0)
    odd = A.cpr_encode(lat, lon, 1)
    pos = A.cpr_decode_global(even, odd, most_recent_odd=True)
    assert pos is not None
    assert abs(pos[0] - lat) < 5e-3 and abs(pos[1] - lon) < 5e-3


def test_altitude_q_bit_roundtrip():
    for alt in (1000, 12575, 38000, 50175):
        m = A.adsb_decode_frame(A.adsb_encode_position(1, 10.0, 20.0, alt, 0))
        assert m.altitude_ft == alt


def test_velocity_roundtrip():
    for gs, trk in ((450.0, 245.0), (120.0, 10.0), (800.0, 359.0)):
        m = A.adsb_decode_frame(A.adsb_encode_velocity(1, gs, trk))
        assert abs(m.ground_speed_kt - gs) < 2.0
        assert min(abs(m.track_deg - trk), 360 - abs(m.track_deg - trk)) < 1.0


def test_capture_decode_busy_sky():
    """Five frames from two aircraft at mixed amplitudes in one noisy
    capture: all recovered, position resolved from the CPR pair."""
    frames = [
        A.adsb_encode_identification(0x4840D6, "KLM1023"),
        A.adsb_encode_position(0x4840D6, 52.2572, 3.91937, 38000, odd=0),
        A.adsb_encode_position(0x4840D6, 52.2572, 3.91937, 38000, odd=1),
        A.adsb_encode_velocity(0x4840D6, 450.0, 245.0),
        A.adsb_encode_identification(0xA1B2C3, "N123AB"),
    ]
    iq = adsb_mod(frames, FS, amplitudes=[1.0, 0.8, 0.8, 0.7, 0.3])
    rng = np.random.default_rng(0)
    iq = iq + ((rng.standard_normal(len(iq)) + 1j * rng.standard_normal(
        len(iq))).astype(np.complex64) * 0.05)
    msgs = adsb_decode_capture(iq, FS)
    assert len(msgs) == 5
    by_icao = {}
    for m in msgs:
        by_icao.setdefault(m.icao, []).append(m)
    assert {m.callsign for m in by_icao[0x4840D6] if m.callsign} == {"KLM1023"}
    pos = [m.position for m in by_icao[0x4840D6] if m.position]
    assert pos and abs(pos[0][0] - 52.2572) < 5e-3
    assert by_icao[0xA1B2C3][0].callsign == "N123AB"


def test_capture_validation_and_empty():
    with pytest.raises(ValueError):
        adsb_decode_capture(np.zeros(1000, np.complex64), 3_000_000.0)
    assert adsb_decode_capture(np.zeros(100, np.complex64), FS) == []
    assert adsb_decode_capture(
        np.zeros(20000, np.complex64), FS) == []        # silence: no frames
    with pytest.raises(ValueError):
        adsb_frame_chips(np.zeros(56, np.uint8))
