"""GPS LNAV message layer: parity, subframe codec, ephemeris, PVT.

Completes the GNSS family's codec → capture decode arc (VERDICT r3 item 8).
"""
import os

import numpy as np
import pytest

import orion_sdr_tpu as sdr
from orion_sdr_tpu.gnss_nav import (GPS_MU, GPS_OMEGA_E, _solve_tail,
                                    nav_word_encode, nav_word_check)


EPH = sdr.GpsEphemeris(
    week=221, ura=1, sv_health=0, iodc=0x1A7, t_gd=-5.12e-9,
    t_oc=302400.0, a_f2=0.0, a_f1=-3.1e-12, a_f0=4.57e-4,
    iode=0xA7, c_rs=-112.8125, delta_n=4.3e-9, m0=1.23456,
    c_uc=-6.3e-6, e=0.0123456, c_us=5.2e-6, sqrt_a=5153.712,
    t_oe=302400.0, c_ic=1.1e-7, omega0=-2.2345, c_is=-9.3e-8,
    i0=0.9617, c_rc=287.46875, omega=2.7182, omega_dot=-8.1e-9,
    idot=4.0e-10,
)


def test_word_parity_roundtrip_all_seeds():
    rng = np.random.default_rng(0)
    for d29s in (0, 1):
        for d30s in (0, 1):
            for _ in range(20):
                d = int(rng.integers(0, 1 << 24))
                w = nav_word_encode(d, d29s, d30s)
                assert nav_word_check(w, d29s, d30s) == d


def test_word_parity_detects_any_single_bit_error():
    w = nav_word_encode(0x8B0123, 0, 0)
    for i in range(30):
        bad = w.copy()
        bad[i] ^= 1
        assert nav_word_check(bad, 0, 0) is None


def test_solved_tail_zeroes_trailing_parity():
    for d29s in (0, 1):
        for d30s in (0, 1):
            w = nav_word_encode(_solve_tail(0x2ABCDE >> 2, d29s, d30s),
                                d29s, d30s)
            assert w[28] == 0 and w[29] == 0


def test_subframe_roundtrip_ephemeris():
    bits = sdr.nav_subframes_encode(EPH, tow_count_start=201600)
    assert bits.shape == (1500,)
    frame = sdr.nav_subframes_decode(bits)
    assert [s.sfid for s in frame.subframes] == [1, 2, 3, 4, 5]
    # HOW carries the NEXT subframe's start time
    assert frame.subframes[0].tow_s == (201600 + 4) * 1.5
    d = frame.ephemeris
    assert d is not None
    assert (d.week, d.iodc, d.iode) == (EPH.week, EPH.iodc, EPH.iode)
    # quantization: each field must round-trip within one wire LSB
    for name, scale in [
        ("t_gd", 2**-31), ("a_f1", 2**-43), ("a_f0", 2**-31),
        ("c_rs", 2**-5), ("c_uc", 2**-29), ("c_us", 2**-29),
        ("c_ic", 2**-29), ("c_is", 2**-29), ("c_rc", 2**-5),
        ("e", 2**-33), ("sqrt_a", 2**-19),
    ]:
        assert abs(getattr(d, name) - getattr(EPH, name)) <= scale, name
    for name in ("m0", "omega0", "i0", "omega"):
        assert abs(getattr(d, name) - getattr(EPH, name)) <= np.pi * 2**-31
    for name in ("delta_n", "omega_dot", "idot"):
        assert abs(getattr(d, name) - getattr(EPH, name)) <= np.pi * 2**-43
    assert d.t_oc == EPH.t_oc and d.t_oe == EPH.t_oe


def test_subframe_decode_inverted_polarity_and_offset():
    bits = sdr.nav_subframes_encode(EPH)
    lead = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1], np.uint8)
    stream = np.concatenate([lead, 1 - bits])        # inverted + offset
    frame = sdr.nav_subframes_decode(stream)
    assert frame.ephemeris is not None
    assert frame.ephemeris.iodc == EPH.iodc


def test_subframe_parity_error_drops_subframe():
    bits = sdr.nav_subframes_encode(EPH)
    bad = bits.copy()
    bad[300 + 95] ^= 1                                # inside subframe 2
    frame = sdr.nav_subframes_decode(bad)
    assert 2 not in [s.sfid for s in frame.subframes]
    assert frame.ephemeris is None                    # SF2 lost


def test_eph_sat_pos_orbit_sanity():
    p1 = sdr.eph_sat_pos(EPH, EPH.t_oe)
    r = np.linalg.norm(p1)
    # GPS semi-major axis ~26560 km; small e keeps |r| within ~2%
    assert 25.9e6 < r < 27.2e6
    # 45 min later (~1/16 orbit + earth rotation) the chord is ~0.3 r
    p2 = sdr.eph_sat_pos(EPH, EPH.t_oe + 2700.0)
    assert np.linalg.norm(p2 - p1) > 0.2 * r
    # ECEF speed = inertial (~n0*r ≈ 3.9 km/s) minus the earth-rotation
    # carry (ω_e*r*cos(i-ish) ≈ 1.9 km/s), so anywhere in 2-4 km/s is sane
    dt = 10.0
    p3 = sdr.eph_sat_pos(EPH, EPH.t_oe + dt)
    v = np.linalg.norm(p3 - p1) / dt
    n0 = np.sqrt(GPS_MU / EPH.sqrt_a**6)
    w_e = GPS_OMEGA_E * r
    assert n0 * r - w_e - 300 < v < n0 * r + w_e + 300


def test_gps_fix_recovers_position_and_clock():
    rng = np.random.default_rng(3)
    truth = np.array([1113194.0, -4842168.0, 3985243.0])
    bias = 8500.0                                     # meters (~28 us)
    sats = []
    for k in range(6):
        e = sdr.GpsEphemeris(
            sqrt_a=5153.7, e=0.01, m0=k * 1.05, omega0=k * 1.0,
            i0=0.96, omega=0.3 * k, t_oe=302400.0)
        sats.append(sdr.eph_sat_pos(e, 302400.0 + 40.0 * k))
    sats = np.stack(sats)
    pr = np.linalg.norm(sats - truth, axis=1) + bias \
        + rng.normal(0, 0.5, len(sats))
    pos, b = sdr.gps_fix(sats, pr)
    assert np.linalg.norm(pos - truth) < 5.0
    assert abs(b - bias) < 5.0


def test_gps_fix_requires_four_sats():
    with pytest.raises(ValueError):
        sdr.gps_fix(np.zeros((3, 3)), np.zeros(3))


@pytest.mark.skipif(not os.environ.get("ORION_SDR_TPU_PERF"),
                    reason="tier 3: ~3 min CPU (19 s capture, 2 tracks); "
                           "verified green 2026-08-19 (175 s)")
def test_two_satellite_capture_to_ephemeris_roundtrip():
    """Synthesized 2-SV capture → acquire → track → nav bits → parity →
    ephemeris fields, per satellite (the full codec → capture decode arc).
    ~19 s of signal: three subframes at 50 bps plus tracking settle."""
    FS = 2.048e6
    eph2 = sdr.GpsEphemeris(
        week=222, ura=2, sv_health=0, iodc=0x055, t_gd=3.1e-9,
        t_oc=54000.0, a_f2=0.0, a_f1=1.2e-12, a_f0=-2.3e-4,
        iode=0x55, c_rs=54.03125, delta_n=5.1e-9, m0=-2.5,
        c_uc=3.1e-6, e=0.0045, c_us=-1.2e-6, sqrt_a=5153.655,
        t_oe=54000.0, c_ic=-6.5e-8, omega0=1.75, c_is=4.1e-8,
        i0=0.9722, c_rc=-198.5, omega=-0.77, omega_dot=-7.7e-9,
        idot=-2.5e-10)
    rng = np.random.default_rng(9)
    svs = [(7, 1200.0, 101.7, 1.0, EPH), (13, -2600.0, 512.2, 0.8, eph2)]
    streams = {}
    n_bits = 30 + 900 + 6
    n_ms = n_bits * 20 + 15
    n = int(FS * 1e-3) * n_ms
    z = (0.25 / np.sqrt(2) * (rng.standard_normal(n)
                              + 1j * rng.standard_normal(n))
         ).astype(np.complex64)
    for prn, dopp, chips, amp, eph in svs:
        bits = np.concatenate([
            rng.integers(0, 2, 30).astype(np.uint8),
            sdr.nav_subframes_encode(eph)[:900],
            rng.integers(0, 2, 6).astype(np.uint8)])
        streams[prn] = bits
        z = z + sdr.gps_ca_mod(prn, FS, n_ms, dopp, chips, nav_bits=bits,
                               amplitude=amp,
                               carrier_phase=rng.uniform(0, 2 * np.pi))
    for prn, dopp, chips, amp, eph in svs:
        frame = sdr.gps_decode_ephemeris(z, FS, prn)
        d = frame.ephemeris
        assert d is not None, f"PRN {prn}: no ephemeris decoded"
        assert d.iodc == eph.iodc and d.iode == eph.iode
        assert d.week == eph.week
        assert abs(d.sqrt_a - eph.sqrt_a) <= 2**-19
        assert abs(d.e - eph.e) <= 2**-33
        assert abs(d.m0 - eph.m0) <= np.pi * 2**-31
        assert abs(d.omega0 - eph.omega0) <= np.pi * 2**-31
        assert d.t_oe == eph.t_oe
        # and the decoded ephemeris places the satellite on a GPS orbit
        r = np.linalg.norm(sdr.eph_sat_pos(d, d.t_oe))
        assert 25.9e6 < r < 27.2e6


def test_capture_to_ephemeris_single_subframe_bits():
    """Bits → frame machinery over a tracked-bits-shaped stream: encode,
    embed at a bit offset with noise-free polarity flip, decode."""
    bits = sdr.nav_subframes_encode(EPH, tow_count_start=4)
    rng = np.random.default_rng(5)
    stream = np.concatenate([
        rng.integers(0, 2, 17).astype(np.uint8), bits])
    frame = sdr.nav_subframes_decode(stream)
    assert frame.ephemeris is not None
    assert frame.ephemeris.sqrt_a == pytest.approx(EPH.sqrt_a, abs=2**-19)
