"""GPS LNAV navigation-message layer (IS-GPS-200 wire format).

Beyond the reference's mode set (no GNSS in /root/reference): completes the
GPS receiver the way the framework's other modes are completed — codec
(subframe encode for test synthesis), wire-format decode (word parity,
TLM/HOW, subframe 1-3 ephemeris fields), and the orbital/PVT math
(Kepler satellite position from ephemeris, iterative least-squares fix).

Wire compatibility: the (32, 26) extended-Hamming word parity (Table
20-XIV), the D30*-complement data encoding, the solved non-information
bits of HOW and word 10 (forcing D29 = D30 = 0 so every subframe starts
parity-independent), and the subframe 1-3 field layouts/scale factors
(Tables 20-I, 20-III) follow IS-GPS-200. All parsing is host-side numpy —
nav bits arrive at 50 bps, so there is nothing for the device to win here;
the device programs end at `gnss.gps_track`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import numpy as np

from .gnss import GPS_NAV_PREAMBLE, gps_nav_frame_sync

# WGS-84 / IS-GPS-200 constants
GPS_MU = 3.986005e14            # m^3/s^2
GPS_OMEGA_E = 7.2921151467e-5   # rad/s
GPS_PI = 3.1415926535898        # the ICD's fixed pi (semicircle scaling)
GPS_C = 2.99792458e8            # m/s

# parity taps: 1-based data-bit index sets for D25..D30 (Table 20-XIV)
_PARITY_TAPS = (
    (1, 2, 3, 5, 6, 10, 11, 12, 13, 14, 17, 18, 20, 23),
    (2, 3, 4, 6, 7, 11, 12, 13, 14, 15, 18, 19, 21, 24),
    (1, 3, 4, 5, 7, 8, 12, 13, 14, 15, 16, 19, 20, 22),
    (2, 4, 5, 6, 8, 9, 13, 14, 15, 16, 17, 20, 21, 23),
    (1, 3, 5, 6, 7, 9, 10, 14, 15, 16, 17, 18, 21, 22, 24),
    (3, 5, 6, 8, 9, 10, 11, 13, 15, 19, 22, 23, 24),
)
# D25..D28 and D30 seed from D29*; D29 seeds from D30* — per the table
_PARITY_SEED_IS_D29 = (True, False, True, False, False, True)


def _bits_of(value: int, width: int) -> np.ndarray:
    return np.array([(value >> (width - 1 - i)) & 1 for i in range(width)],
                    np.uint8)


def _int_of(bits) -> int:
    v = 0
    for b in np.asarray(bits).astype(int):
        v = (v << 1) | (b & 1)
    return v


def nav_word_encode(d24: int, d29s: int, d30s: int) -> np.ndarray:
    """Encode 24 data bits into a 30-bit word given the previous word's
    last two bits D29*, D30*. Data bits transmit complemented by D30*."""
    d = _bits_of(d24, 24)
    seeds = (d29s, d30s)
    par = []
    for taps, from29 in zip(_PARITY_TAPS, _PARITY_SEED_IS_D29):
        p = seeds[0] if from29 else seeds[1]
        for t in taps:
            p ^= int(d[t - 1])
        par.append(p)
    out = np.concatenate([d ^ d30s, np.array(par, np.uint8)])
    return out.astype(np.uint8)


def nav_word_check(word30, d29s: int, d30s: int) -> Optional[int]:
    """Parity-check one received 30-bit word; returns the 24 decoded data
    bits as an int, or None on parity failure."""
    w = np.asarray(word30).astype(np.uint8) % 2
    if w.shape != (30,):
        raise ValueError("nav word must be 30 bits")
    d = (w[:24] ^ d30s).astype(np.uint8)
    seeds = (d29s, d30s)
    for taps, from29, rx in zip(_PARITY_TAPS, _PARITY_SEED_IS_D29, w[24:]):
        p = seeds[0] if from29 else seeds[1]
        for t in taps:
            p ^= int(d[t - 1])
        if p != int(rx):
            return None
    return _int_of(d)


def _solve_tail(d22: int, d29s: int, d30s: int) -> int:
    """Choose the two non-information bits (d23, d24) of HOW / word 10 so
    the word's D29 = D30 = 0 (IS-GPS-200 20.3.3.2: keeps every following
    word's data independent of this one's parity state)."""
    for tail in range(4):
        d24 = (d22 << 2) | tail
        w = nav_word_encode(d24, d29s, d30s)
        if w[28] == 0 and w[29] == 0:
            return d24
    raise AssertionError("unreachable: the tail bits span the parity coset")


def _twos(value: float, scale_pow2: int, bits: int) -> int:
    """Quantize to two's complement with LSB 2**scale_pow2."""
    q = int(round(value / (2.0 ** scale_pow2)))
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if not lo <= q <= hi:
        raise ValueError(f"field overflow: {value} in {bits} bits")
    return q & ((1 << bits) - 1)


def _untwos(raw: int, scale_pow2: int, bits: int) -> float:
    if raw >= (1 << (bits - 1)):
        raw -= 1 << bits
    return raw * (2.0 ** scale_pow2)


def _uns(value: float, scale_pow2: int, bits: int) -> int:
    q = int(round(value / (2.0 ** scale_pow2)))
    if not 0 <= q < (1 << bits):
        raise ValueError(f"field overflow: {value} in {bits} bits")
    return q


@dataclass(frozen=True)
class GpsEphemeris:
    """Subframe 1-3 clock + ephemeris. Angles in RADIANS (converted from
    the wire's semicircles), times in seconds, per IS-GPS-200 scaling."""
    week: int = 0
    ura: int = 0
    sv_health: int = 0
    iodc: int = 0
    t_gd: float = 0.0
    t_oc: float = 0.0
    a_f2: float = 0.0
    a_f1: float = 0.0
    a_f0: float = 0.0
    iode: int = 0
    c_rs: float = 0.0
    delta_n: float = 0.0          # rad/s
    m0: float = 0.0               # rad
    c_uc: float = 0.0
    e: float = 0.0
    c_us: float = 0.0
    sqrt_a: float = 0.0           # sqrt(m)
    t_oe: float = 0.0
    c_ic: float = 0.0
    omega0: float = 0.0           # rad
    c_is: float = 0.0
    i0: float = 0.0               # rad
    c_rc: float = 0.0
    omega: float = 0.0            # rad
    omega_dot: float = 0.0        # rad/s
    idot: float = 0.0             # rad/s


_SEMI = GPS_PI                    # semicircles → radians


def _sc(rad: float) -> float:
    return rad / _SEMI


def _rad(semi: float) -> float:
    return semi * _SEMI


def nav_subframes_encode(eph: GpsEphemeris, tow_count_start: int = 0
                         ) -> np.ndarray:
    """Encode one full 1500-bit LNAV frame (subframes 1..5; 4/5 carry
    zero-filled reserved pages). ``tow_count_start``: 1.5-s TOW count at
    the start of subframe 1 (multiple of 4). Returns (1500,) uint8."""
    if tow_count_start % 4:
        raise ValueError("subframes start on 6 s epochs (TOW multiple of 4)")

    def tlm() -> int:
        return (_int_of(GPS_NAV_PREAMBLE) << 16) | (0 << 2) | 0

    def sf_words(sfid: int, data_words: List[int], tow_next: int,
                 d29s: int, d30s: int) -> List[np.ndarray]:
        words = []
        w = nav_word_encode(tlm(), d29s, d30s)
        words.append(w)
        d29s, d30s = int(w[28]), int(w[29])
        how22 = ((tow_next // 4) << 5) | (0 << 4) | (0 << 3) | sfid
        w = nav_word_encode(_solve_tail(how22, d29s, d30s), d29s, d30s)
        words.append(w)
        d29s, d30s = int(w[28]), int(w[29])
        for k, dw in enumerate(data_words):
            if k == len(data_words) - 1:            # word 10: solved tail
                w = nav_word_encode(_solve_tail(dw, d29s, d30s), d29s, d30s)
            else:
                w = nav_word_encode(dw, d29s, d30s)
            words.append(w)
            d29s, d30s = int(w[28]), int(w[29])
        return words

    e = eph
    iodc10, iode8 = e.iodc & 0x3FF, e.iode & 0xFF
    sf1 = [
        ((e.week & 0x3FF) << 14) | (1 << 12) | ((e.ura & 0xF) << 8)
        | ((e.sv_health & 0x3F) << 2) | (iodc10 >> 8),
        0, 0, 0,
        _twos(e.t_gd, -31, 8),
        ((iodc10 & 0xFF) << 16) | _uns(e.t_oc, 4, 16),
        (_twos(e.a_f2, -55, 8) << 16) | _twos(e.a_f1, -43, 16),
        _twos(e.a_f0, -31, 22),                      # word 10 head (22 bits)
    ]
    m0_32 = _twos(_sc(e.m0), -31, 32)
    e_32 = _uns(e.e, -33, 32)
    sqa_32 = _uns(e.sqrt_a, -19, 32)
    sf2 = [
        (iode8 << 16) | _twos(e.c_rs, -5, 16),
        (_twos(_sc(e.delta_n) * 1.0, -43, 16) << 8) | (m0_32 >> 24),
        m0_32 & 0xFFFFFF,
        (_twos(e.c_uc, -29, 16) << 8) | (e_32 >> 24),
        e_32 & 0xFFFFFF,
        (_twos(e.c_us, -29, 16) << 8) | (sqa_32 >> 24),
        sqa_32 & 0xFFFFFF,
        (_uns(e.t_oe, 4, 16) << 6) | 0,              # word 10 head (22 bits)
    ]
    om0_32 = _twos(_sc(e.omega0), -31, 32)
    i0_32 = _twos(_sc(e.i0), -31, 32)
    w_32 = _twos(_sc(e.omega), -31, 32)
    sf3 = [
        (_twos(e.c_ic, -29, 16) << 8) | (om0_32 >> 24),
        om0_32 & 0xFFFFFF,
        (_twos(e.c_is, -29, 16) << 8) | (i0_32 >> 24),
        i0_32 & 0xFFFFFF,
        (_twos(e.c_rc, -5, 16) << 8) | (w_32 >> 24),
        w_32 & 0xFFFFFF,
        _twos(_sc(e.omega_dot), -43, 24),
        (iode8 << 14) | (_twos(_sc(e.idot), -43, 14)),  # word 10 head
    ]
    filler = [0] * 7 + [0]

    out = []
    d29s = d30s = 0          # previous subframe's word 10 forces 0, 0
    for sfid, words in ((1, sf1), (2, sf2), (3, sf3),
                        (4, filler), (5, filler)):
        tow_next = tow_count_start + 4 * sfid      # TOW of NEXT subframe
        sw = sf_words(sfid, words, tow_next, d29s, d30s)
        out.extend(sw)
        d29s = d30s = 0                            # word-10 tail solved
    return np.concatenate(out).astype(np.uint8)


class GpsSubframe(NamedTuple):
    sfid: int
    tow_s: float                  # seconds-of-week of the NEXT subframe
    words: List[int]              # ten 24-bit data words


class GpsNavFrame(NamedTuple):
    subframes: List[GpsSubframe]
    ephemeris: Optional[GpsEphemeris]


def nav_subframes_decode(bits) -> GpsNavFrame:
    """Frame-sync a nav bit stream (either polarity), parity-check every
    word, parse TLM/HOW, and assemble the ephemeris once subframes 1-3
    all pass. Subframes with any parity failure are dropped."""
    b = np.asarray(bits).astype(np.uint8) % 2
    start = gps_nav_frame_sync(b)
    if start is None:
        return GpsNavFrame([], None)
    # polarity: the TLM preamble transmits complemented by the previous
    # D30* (= 0 after a solved word 10), so an inverted preamble means an
    # inverted stream
    if not np.array_equal(b[start:start + 8], GPS_NAV_PREAMBLE):
        b = 1 - b
    subframes: List[GpsSubframe] = []
    raw: dict = {}
    pos = start
    while pos + 300 <= len(b):
        d29s = d30s = 0
        words = []
        ok = True
        for w in range(10):
            dw = nav_word_check(b[pos + 30 * w: pos + 30 * (w + 1)],
                                d29s, d30s)
            if dw is None:
                ok = False
                break
            words.append(dw)
            d29s = int(b[pos + 30 * w + 28])
            d30s = int(b[pos + 30 * w + 29])
        pos += 300
        if not ok or not np.array_equal(
                _bits_of(words[0] >> 16, 8), GPS_NAV_PREAMBLE):
            continue
        sfid = (words[1] >> 2) & 0x7
        tow = float((words[1] >> 7) * 6.0)
        subframes.append(GpsSubframe(sfid, tow, words))
        if sfid in (1, 2, 3):
            raw[sfid] = words

    eph = None
    if {1, 2, 3} <= raw.keys():
        w1, w2, w3 = raw[1], raw[2], raw[3]
        iodc = (((w1[2] & 0x3) << 8) | (w1[7] >> 16)) & 0x3FF
        m0 = _rad(_untwos(((w2[3] & 0xFF) << 24) | w2[4], -31, 32))
        ecc = (((w2[5] & 0xFF) << 24) | w2[6]) * 2.0 ** -33
        sqa = (((w2[7] & 0xFF) << 24) | w2[8]) * 2.0 ** -19
        om0 = _rad(_untwos(((w3[2] & 0xFF) << 24) | w3[3], -31, 32))
        i0 = _rad(_untwos(((w3[4] & 0xFF) << 24) | w3[5], -31, 32))
        ww = _rad(_untwos(((w3[6] & 0xFF) << 24) | w3[7], -31, 32))
        eph = GpsEphemeris(
            week=(w1[2] >> 14) & 0x3FF,
            ura=(w1[2] >> 8) & 0xF,
            sv_health=(w1[2] >> 2) & 0x3F,
            iodc=iodc,
            t_gd=_untwos(w1[6] & 0xFF, -31, 8),
            t_oc=float((w1[7] & 0xFFFF) * 16),
            a_f2=_untwos(w1[8] >> 16, -55, 8),
            a_f1=_untwos(w1[8] & 0xFFFF, -43, 16),
            a_f0=_untwos((w1[9] >> 2) & 0x3FFFFF, -31, 22),
            iode=(w2[2] >> 16) & 0xFF,
            c_rs=_untwos(w2[2] & 0xFFFF, -5, 16),
            delta_n=_rad(_untwos((w2[3] >> 8) & 0xFFFF, -43, 16)),
            m0=m0,
            c_uc=_untwos((w2[5] >> 8) & 0xFFFF, -29, 16),
            e=ecc,
            c_us=_untwos((w2[7] >> 8) & 0xFFFF, -29, 16),
            sqrt_a=sqa,
            t_oe=float(((w2[9] >> 8) & 0xFFFF) * 16),
            c_ic=_untwos((w3[2] >> 8) & 0xFFFF, -29, 16),
            omega0=om0,
            c_is=_untwos((w3[4] >> 8) & 0xFFFF, -29, 16),
            i0=i0,
            c_rc=_untwos((w3[6] >> 8) & 0xFFFF, -5, 16),
            omega=ww,
            omega_dot=_rad(_untwos(w3[8], -43, 24)),
            idot=_rad(_untwos((w3[9] >> 2) & 0x3FFF, -43, 14)),
        )
    return GpsNavFrame(subframes, eph)


def eph_sat_pos(eph: GpsEphemeris, t_sow: float) -> np.ndarray:
    """ECEF satellite position (meters) at GPS seconds-of-week ``t_sow``
    from broadcast ephemeris (IS-GPS-200 Table 20-IV algorithm)."""
    A = eph.sqrt_a ** 2
    n = np.sqrt(GPS_MU / A ** 3) + eph.delta_n
    tk = t_sow - eph.t_oe
    if tk > 302400.0:
        tk -= 604800.0
    elif tk < -302400.0:
        tk += 604800.0
    M = eph.m0 + n * tk
    E = M
    for _ in range(12):
        E = E - (E - eph.e * np.sin(E) - M) / (1.0 - eph.e * np.cos(E))
    nu = np.arctan2(np.sqrt(1.0 - eph.e ** 2) * np.sin(E),
                    np.cos(E) - eph.e)
    phi = nu + eph.omega
    s2, c2 = np.sin(2 * phi), np.cos(2 * phi)
    du = eph.c_us * s2 + eph.c_uc * c2
    dr = eph.c_rs * s2 + eph.c_rc * c2
    di = eph.c_is * s2 + eph.c_ic * c2
    u = phi + du
    r = A * (1.0 - eph.e * np.cos(E)) + dr
    i = eph.i0 + di + eph.idot * tk
    xo, yo = r * np.cos(u), r * np.sin(u)
    om = eph.omega0 + (eph.omega_dot - GPS_OMEGA_E) * tk \
        - GPS_OMEGA_E * eph.t_oe
    x = xo * np.cos(om) - yo * np.cos(i) * np.sin(om)
    y = xo * np.sin(om) + yo * np.cos(i) * np.cos(om)
    z = yo * np.sin(i)
    return np.array([x, y, z])


def gps_fix(sat_pos, pseudoranges, x0=None, n_iter: int = 8):
    """Iterative least-squares position + receiver clock bias from ≥4
    satellites. ``sat_pos``: (N, 3) ECEF meters; ``pseudoranges``: (N,)
    meters. Returns (ecef_pos (3,), clock_bias_m)."""
    sp = np.asarray(sat_pos, np.float64)
    pr = np.asarray(pseudoranges, np.float64)
    if sp.shape[0] < 4:
        raise ValueError("a 3D fix needs at least 4 satellites")
    x = np.zeros(4) if x0 is None else np.concatenate(
        [np.asarray(x0, np.float64), [0.0]])
    for _ in range(n_iter):
        d = sp - x[:3]
        rho = np.linalg.norm(d, axis=1)
        h = np.concatenate([-d / rho[:, None], np.ones((len(pr), 1))],
                           axis=1)
        dz = pr - (rho + x[3])
        x = x + np.linalg.lstsq(h, dz, rcond=None)[0]
    return x[:3], float(x[3])


def gps_decode_ephemeris(iq, fs: float, prn: int,
                         doppler_hz: Optional[float] = None,
                         code_phase_samples: Optional[int] = None
                         ) -> GpsNavFrame:
    """Capture → ephemeris: acquire (unless Doppler AND code phase are
    given), track, recover nav bits, frame-sync, parity-check, parse —
    the codec → capture decode completion of the GNSS family."""
    from .gnss import gps_acquire, gps_track

    if doppler_hz is None or code_phase_samples is None:
        acq = [a for a in gps_acquire(iq, fs, prns=[prn]) if a.prn == prn]
        if not acq:
            return GpsNavFrame([], None)
        doppler_hz = acq[0].doppler_hz
        code_phase_samples = acq[0].code_phase_samples
    trk = gps_track(iq, fs, prn, doppler_hz, code_phase_samples)
    return nav_subframes_decode(trk.nav_bits)
