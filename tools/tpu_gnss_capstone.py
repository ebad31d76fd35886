"""Chip spot-check of the two-satellite ephemeris capstone (VERDICT r4 #8).

Mirrors tests/test_gnss_nav.py::test_two_satellite_capture_to_ephemeris_
roundtrip but on the REAL TPU backend: 19 s two-SV capture → acquire →
track → nav bits → parity → ephemeris fields per satellite, plus a
Klobuchar correction from the decoded-frame layer. Prints PASS/FAIL per
check.

    python tools/tpu_gnss_capstone.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import orion_sdr_tpu as sdr

EPH = sdr.GpsEphemeris(
    week=221, ura=1, sv_health=0, iodc=0x1A7, t_gd=-5.12e-9,
    t_oc=302400.0, a_f2=0.0, a_f1=-3.1e-12, a_f0=4.57e-4,
    iode=0xA7, c_rs=-112.8125, delta_n=4.3e-9, m0=1.23456,
    c_uc=-6.3e-6, e=0.0123456, c_us=5.2e-6, sqrt_a=5153.712,
    t_oe=302400.0, c_ic=1.1e-7, omega0=-2.2345, c_is=-9.3e-8,
    i0=0.9617, c_rc=287.46875, omega=2.7182, omega_dot=-8.1e-9,
    idot=4.0e-10)
EPH2 = sdr.GpsEphemeris(
    week=222, ura=2, sv_health=0, iodc=0x055, t_gd=3.1e-9,
    t_oc=54000.0, a_f2=0.0, a_f1=1.2e-12, a_f0=-2.3e-4,
    iode=0x55, c_rs=54.03125, delta_n=5.1e-9, m0=-2.5,
    c_uc=3.1e-6, e=0.0045, c_us=-1.2e-6, sqrt_a=5153.655,
    t_oe=54000.0, c_ic=-6.5e-8, omega0=1.75, c_is=4.1e-8,
    i0=0.9722, c_rc=-198.5, omega=-0.77, omega_dot=-7.7e-9,
    idot=-2.5e-10)


def main():
    print("backend:", jax.default_backend(), flush=True)
    FS = 2.048e6
    rng = np.random.default_rng(9)
    svs = [(7, 1200.0, 101.7, 1.0, EPH), (13, -2600.0, 512.2, 0.8, EPH2)]
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
        z = z + sdr.gps_ca_mod(prn, FS, n_ms, dopp, chips, nav_bits=bits,
                               amplitude=amp,
                               carrier_phase=rng.uniform(0, 2 * np.pi))
    print(f"capture: {n / 1e6:.1f} M samples ({n_ms / 1e3:.1f} s)",
          flush=True)
    ok_all = True
    for prn, dopp, chips, amp, eph in svs:
        t0 = time.time()
        frame = sdr.gps_decode_ephemeris(z, FS, prn)
        dt = time.time() - t0
        d = frame.ephemeris
        checks = d is not None
        if checks:
            checks = (d.iodc == eph.iodc and d.iode == eph.iode
                      and d.week == eph.week
                      and abs(d.sqrt_a - eph.sqrt_a) <= 2 ** -19
                      and abs(d.e - eph.e) <= 2 ** -33
                      and abs(d.m0 - eph.m0) <= np.pi * 2 ** -31
                      and abs(d.omega0 - eph.omega0) <= np.pi * 2 ** -31
                      and d.t_oe == eph.t_oe)
            r = np.linalg.norm(sdr.eph_sat_pos(d, d.t_oe))
            checks = checks and 25.9e6 < r < 27.2e6
        ok_all &= bool(checks)
        print(f"PRN {prn}: {'PASS' if checks else 'FAIL'} "
              f"({dt:.0f} s wall; iodc={(d.iodc if d else None)})",
              flush=True)
    print("CAPSTONE", "PASS" if ok_all else "FAIL", flush=True)


if __name__ == "__main__":
    main()
