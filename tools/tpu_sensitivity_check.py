"""Chip re-validation of the sensitivity floors (VERDICT r4 #9 stretch).

Re-runs the two most demanding sweep points from tests/test_perf_sweeps.py
on the REAL TPU backend, after the round-4/5 kernel churn (fused mapper,
BP product form, Viterbi v4, long-tap FIR routing): FT8 at −15/−17 dB and
DVB-T 16QAM r3/4 at 15 dB, 5 trials each. The CPU sweeps' floors are FT8
−17 dB and 16QAM-r3/4 15 dB — the chip must match (no bf16/precision
regression on hardware).

    python tools/tpu_sensitivity_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

FS12 = 12000.0


def _awgn(rng, n, power):
    return ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
            * np.sqrt(power / 2)).astype(np.complex64)


def snr_to_noise_power(snr_db, fs, ref_bw=2500.0):
    return fs / (ref_bw * 10.0 ** (snr_db / 10.0))


def check_ft8():
    from orion_sdr_tpu.modulate.ft8 import ft8_mod
    from orion_sdr_tpu.codec.ft8 import ft8_encode
    from orion_sdr_tpu.codec.ft8_stream import Ft8StreamDecoder
    from orion_sdr_tpu.message import pack77, Standard, CallsignHashTable

    p = pack77(Standard("CQ", "KA1ABC", "FN42"), CallsignHashTable())
    iq = np.asarray(ft8_mod(ft8_encode(p), FS12, base_hz=1012.5))
    all_ok = True
    for snr in (-15.0, -17.0):
        ok, trials = 0, 5
        t0 = time.time()
        for seed in range(trials):
            rng = np.random.default_rng(97 + seed)
            noisy = iq + _awgn(rng, len(iq), snr_to_noise_power(snr, FS12))
            res = Ft8StreamDecoder.new_ft8(FS12, 950.0, 1150.0).feed(noisy)
            ok += bool(res and res[0].message.call_de == "KA1ABC")
        print(f"FT8 {snr:+.0f} dB: {ok}/{trials} ({time.time()-t0:.0f} s)",
              flush=True)
        all_ok &= ok == trials
    return all_ok


def check_dvb_t_16qam():
    from orion_sdr_tpu.waveform.dvb_t import DvbTLinkParams, DvbTFrameParams
    from orion_sdr_tpu.modulate.dvb_t_frame import DvbTFrameMod
    from orion_sdr_tpu.demodulate.dvb_t_frame import (DvbTFrameDemod,
                                                      DvbTRxError)
    params = DvbTFrameParams(DvbTLinkParams("1/8", "qam16", "3/4"), 0, 0)
    payload = np.random.default_rng(0).integers(0, 256, 400).astype(np.uint8)
    frame = DvbTFrameMod(params).modulate(payload)
    sig_p = float(np.mean(np.abs(frame.iq) ** 2))
    ok, trials = 0, 5
    t0 = time.time()
    for seed in range(trials):
        rng = np.random.default_rng(7 + seed)
        buf = frame.iq + _awgn(rng, len(frame.iq), sig_p / 10 ** (15.0 / 10))
        try:
            rx = DvbTFrameDemod(params).decode(buf, frame.n_symbols,
                                               len(payload))
            ok += bool(np.array_equal(rx.payload, payload))
        except DvbTRxError:
            pass
    print(f"DVB-T 16QAM r3/4 +15 dB: {ok}/{trials} ({time.time()-t0:.0f} s)",
          flush=True)
    return ok == trials


def main():
    print("backend:", jax.default_backend(), flush=True)
    ok = check_ft8()
    ok &= check_dvb_t_16qam()
    print("SENSITIVITY", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
