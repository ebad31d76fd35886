"""Real-chip smoke: run one roundtrip of every receive chain on the axon TPU
backend. CPU CI can't see axon's complex64-transfer limits, so this is the
gate for 'runs on the actual TPU'. Usage: python tools/tpu_smoke.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

RESULTS = []


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        RESULTS.append((name, f"OK ({time.perf_counter()-t0:.1f}s)"))
    except Exception as e:  # noqa: BLE001 — report every failure mode
        RESULTS.append((name, f"FAIL: {type(e).__name__}: {str(e)[:120]}"))


def fm():
    import orion_sdr_tpu as sdr
    fs = 48000.0
    audio = np.asarray(sdr.tone(fs, 1000.0, 65536, 0.5))
    iq, _ = sdr.fm_mod(audio, fs, 2500.0)
    out, _ = sdr.fm_demod(iq, fs, 2500.0, 5000.0)
    out = np.asarray(out)[16384:]
    # scale-invariant tone check (the k = 1/dev convention makes the raw
    # amplitude tiny, matching the reference)
    n = len(out)
    t = 2 * np.pi * np.arange(n) / fs
    on = abs(np.sum(out * np.exp(-1j * 1000.0 * t)))
    off = abs(np.sum(out * np.exp(-1j * 730.0 * t)))
    assert on > 20 * off, (on, off)


def psk31():
    import orion_sdr_tpu as sdr
    from orion_sdr_tpu.modulate.psk31 import bpsk31_mod_text
    msg = "CQ TPU"
    iq = np.asarray(bpsk31_mod_text(msg, 8000.0, rf_hz=1000.0))
    st = sdr.Psk31Stream.new_bpsk(8000.0, 1000.0)
    text = st.feed(iq) + st.flush()
    assert msg in text, text


def ft8():
    import orion_sdr_tpu as sdr
    from orion_sdr_tpu.modulate.ft8 import ft8_mod
    from orion_sdr_tpu.codec.ft8 import ft8_encode
    ht = sdr.CallsignHashTable()
    p = sdr.pack77(sdr.message.Standard("CQ", "KA1ABC", "FN42"), ht)
    iq = np.asarray(ft8_mod(ft8_encode(p), 12000.0, base_hz=1012.5))
    res = sdr.Ft8StreamDecoder.new_ft8(12000.0, 950.0, 1150.0).feed(iq)
    assert res and res[0].message.call_de == "KA1ABC"


def ofdm_frame():
    import orion_sdr_tpu as sdr
    plan = sdr.CarrierPlan(256, 64).with_contiguous_data(edge_guard=16)
    cfg = sdr.OfdmConfig(plan, fs=1e6)
    pre = sdr.OfdmPreamble(128, 4).with_training_symbol(256, 64)
    table = sdr.McsTable.default_ladder()
    payload = np.arange(150, dtype=np.uint8)
    iq = sdr.OfdmFrameMod(cfg, table, pre).modulate_frame(
        sdr.FramePacket(sdr.FrameMetadata(7, 1), payload), 3)
    rx = sdr.OfdmFrameStreamDemod(cfg, table, pre)
    res = rx.feed(np.concatenate([np.zeros(500, np.complex64), iq]))
    res += rx.flush()
    ok = [r for r in res if hasattr(r, "packet")]
    assert ok and np.array_equal(ok[0].packet.payload, payload)


def dvb_t():
    import orion_sdr_tpu as sdr
    params = sdr.DvbTFrameParams(sdr.DvbTLinkParams("1/32", "qpsk", "1/2"),
                                 1, 0x5A)
    payload = np.arange(200, dtype=np.uint8)
    frame = sdr.DvbTFrameMod(params).modulate(payload)
    rx = sdr.DvbTFrameDemod(params).decode(frame.iq, frame.n_symbols,
                                           len(payload))
    assert np.array_equal(rx.payload, payload)
    assert rx.tps.cell_id == 0x5A


def main():
    print("backend:", jax.default_backend())
    for name, fn in [("fm", fm), ("psk31", psk31), ("ft8", ft8),
                     ("ofdm_frame", ofdm_frame), ("dvb_t", dvb_t)]:
        check(name, fn)
    width = max(len(n) for n, _ in RESULTS)
    bad = 0
    for n, r in RESULTS:
        print(f"{n:<{width}}  {r}")
        bad += r.startswith("FAIL")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
