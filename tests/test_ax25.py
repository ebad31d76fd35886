"""AX.25 packet radio over AFSK-1200 (Bell 202) — beyond the reference
(no packet modes in /root/reference). HDLC bit layer, X.25 FCS, address
encoding, and the dual-tone modem end-to-end (incl. through the FM chain)."""

import numpy as np
import pytest

from orion_sdr_tpu.codec.ax25 import (Ax25Frame, ax25_crc, hdlc_encode,
                                      hdlc_decode)
from orion_sdr_tpu.modulate.afsk import (afsk1200_mod, ax25_beacon,
                                         nrzi_encode, nrzi_decode)
from orion_sdr_tpu.demodulate.afsk import afsk1200_demod, ax25_decode

FS = 48_000.0


def test_x25_crc_known_answer():
    # the published CRC-16/X.25 check value over "123456789"
    assert ax25_crc(b"123456789") == 0x906E


def test_address_encoding_roundtrip_and_validation():
    f = Ax25Frame(dest="APRS", src="W1AW-5", digis=("WIDE1-1", "WIDE2-2"),
                  payload=b"hello")
    assert Ax25Frame.parse(f.encode()) == f
    with pytest.raises(ValueError):
        Ax25Frame(dest="TOOLONGCALL", src="A").encode()
    with pytest.raises(ValueError):
        Ax25Frame(dest="CQ-77", src="A").encode()


def test_hdlc_stuffing_roundtrip_and_fcs_guard():
    # payload full of 1-bits exercises bit stuffing
    f = Ax25Frame(dest="CQ", src="N0CALL", payload=b"\xff\xff\x7e\xff")
    bits = hdlc_encode([f.encode()])
    frames = hdlc_decode(bits)
    assert len(frames) == 1 and frames[0] == f
    bad = bits.copy()
    bad[len(bits) // 2] ^= 1
    assert all(g.payload != b"CORRUPT" for g in hdlc_decode(bad))


def test_nrzi_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 256).astype(np.uint8)
    states = nrzi_encode(bits)
    got = nrzi_decode(states)
    # first bit depends on the pre-stream state; flag hunting absorbs it
    assert np.array_equal(got[1:], bits[1:])


def test_afsk_end_to_end_two_frames_awgn():
    f1 = Ax25Frame(dest="APRS", src="W1AW-5", digis=("WIDE1-1",),
                   payload=b"!4237.14N/07120.83W-orion test")
    f2 = Ax25Frame(dest="CQ", src="N0CALL", payload=b"hello packet")
    audio = ax25_beacon([f1, f2], FS)
    assert ax25_decode(audio, FS) == [f1, f2]
    rng = np.random.default_rng(0)
    sig_p = float(np.mean(audio ** 2))
    noisy = audio + rng.standard_normal(len(audio)).astype(np.float32) \
        * np.sqrt(sig_p / 10 ** 0.6)                     # 6 dB audio SNR
    assert ax25_decode(noisy, FS) == [f1, f2]


def test_afsk_through_fm_chain():
    """The real deployment: AFSK audio FM-modulated onto RF and recovered
    through the quadrature discriminator."""
    from orion_sdr_tpu.modulate.analog import fm_mod
    from orion_sdr_tpu.demodulate.analog import fm_demod
    f = Ax25Frame(dest="APRS", src="K1ABC-9", payload=b">status: on air")
    audio = ax25_beacon([f], FS)
    iq, _ = fm_mod(audio * 0.5, FS, 3000.0)
    back, _ = fm_demod(np.asarray(iq), FS, 3000.0, 3000.0)
    assert ax25_decode(np.asarray(back) * 2.0, FS) == [f]


def test_afsk_timing_offset_and_validation():
    f = Ax25Frame(dest="CQ", src="N0CALL", payload=b"x" * 40)
    audio = ax25_beacon([f], FS)
    # arbitrary lead-in silence + fractional-bit offset
    shifted = np.concatenate([np.zeros(777, np.float32), audio])
    assert ax25_decode(shifted, FS) == [f]
    with pytest.raises(ValueError):
        afsk1200_mod(np.zeros(64, np.uint8), 4000.0)
    assert afsk1200_demod(np.zeros(50, np.float32), FS).size == 0


# ── RTTY (Baudot 45.45-baud FSK over the shared 2-FSK engine) ────────────────

def test_baudot_roundtrip_with_page_shifts():
    from orion_sdr_tpu.codec.rtty import baudot_encode, baudot_decode
    msg = "CQ DE W1AW 599 73! (TEST) -./"
    assert baudot_decode(baudot_encode(msg)) == msg


def test_rtty_end_to_end_awgn():
    from orion_sdr_tpu.modulate.afsk import rtty_mod
    from orion_sdr_tpu.demodulate.afsk import rtty_decode
    fs = 11025.0
    msg = "CQ CQ DE W1AW W1AW K 599 #73!"
    audio = rtty_mod(msg, fs)
    assert rtty_decode(audio, fs) == msg
    rng = np.random.default_rng(0)
    sig_p = float(np.mean(audio ** 2))
    noisy = audio + rng.standard_normal(len(audio)).astype(np.float32) \
        * np.sqrt(sig_p / 10 ** 0.8)                    # 8 dB audio SNR
    assert rtty_decode(noisy, fs) == msg


def test_rtty_framing_resyncs_after_garble():
    from orion_sdr_tpu.codec.rtty import (baudot_encode, rtty_frame_bits,
                                          rtty_unframe_bits, baudot_decode)
    line = rtty_frame_bits(baudot_encode("HELLO WORLD"))
    # corrupt a whole character's bits mid-stream
    garbled = line.copy()
    garbled[8 + 7 * 3: 8 + 7 * 4] ^= 1
    text = baudot_decode(rtty_unframe_bits(garbled))
    assert "WORLD" in text        # the stream recovers after the hit


def test_afsk_stream_tnc_chunk_invariant_and_checkpoint(tmp_path):
    from orion_sdr_tpu.demodulate.afsk import Afsk1200Stream
    from orion_sdr_tpu.checkpoint import save_checkpoint, load_checkpoint
    f1 = Ax25Frame(dest="APRS", src="W1AW-5", payload=b"frame one")
    f2 = Ax25Frame(dest="CQ", src="N0CALL", payload=b"frame two here")
    f3 = Ax25Frame(dest="BEACON", src="K1ABC", payload=b"third")
    audio = np.concatenate([ax25_beacon([f1], FS),
                            np.zeros(20000, np.float32),
                            ax25_beacon([f2], FS),
                            np.zeros(5000, np.float32),
                            ax25_beacon([f3], FS)])
    for chunk in (7777, 30000, len(audio)):
        tnc = Afsk1200Stream(FS)
        got = []
        for i in range(0, len(audio), chunk):
            got += tnc.feed(audio[i:i + chunk])
        got += tnc.flush()
        assert got == [f1, f2, f3], chunk
    # checkpoint mid-stream: resumed decode equals unbroken decode
    cut = len(audio) // 2
    a = Afsk1200Stream(FS)
    got = a.feed(audio[:cut])
    p = str(tmp_path / "tnc.npz")
    save_checkpoint(p, a)
    b = load_checkpoint(p, Afsk1200Stream(FS))
    got += b.feed(audio[cut:]) + b.flush()
    assert got == [f1, f2, f3]
