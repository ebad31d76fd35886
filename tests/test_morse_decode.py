"""CW/Morse text decoder (beyond-reference: codec/morse.rs is encode-only,
demodulate/cw.rs is a bare pre-tuned envelope).

Roundtrips run text → MorseEncoder → cw_mod → channel → morse_decode(_band)
and require exact text recovery; shapes are shared across cases so the CPU
suite compiles the envelope kernel a handful of times only.
"""

import numpy as np

import orion_sdr_tpu as sdr

FS = 8000.0
N_SINGLE = int(FS * 10)
N_BAND = int(FS * 14)


def _cw(text, wpm, tone, jitter=0.0, amp=1.0, dash_weight=3.0,
        char_space=3.0):
    enc = sdr.MorseEncoder(FS, wpm)
    if jitter:
        enc.with_jitter(jitter)
    enc.with_dash_weight(dash_weight).with_char_space(char_space)
    env = enc.encode_text(text)
    iq, _ = sdr.cw_mod(env, FS, tone)
    return amp * np.asarray(iq)


def _embed(iq, n, start, noise_rms=0.0, seed=0):
    rng = np.random.default_rng(seed)
    buf = np.zeros(n, np.complex64)
    if noise_rms:
        s = noise_rms / np.sqrt(2.0)
        buf += (rng.normal(0, s, n) + 1j * rng.normal(0, s, n)).astype(
            np.complex64)
    buf[start:start + len(iq)] += iq[: n - start]
    return buf


def test_morse_decode_roundtrip_wpm_matrix():
    # classification has no wpm prior: same buffer length at 10/20/40 wpm
    for wpm, text in ((10.0, "CQ TEST"), (20.0, "CQ DE KA1ABC K"),
                      (40.0, "THE QUICK BROWN FOX 599")):
        buf = _embed(_cw(text, wpm, 700.0), N_SINGLE, int(FS * 0.5))
        assert sdr.morse_decode(buf, FS, 700.0) == text, wpm


def test_morse_decode_jitter_and_fist():
    # 20% per-element jitter + heavy dash weight + wide char space (the
    # encoder's full "human fist" envelope) still classifies exactly
    text = "PARIS PARIS 73"
    buf = _embed(_cw(text, 22.0, 650.0, jitter=20.0, dash_weight=3.5,
                     char_space=4.0), N_SINGLE, int(FS * 0.3))
    assert sdr.morse_decode(buf, FS, 650.0) == text


def test_morse_decode_auto_tone_and_offset():
    # tone_hz omitted: strongest spectral line wins; a 30 Hz carrier error
    # costs nothing (well inside the 100 Hz envelope lowpass)
    text = "HELLO WORLD"
    buf = _embed(_cw(text, 18.0, 833.0), N_SINGLE, int(FS * 0.8))
    assert sdr.morse_decode(buf, FS) == text
    assert sdr.morse_decode(buf, FS, 833.0 + 30.0) == text


def test_morse_decode_noise():
    # amp 0.25 on unit-RMS noise: −12 dB full-band ≈ +4 dB in the 100 Hz
    # envelope bandwidth — decodes exactly
    text = "CQ DX DE W1AW"
    iq = _cw(text, 20.0, 700.0, amp=0.25)
    buf = _embed(iq, N_SINGLE, int(FS * 0.5), noise_rms=0.25, seed=3)
    assert sdr.morse_decode(buf, FS, 700.0) == text


def test_morse_decode_band_three_signals():
    sigs = (("CQ DX", 15.0, 500.0, 1.0), ("HELLO WORLD", 28.0, 900.0, 0.3),
            ("73 GL", 35.0, 1300.0, 0.1))
    rng = np.random.default_rng(11)
    buf = _embed(np.zeros(0, np.complex64), N_BAND, 0, noise_rms=0.028,
                 seed=11)
    for text, wpm, tone, amp in sigs:
        iq = _cw(text, wpm, tone, jitter=10.0, amp=amp)
        s = int(rng.integers(0, FS))
        buf[s:s + len(iq)] += iq[: N_BAND - s]
    got = sdr.morse_decode_band(buf, FS, 400.0, 1500.0)
    assert len(got) == len(sigs)
    by_tone = {round(r.tone_hz / 50.0) * 50: r for r in got}
    for text, wpm, tone, _amp in sigs:
        r = by_tone[round(tone / 50.0) * 50]
        assert r.text == text
        assert abs(r.wpm - wpm) / wpm < 0.15, (wpm, r.wpm)
    # strongest first is not required, but scores must order by level
    scores = {round(r.tone_hz / 50.0) * 50: r.score_db for r in got}
    assert scores[500] > scores[900] > scores[1300]


def test_morse_decode_band_sideband_rejection():
    # ONE strong keyed carrier: its keying sidebands rise well above the
    # floor but must not appear as extra transmissions
    buf = _embed(_cw("CQ CQ DE KA1ABC K", 20.0, 800.0, amp=3.0),
                 N_BAND, int(FS * 0.5), noise_rms=0.01, seed=5)
    got = sdr.morse_decode_band(buf, FS, 400.0, 1500.0)
    assert len(got) == 1
    assert abs(got[0].tone_hz - 800.0) < 10.0
    assert got[0].text == "CQ CQ DE KA1ABC K"


def test_morse_decode_edges():
    assert sdr.morse_decode(np.zeros(0, np.complex64), FS) == ""
    assert sdr.morse_decode(np.zeros(4096, np.complex64), FS) == ""
    assert sdr.morse_decode_band(np.zeros(8192, np.complex64), FS,
                                 400.0, 1500.0) == []
    # pure unkeyed tone: a spectral line with no on/off contrast is not CW
    t = np.arange(N_SINGLE) / FS
    tone = np.exp(2j * np.pi * 700.0 * t).astype(np.complex64)
    assert sdr.morse_decode(tone, FS, 700.0) == ""
