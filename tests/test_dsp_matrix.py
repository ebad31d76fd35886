"""DSP design-function matrix — Kaiser design formulas, decimator geometry,
filter/AGC parameter sweeps (mirrors reference dsp unit coverage beyond the
core paths already in test_dsp.py)."""

import numpy as np
import pytest

from orion_sdr_tpu import dsp
from orion_sdr_tpu.dsp.fir import (kaiser_beta, kaiser_lowpass_taps,
                                   kaiser_transition_norm, kaiser_num_taps)


# ── Kaiser design formulas (ref dsp/fir.rs:74-157) ───────────────────────────

@pytest.mark.parametrize("a_db,expect", [
    # classic Kaiser piecewise: β=0 below 21 dB; 0.5842(A-21)^0.4+0.07886(A-21)
    # mid; 0.1102(A-8.7) above 50
    (10.0, 0.0),
    (30.0, 0.5842 * 9 ** 0.4 + 0.07886 * 9),
    (60.0, 0.1102 * (60 - 8.7)),
])
def test_kaiser_beta_piecewise(a_db, expect):
    assert kaiser_beta(a_db) == pytest.approx(expect, rel=1e-6)


@pytest.mark.parametrize("m,a", [(31, 40.0), (63, 60.0), (127, 80.0)])
def test_kaiser_transition_formula(m, a):
    # Δf/fs ≈ (A−8)/(14.36·M)
    assert kaiser_transition_norm(m, a) == pytest.approx(
        (a - 8.0) / (14.36 * m), rel=1e-6)


def test_kaiser_num_taps_inverts_transition():
    for a in (40.0, 60.0):
        for tn in (0.01, 0.05):
            m = kaiser_num_taps(tn, a)
            assert kaiser_transition_norm(m, a) <= tn * 1.05


@pytest.mark.parametrize("num_taps", [15, 33, 101])
def test_kaiser_taps_symmetric_linear_phase(num_taps):
    taps = np.asarray(kaiser_lowpass_taps(num_taps, 0.2, 60.0))
    assert len(taps) == num_taps
    np.testing.assert_allclose(taps, taps[::-1], atol=1e-7)
    assert taps.sum() == pytest.approx(1.0, rel=1e-3)     # unit DC gain


@pytest.mark.parametrize("stopband_db", [40.0, 60.0, 80.0])
def test_kaiser_stopband_attains_design(stopband_db):
    taps = np.asarray(kaiser_lowpass_taps(201, 0.1, stopband_db))
    H = np.abs(np.fft.rfft(taps, 4096))
    f = np.linspace(0, 0.5, len(H))
    stop = H[f > 0.1 + kaiser_transition_norm(201, stopband_db)]
    atten = -20 * np.log10(stop.max() + 1e-12)
    assert atten > stopband_db - 3.0


# ── decimator geometry (ref dsp/decim.rs) ────────────────────────────────────

@pytest.mark.parametrize("m", [2, 4, 8])
def test_decimate_length_and_alias_rejection(m):
    rng = np.random.default_rng(m)
    fs = 48_000.0
    n = 1 << 14
    taps = dsp.kaiser_lowpass_taps(63, 0.4 / m, 60.0)
    # in-band tone survives, above-Nyquist-out tone dies
    t = np.arange(n) / fs
    keep_hz = fs / (4 * m)
    kill_hz = fs / m * 0.9
    z = (np.exp(2j * np.pi * keep_hz * t) +
         np.exp(2j * np.pi * kill_hz * t)).astype(np.complex64)
    y, _ = dsp.fir_decimate(z, taps, m)
    y = np.asarray(y)
    assert len(y) == n // m
    spec = np.abs(np.fft.fft(y))
    fs_out = fs / m
    keep_bin = int(round(keep_hz / fs_out * len(y)))
    kill_alias = kill_hz - fs_out * round(kill_hz / fs_out)
    kill_bin = int(round(kill_alias / fs_out * len(y))) % len(y)
    assert spec[keep_bin] > 30 * spec[kill_bin]


def test_decimate_streaming_chunk_invariance():
    rng = np.random.default_rng(9)
    z = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)
         ).astype(np.complex64)
    taps = dsp.kaiser_lowpass_taps(31, 0.2, 50.0)
    one, _ = dsp.fir_decimate(z, taps, 4)
    state = None
    parts = []
    for c in np.array_split(z, 4):
        y, state = dsp.fir_decimate(c, taps, 4, state=state)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(one),
                               atol=1e-5)


# ── AGC parameter behavior (ref dsp/agc.rs) ──────────────────────────────────

def test_agc_gain_clamped():
    from orion_sdr_tpu.dsp.agc import agc_rms, design_agc
    # tiny input: gain must clamp at 20, not explode
    p = design_agc(48_000.0, 5.0, 50.0, 0.5)
    x = np.full(4096, 1e-4, np.float32)
    y, env = agc_rms(x, p)
    y = np.asarray(y)
    assert float(np.abs(y).max()) <= 1e-4 * 20.0 * 1.01


def test_agc_attack_faster_than_release():
    from orion_sdr_tpu.dsp.agc import agc_rms, design_agc
    p = design_agc(48_000.0, 2.0, 100.0, 0.3)
    loud = np.ones(2048, np.float32)
    quiet = np.full(2048, 0.05, np.float32)
    x = np.concatenate([quiet, loud, quiet])
    y, _ = agc_rms(x, p)
    y = np.asarray(y)
    # shortly after the loud step the output has pulled down toward target
    assert abs(float(np.abs(y[2048 + 1500])) - 0.3) < 0.15
