"""Sync/acquisition unit permutation matrix — deepens coverage toward the
reference's unit tiers (S&C capture bounds, preamble determinism, GI sync
config knobs, integer CFO limits; ref sync/ofdm_sync.rs + dvb_t_gi_sync.rs
unit tests)."""

import numpy as np
import pytest
import jax.numpy as jnp

from orion_sdr_tpu.sync.ofdm_sync import (
    OfdmPreamble, TrainingSymbol, generate_ofdm_preamble, ofdm_sync,
    pseudo_random_unit_sequence, training_symbol_freq_pattern, sc_metric,
)
from orion_sdr_tpu.sync.dvb_t_gi_sync import (
    GiSyncConfig, dvb_t_gi_sync, dvb_t_gi_refine, dvb_t_integer_cfo,
)
from orion_sdr_tpu.dsp.osc import rotate
from orion_sdr_tpu.waveform.dvb_t import DVB_T_N_FFT
from orion_sdr_tpu.modulate.dvb_t_frame import DvbTFrameMod
from orion_sdr_tpu.waveform import DvbTFrameParams, DvbTLinkParams

FS = 1e6


def _preamble_capture(pre, offset=1000, cfo_hz=0.0, noise=0.0, seed=0):
    iq = generate_ofdm_preamble(pre)
    buf = np.concatenate([np.zeros(offset, np.complex64), iq,
                          np.zeros(500, np.complex64)])
    if cfo_hz:
        buf = np.asarray(rotate(buf, cfo_hz, FS)[0])
    if noise:
        rng = np.random.default_rng(seed)
        buf = buf + (rng.standard_normal(len(buf)) +
                     1j * rng.standard_normal(len(buf))
                     ).astype(np.complex64) * noise
    return buf.astype(np.complex64)


# ── preamble generation determinism (wire compatibility) ─────────────────────

def test_preamble_deterministic_and_unit_modulus():
    seq = pseudo_random_unit_sequence(64, 0x4F46444D50524531)
    seq2 = pseudo_random_unit_sequence(64, 0x4F46444D50524531)
    assert np.array_equal(seq, seq2)
    np.testing.assert_allclose(np.abs(seq), 1.0, atol=1e-6)
    # a different seed gives a different sequence
    assert not np.array_equal(
        seq, pseudo_random_unit_sequence(64, 0x4F46444D50524532))


def test_preamble_repeats_are_identical():
    pre = OfdmPreamble(repeat_len=128, num_repeats=4)
    iq = generate_ofdm_preamble(pre)
    assert len(iq) == 512
    for r in range(1, 4):
        np.testing.assert_allclose(iq[r * 128:(r + 1) * 128], iq[:128],
                                   atol=1e-6)


def test_training_symbol_extends_preamble():
    pre = OfdmPreamble(repeat_len=128, num_repeats=4
                       ).with_training_symbol(256, 64)
    assert pre.total_len() == 4 * 128 + 256 + 64
    pat = training_symbol_freq_pattern(256)
    assert pat.shape == (256,)


# ── S&C acquisition: timing, fractional-CFO capture range ────────────────────

@pytest.mark.parametrize("offset", [0, 37, 1000, 4096])
def test_sc_timing_at_offsets(offset):
    pre = OfdmPreamble(repeat_len=128, num_repeats=4)
    buf = _preamble_capture(pre, offset=offset)
    res = ofdm_sync(buf, FS, pre, 0, len(buf))
    assert res and abs(res[0].start_sample - offset) <= 2


@pytest.mark.parametrize("cfo", [-3000.0, -500.0, 500.0, 3000.0])
def test_sc_fractional_cfo_estimate(cfo):
    # capture range ±fs/(2L) = ±3906 Hz at L=128
    pre = OfdmPreamble(repeat_len=128, num_repeats=4)
    buf = _preamble_capture(pre, cfo_hz=cfo, noise=0.005)
    res = ofdm_sync(buf, FS, pre, 0, len(buf))
    assert res and abs(res[0].cfo_hz - cfo) < 40.0


def test_sc_beyond_capture_range_aliases():
    # past ±fs/(2L) the estimate wraps — the fractional estimator alone
    # cannot distinguish (integer-CFO handles the rest)
    pre = OfdmPreamble(repeat_len=128, num_repeats=4)
    cfo = 4500.0
    buf = _preamble_capture(pre, cfo_hz=cfo)
    res = ofdm_sync(buf, FS, pre, 0, len(buf))
    assert res and abs(res[0].cfo_hz - cfo) > 500.0


def test_sc_metric_plateau_has_peak_at_start():
    pre = OfdmPreamble(repeat_len=128, num_repeats=4)
    buf = _preamble_capture(pre, offset=300)
    m, r = sc_metric(jnp.asarray(buf), 128, 4)
    m = np.asarray(m)
    assert np.argmax(m[:600]) <= 310


def test_sync_silence_returns_no_high_scores():
    pre = OfdmPreamble(repeat_len=128, num_repeats=4)
    rng = np.random.default_rng(1)
    buf = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
           ).astype(np.complex64) * 0.01
    res = ofdm_sync(buf, FS, pre, 0, len(buf))
    assert all(r.score < 0.5 for r in res)


# ── van de Beek GI sync: knobs and bounds ────────────────────────────────────

def _dvb_capture(offset=2311, cp="1/8", payload=600, cfo_hz=0.0):
    params = DvbTFrameParams(DvbTLinkParams(cp, "qpsk", "1/2"), 0, 0)
    frame = DvbTFrameMod(params).modulate(
        np.arange(payload, dtype=np.uint8))
    buf = np.concatenate([np.zeros(offset, np.complex64), frame.iq])
    if cfo_hz:
        buf = np.asarray(rotate(buf, cfo_hz, FS)[0]).astype(np.complex64)
    return buf, params


@pytest.mark.parametrize("guard,cp_len", [("1/32", 64), ("1/8", 256)])
def test_gi_sync_guard_intervals(guard, cp_len):
    buf, _ = _dvb_capture(cp=guard)
    sps = DVB_T_N_FFT + cp_len
    acq = dvb_t_gi_sync(buf, DVB_T_N_FFT, cp_len, FS, sps)
    assert acq is not None
    assert (acq.start_sample - 2311) % sps == 0


def test_gi_sync_cfo_capture():
    # capture ±fs/(2·n_fft) ≈ ±244 Hz
    buf, _ = _dvb_capture(cfo_hz=150.0)
    acq = dvb_t_gi_sync(buf, DVB_T_N_FFT, 256, FS, 2304)
    assert acq is not None and abs(acq.cfo_hz - 150.0) < 20.0


def test_gi_refine_agrees_with_coarse():
    buf, _ = _dvb_capture()
    acq = dvb_t_gi_sync(buf, DVB_T_N_FFT, 256, FS, 2304)
    ref = dvb_t_gi_refine(buf, DVB_T_N_FFT, 256, FS, acq.start_sample, 32)
    assert ref is not None
    assert abs(ref.start_sample - acq.start_sample) <= 32


def test_gi_sync_score_in_unit_range():
    buf, _ = _dvb_capture()
    acq = dvb_t_gi_sync(buf, DVB_T_N_FFT, 256, FS, 2304)
    assert 0.0 <= acq.score <= 1.0 + 1e-6
    assert acq.score > 0.5                     # clean capture locks strongly


def test_gi_sync_custom_config_rho():
    buf, _ = _dvb_capture()
    for rho in (0.5, 0.95):
        acq = dvb_t_gi_sync(buf, DVB_T_N_FFT, 256, FS, 2304,
                            cfg=GiSyncConfig(rho=rho))
        assert acq is not None and (acq.start_sample - 2311) % 2304 == 0


def test_gi_sync_silence_none_or_weak():
    rng = np.random.default_rng(2)
    buf = (rng.standard_normal(3 * 2304) + 1j * rng.standard_normal(3 * 2304)
           ).astype(np.complex64) * 0.01
    acq = dvb_t_gi_sync(buf, DVB_T_N_FFT, 256, FS, 2304)
    assert acq is None or acq.score < 0.5


# ── integer CFO: shift recovery at the range limits ──────────────────────────

@pytest.mark.parametrize("bins", [-32, -5, 0, 5, 32])
def test_integer_cfo_shift_recovery(bins):
    """A continual-pilot-bearing spectrum shifted by k bins is recovered
    within the ±max_bins search window."""
    from orion_sdr_tpu.waveform.dvb_t import scattered_grid
    g = scattered_grid()
    accum = np.full(DVB_T_N_FFT, 0.1, np.complex64)
    accum[g.pilot_bins[0]] = 16.0 / 9.0         # boosted pilot power
    shifted = np.roll(accum, bins)
    est = dvb_t_integer_cfo(shifted.astype(np.complex64), DVB_T_N_FFT, 32)
    assert est is not None and est.bins == bins
    if bins == 0:
        assert est.confidence >= 1.0
