"""Multicarrier + DVB-T unit permutation matrix — deepens coverage toward
the reference's unit tiers (tests/unit/multicarrier.rs 38 tests,
unit/dvb_t.rs 31: FFT normalization across sizes, plan/grid geometry,
window/backoff budgets, ETSI known answers)."""

import numpy as np
import pytest
import jax.numpy as jnp

from orion_sdr_tpu.multicarrier import (
    CarrierPlan, CarrierGrid, grid_map, grid_extract, ofdm_assemble,
    symbol_fft, symbol_taper, max_pilot_safe_backoff,
)
from orion_sdr_tpu.multicarrier.plan import CarrierPlanError
from orion_sdr_tpu.waveform.dvb_t import (
    DVB_T_N_FFT, DVB_T_ACTIVE_CARRIERS, DVB_T_DATA_CARRIERS,
    DVB_T_CONTINUAL_PILOTS_2K, DVB_T_TPS_CARRIERS_2K,
    guard_cp_len_2k, wk_prbs, boosted_pilot_value, axis_scale,
    scattered_pilot_indices, energy_disperse, dvb_t_map_symbols,
    dvb_t_soft_llrs, scattered_grid,
)


# ── FFT normalization across sizes (ref unit/multicarrier.rs) ────────────────

@pytest.mark.parametrize("n_fft", [64, 256, 1024, 2048])
def test_fft_unity_roundtrip(n_fft):
    """Unity forward / 1/N inverse: assemble→symbol_fft is the identity."""
    rng = np.random.default_rng(n_fft)
    freq = (rng.standard_normal((3, n_fft)) +
            1j * rng.standard_normal((3, n_fft))).astype(np.complex64)
    cp = n_fft // 8
    t = ofdm_assemble(jnp.asarray(freq), cp)
    back = symbol_fft(t, n_fft, cp, n_symbols=3)
    np.testing.assert_allclose(np.asarray(back), freq, atol=2e-4)


@pytest.mark.parametrize("cp_frac", [4, 8, 16, 32])
def test_cyclic_prefix_is_tail_copy(cp_frac):
    n_fft = 256
    cp = n_fft // cp_frac
    rng = np.random.default_rng(cp)
    freq = (rng.standard_normal((1, n_fft)) +
            1j * rng.standard_normal((1, n_fft))).astype(np.complex64)
    t = np.asarray(ofdm_assemble(jnp.asarray(freq), cp))
    np.testing.assert_allclose(t[:cp], t[n_fft:], atol=1e-6)


# ── plan/grid geometry & validation ──────────────────────────────────────────

def test_signed_index_bin_resolution():
    plan = CarrierPlan(64, 16).with_data_carriers([-5, -1, 1, 5])
    g = CarrierGrid(plan)
    assert list(g.data_bins) == [59, 63, 1, 5]


@pytest.mark.parametrize("bad", [
    lambda p: p.with_data_carriers([40]),          # out of range for n=64
    lambda p: p.with_data_carriers([1, 1]),        # duplicate role
    lambda p: p.with_data_carriers([2]).with_pilot_carriers([(2, 1.0)]),
])
def test_invalid_plans_raise(bad):
    with pytest.raises(CarrierPlanError):
        CarrierGrid(bad(CarrierPlan(64, 16)))


def test_empty_plan_raises():
    with pytest.raises(CarrierPlanError):
        CarrierGrid(CarrierPlan(64, 16))


@pytest.mark.parametrize("edge_guard", [0, 4, 16])
def test_contiguous_data_edge_guard(edge_guard):
    plan = CarrierPlan(64, 16).with_contiguous_data(edge_guard=edge_guard)
    lo, hi = plan.index_bounds()
    idx = sorted(plan.data_carriers)
    assert idx[0] == lo + 1 + edge_guard and idx[-1] == hi - edge_guard
    assert 0 not in idx                        # DC null unless opted in
    plan.validate_edge_guard(edge_guard)


def test_grid_map_extract_roundtrip_with_pilots():
    plan = (CarrierPlan(64, 16)
            .with_pilot_carriers([(-8, 1.0), (8, -1.0)])
            .with_contiguous_data(edge_guard=2))
    g = CarrierGrid(plan)
    rng = np.random.default_rng(0)
    syms = (rng.standard_normal((2, 4, g.num_data_carriers)) +
            1j * rng.standard_normal((2, 4, g.num_data_carriers))
            ).astype(np.complex64)
    freq = np.asarray(grid_map(g, jnp.asarray(syms)))
    # pilots inserted with known values, nulls zeroed
    assert np.allclose(freq[..., g.pilot_bins], [1.0, -1.0])
    assert np.allclose(freq[..., 0], 0.0)      # DC null
    back = np.asarray(grid_extract(g, jnp.asarray(freq)))
    np.testing.assert_allclose(back, syms, atol=1e-6)


# ── window / back-off budgets ────────────────────────────────────────────────

@pytest.mark.parametrize("roll_off", [0, 1, 8, 32])
def test_symbol_taper_geometry(roll_off):
    sym = 320
    w = symbol_taper(sym, roll_off)
    if roll_off == 0:
        assert w is None
        return
    assert w.shape == (sym,)
    assert np.allclose(w[roll_off:sym - roll_off], 1.0)
    # ramp is symmetric and strictly rising
    assert np.allclose(w[:roll_off], w[::-1][:roll_off])
    assert np.all(np.diff(w[:roll_off]) > 0) or roll_off == 1


def test_taper_rx_transparent_within_budget():
    """roll_off ≤ min(cp−b, b): the tapered region stays outside the RX
    window, so the decode is untouched (ref symbol_window.rs contract)."""
    n_fft, cp, b, roll = 256, 64, 32, 16
    rng = np.random.default_rng(3)
    freq = (rng.standard_normal((4, n_fft)) +
            1j * rng.standard_normal((4, n_fft))).astype(np.complex64)
    plain = np.asarray(symbol_fft(ofdm_assemble(jnp.asarray(freq), cp),
                                  n_fft, cp, backoff=b, n_symbols=4))
    taper = symbol_taper(n_fft + cp, roll)
    shaped = np.asarray(symbol_fft(
        ofdm_assemble(jnp.asarray(freq), cp, taper=jnp.asarray(taper)),
        n_fft, cp, backoff=b, n_symbols=4))
    # backoff b shifts the window into the CP: pure per-bin phase ramp,
    # identical for both paths — compare them directly
    np.testing.assert_allclose(shaped, plain, atol=2e-4)


@pytest.mark.parametrize("n_fft,spacing,expect", [
    (2048, 12, 85), (256, 8, 16), (1024, 4, 128)])
def test_max_pilot_safe_backoff_rule(n_fft, spacing, expect):
    assert max_pilot_safe_backoff(n_fft, spacing) == expect


# ── DVB-T ETSI known answers (ref unit/dvb_t.rs) ─────────────────────────────

def test_energy_dispersal_first_byte():
    # EN 300 744: PRBS 1+X^14+X^15 seeded 100101010000000 → first byte 0x03
    out = energy_disperse(np.zeros(8, np.uint8))
    assert int(out[0]) == 0x03
    # self-inverse
    assert np.array_equal(energy_disperse(out), np.zeros(8, np.uint8))


@pytest.mark.parametrize("guard,cp", [("1/32", 64), ("1/16", 128),
                                      ("1/8", 256), ("1/4", 512)])
def test_guard_cp_lengths(guard, cp):
    assert guard_cp_len_2k(guard) == cp


def test_numerology_counts():
    assert DVB_T_N_FFT == 2048
    assert DVB_T_ACTIVE_CARRIERS == 1705
    assert DVB_T_DATA_CARRIERS == 1512
    assert len(DVB_T_CONTINUAL_PILOTS_2K) == 45
    assert len(DVB_T_TPS_CARRIERS_2K) == 17
    assert DVB_T_CONTINUAL_PILOTS_2K[0] == 0
    assert DVB_T_CONTINUAL_PILOTS_2K[-1] == 1704


@pytest.mark.parametrize("phase", [0, 1, 2, 3])
def test_scattered_pilot_rule(phase):
    idx = scattered_pilot_indices(phase)
    # k mod 12 == 3*(l mod 4) (ETSI 4.5.3), all within the active band
    assert np.all(idx % 12 == 3 * phase)
    assert idx[0] >= 0 and idx[-1] <= 1704
    g = scattered_grid()
    assert len(g.data_bins[phase]) == DVB_T_DATA_CARRIERS


def test_boosted_pilot_values():
    # w_k = 0 → +4/3, w_k = 1 → −4/3 (16/9 power boost)
    assert boosted_pilot_value(np.array([0]))[0] == pytest.approx(4.0 / 3.0)
    assert boosted_pilot_value(np.array([1]))[0] == pytest.approx(-4.0 / 3.0)


def test_wk_prbs_known_prefix():
    # X^11 + X^2 + 1, all-ones init: w starts 1,1,1,1,1,1,1,1,1,1,1,0,...
    w = wk_prbs(16)
    assert list(w[:11]) == [1] * 11
    assert w[11] == 0


@pytest.mark.parametrize("v,scale", [(2, 2 ** -0.5), (4, 10 ** -0.5),
                                     (6, 42 ** -0.5)])
def test_axis_scale_figure9a(v, scale):
    assert axis_scale(v) == pytest.approx(scale, rel=1e-6)


@pytest.mark.parametrize("v", [2, 4, 6])
def test_figure9a_map_llr_roundtrip(v):
    rng = np.random.default_rng(v)
    bits = rng.integers(0, 2, 1024 * v).astype(np.uint8)
    syms = dvb_t_map_symbols(jnp.asarray(bits), v)
    # unit average energy
    assert float(np.mean(np.abs(np.asarray(syms)) ** 2)) == pytest.approx(
        1.0, rel=0.1)
    llr = np.asarray(dvb_t_soft_llrs(syms, v))
    hard = (llr <= 0).astype(np.uint8)
    assert np.array_equal(hard, bits)


def test_qpsk_figure9a_exact_points():
    # Figure 9a QPSK: bit pair (y0,y1) → ((1-2y0) + j(1-2y1))/√2
    bits = jnp.asarray(np.array([0, 0, 0, 1, 1, 0, 1, 1], np.uint8))
    pts = np.asarray(dvb_t_map_symbols(bits, 2)) * np.sqrt(2)
    want = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j])
    np.testing.assert_allclose(pts, want, atol=1e-6)
