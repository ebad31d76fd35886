"""Channel impairment simulator tests (beyond-reference subsystem: the
reference qualifies only under seeded AWGN — tests/common/mod.rs:5-48)."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr


FS = 8000.0


def _tone(n=20000, f=500.0, fs=FS):
    t = np.arange(n) / fs
    return np.exp(2j * np.pi * f * t).astype(np.complex64)


# ── oscillator / front-end impairments ───────────────────────────────────────

def test_cfo_apply_roundtrip():
    x = _tone()
    y = sdr.cfo_apply(sdr.cfo_apply(x, 37.5, FS), -37.5, FS)
    assert np.abs(y - x).max() < 1e-5


def test_iq_imbalance_identity_and_irr():
    x = _tone()
    assert np.abs(sdr.iq_imbalance_apply(x, 0.0, 0.0) - x).max() == 0.0
    y = sdr.iq_imbalance_apply(x, 1.0, 5.0)
    X = np.fft.fft(y)
    f = np.fft.fftfreq(len(y), 1 / FS)
    sig = np.abs(X[np.argmin(np.abs(f - 500.0))])
    img = np.abs(X[np.argmin(np.abs(f + 500.0))])
    irr_db = 20 * np.log10(sig / img)
    # closed form: |mu/nu|^2 for g=10^(1/20), phi=5 deg -> 22.83 dB
    g = 10 ** (1 / 20)
    ph = np.deg2rad(5.0)
    mu = 0.5 * (1 + g * np.exp(-1j * ph))
    nu = 0.5 * (1 - g * np.exp(1j * ph))
    assert abs(irr_db - 20 * np.log10(abs(mu) / abs(nu))) < 0.5


def test_phase_noise_identity_power_and_walk_variance():
    rng = np.random.default_rng(3)
    x = _tone()
    assert np.abs(sdr.phase_noise_apply(rng, x, 0.0, FS) - x).max() == 0.0
    y = sdr.phase_noise_apply(rng, x, 2.0, FS)
    assert abs(float(np.mean(np.abs(y) ** 2)) - 1.0) < 1e-3
    # recover the walk and check the per-sample increment variance 2*pi*lw/fs
    phi = np.unwrap(np.angle(y * np.conj(x)))
    incr = np.diff(phi)
    assert abs(incr.var() / (2 * np.pi * 2.0 / FS) - 1.0) < 0.1


# ── static multipath ─────────────────────────────────────────────────────────

def test_multipath_matches_explicit_convolution():
    x = _tone(4000)
    g = [1.0, 0.5j]
    y = sdr.multipath_apply(x, [0, 7], g, normalize=False)
    ref = g[0] * x + np.concatenate(
        [np.zeros(7, np.complex64), np.complex64(g[1]) * x[:-7]])
    assert np.abs(y - ref).max() < 1e-6


def test_multipath_normalized_unit_power():
    rng = np.random.default_rng(0)
    x = sdr.awgn(rng, 1 << 16, 1.0)
    y = sdr.multipath_apply(x, [0, 11, 23], [1.0, 0.6, 0.3j])
    assert abs(float(np.mean(np.abs(y) ** 2)) - 1.0) < 0.05


def test_multipath_batched_leading_dim():
    x = np.stack([_tone(2000, 300.0), _tone(2000, 700.0)])
    y = sdr.multipath_apply(x, [0, 5], [1.0, 0.4])
    y0 = sdr.multipath_apply(x[0], [0, 5], [1.0, 0.4])
    assert np.abs(y[0] - y0).max() < 1e-6


def test_multipath_validation():
    x = _tone(100)
    with pytest.raises(ValueError):
        sdr.multipath_apply(x, [0, 5], [1.0])
    with pytest.raises(ValueError):
        sdr.multipath_apply(x, [-1], [1.0])


# ── fading processes ─────────────────────────────────────────────────────────

def test_fading_taps_unit_power_and_rayleigh_stats():
    rng = np.random.default_rng(7)
    h = sdr.fading_taps(rng, 8192, 100.0, 2.0, "jakes", n_paths=2)
    assert h.shape == (2, 8192) and h.dtype == np.complex64
    for p in range(2):
        env2 = np.abs(h[p]) ** 2
        assert abs(env2.mean() - 1.0) < 1e-3
        # exponential |h|^2: var/mean^2 = 1 (loose — samples correlated)
        assert 0.5 < env2.var() / env2.mean() ** 2 < 1.6


def test_fading_taps_jakes_autocorrelation():
    # R(tau) = J0(2*pi*fd*tau); check the first null region is low and
    # tau=0 is 1 (averaged over paths to tame realization noise)
    from scipy.special import j0  # scipy is available via jax deps
    rng = np.random.default_rng(11)
    fd, rate = 5.0, 200.0
    h = sdr.fading_taps(rng, 16384, rate, fd, "jakes", n_paths=8)
    acs = []
    for lag in [0, 4, 8, 15]:  # tau = lag/rate
        r = np.mean([np.vdot(h[p, : -lag or None],
                             np.roll(h[p], -lag)[: -lag or None]).real /
                     (h.shape[1] - lag) for p in range(8)])
        acs.append(r)
        tau = lag / rate
        assert abs(r - j0(2 * np.pi * fd * tau)) < 0.25
    assert abs(acs[0] - 1.0) < 0.05


def test_fading_taps_gaussian_spectrum_width():
    rng = np.random.default_rng(13)
    sigma, rate = 1.0, 64.0
    h = sdr.fading_taps(rng, 1 << 15, rate, sigma, "gaussian", n_paths=4)
    f = np.fft.fftfreq(h.shape[1], 1 / rate)
    psd = np.mean(np.abs(np.fft.fft(h, axis=1)) ** 2, axis=0)
    rms = np.sqrt(np.sum(f ** 2 * psd) / np.sum(psd))
    assert abs(rms - sigma) / sigma < 0.2


def test_fading_taps_rician_k():
    rng = np.random.default_rng(17)
    h = sdr.fading_taps(rng, 4096, 100.0, 2.0, "jakes", rice_k_db=20.0)[0]
    env = np.abs(h)
    # K=100: envelope std/mean ~ 1/sqrt(2K) ~ 0.07
    assert env.std() / env.mean() < 0.15
    assert abs(float(np.mean(env ** 2)) - 1.0) < 1e-3


def test_fading_taps_validation():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        sdr.fading_taps(rng, 100, 10.0, 0.0)
    with pytest.raises(ValueError):
        sdr.fading_taps(rng, 100, 10.0, 1.0, "unknown")


# ── time-varying application ─────────────────────────────────────────────────

def test_fading_apply_constant_taps_equals_multipath():
    x = _tone(4000)
    taps = np.ones((2, 64), np.complex64)
    taps[1] *= 0.5j
    y = sdr.fading_apply(x, FS, taps, 16.0, [0, 7], normalize=False)
    ref = sdr.multipath_apply(x, [0, 7], [1.0, 0.5j], normalize=False)
    assert np.abs(y - ref).max() < 1e-5


def test_fading_apply_too_short_taps_raises():
    x = _tone(8000)  # 1 s
    taps = np.ones((1, 4), np.complex64)
    with pytest.raises(ValueError):
        sdr.fading_apply(x, FS, taps, 16.0, [0])  # 4 taps @16 Hz = 0.19 s


def test_fading_apply_interpolates_tap_trajectory():
    # single path, linear ramp taps: output = x * ramp(t) exactly
    n = 4000
    x = _tone(n)
    rate = 100.0
    n_taps = int(np.ceil((n - 1) / FS * rate)) + 2
    taps = np.linspace(1.0, 2.0, n_taps).astype(np.complex64)[None]
    y = sdr.fading_apply(x, FS, taps, rate, [0], normalize=False)
    t = np.arange(n) / FS
    ramp = 1.0 + (t * rate) / (n_taps - 1) * 1.0
    assert np.abs(y - x * ramp.astype(np.float32)).max() < 2e-3


def test_watterson_power_and_empty():
    rng = np.random.default_rng(21)
    x = _tone(40000)
    y = sdr.watterson_apply(rng, x, FS, 1e-3, 0.5)
    assert y.shape == x.shape and y.dtype == np.complex64
    assert 0.3 < float(np.mean(np.abs(y) ** 2)) < 3.0
    assert sdr.watterson_apply(rng, np.zeros(0, np.complex64), FS).size == 0


# ── end-to-end receiver qualification ────────────────────────────────────────

def test_ofdm_frame_through_static_echo_within_cp():
    from tests.test_frame import _link, _payload
    from orion_sdr_tpu import OfdmFrameMod, OfdmFrameDemod, FramePacket, McsTable
    from orion_sdr_tpu.frame.types import FrameMetadata
    cfg, pre = _link()
    table = McsTable.default_ladder()
    payload = _payload(150, 6)
    mod = OfdmFrameMod(cfg, table, pre)
    iq = np.asarray(mod.modulate_frame(
        FramePacket(FrameMetadata(1, 1), payload), 7))
    y = sdr.multipath_apply(iq, [0, 4], [1.0, 0.35 * np.exp(0.7j)])
    out = OfdmFrameDemod(cfg, table).decode(y[pre.total_len():])
    assert np.array_equal(out.payload, payload)


def test_ft8_through_watterson_moderate():
    from orion_sdr_tpu.codec.ft8 import ft8_encode, ft8_frame_llr_hard
    from orion_sdr_tpu.modulate.ft8 import ft8_mod
    from orion_sdr_tpu.demodulate.ft8 import ft8_demod
    fs = 12000.0
    rng = np.random.default_rng(42)
    p = rng.integers(0, 256, 10).astype(np.uint8)
    p[9] &= 0xF8
    x = np.asarray(ft8_mod(ft8_encode(p), fs, 1000.0))
    ok = 0
    for seed in (0, 1):
        r = np.random.default_rng(seed)
        y = sdr.watterson_apply(r, x, fs, 1e-3, 0.5)
        sig = float(np.mean(np.abs(y) ** 2))
        y = y + sdr.awgn(r, len(y), np.sqrt(sig * 0.5))
        rx = ft8_demod(y, fs, 1000.0)
        assert rx is not None
        dec = sdr.ft8_decode_soft(ft8_frame_llr_hard(np.asarray(rx)))
        if dec is not None and np.array_equal(np.asarray(dec, np.uint8), p):
            ok += 1
    assert ok == 2


def test_dvb_t_csi_weighted_llrs_through_echo():
    """CSI-weighted Viterbi LLRs (scattered_equalize_csi): a −6 dB echo at
    delay 32 with 6 dB SNR decodes on seeds the UNweighted max-log path
    loses (unweighted: 1/5 of these seeds; weighted: 3/5, incl. both
    below). Guards the max-ratio weighting in _receive_frame_body."""
    from orion_sdr_tpu.waveform.dvb_t import DvbTLinkParams, DvbTFrameParams
    from orion_sdr_tpu.modulate.dvb_t_frame import DvbTFrameMod
    from orion_sdr_tpu.demodulate.dvb_t_frame import DvbTFrameDemod
    params = DvbTFrameParams(DvbTLinkParams("1/32", "qpsk", "1/2"), 0, 0)
    payload = np.random.default_rng(0).integers(0, 256, 400).astype(np.uint8)
    frame = DvbTFrameMod(params).modulate(payload)
    sig_p = float(np.mean(np.abs(frame.iq) ** 2))
    echoed = sdr.multipath_apply(np.asarray(frame.iq), [0, 32],
                                 [1.0, 10 ** (-6 / 20) * np.exp(1.3j)])
    for seed in (11, 14):
        rng = np.random.default_rng(seed)
        buf = echoed + ((rng.standard_normal(len(echoed)) +
                         1j * rng.standard_normal(len(echoed)))
                        .astype(np.complex64) * np.sqrt(sig_p / 10 ** 0.6 / 2))
        rx = DvbTFrameDemod(params).decode(buf, frame.n_symbols, len(payload))
        assert np.array_equal(rx.payload, payload), seed
