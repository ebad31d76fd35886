"""Polyphase rational resampler tests (beyond the reference — its only rate
changer is the integer FirDecimator)."""

import numpy as np
import pytest

from orion_sdr_tpu import dsp


def _upfirdn_ref(x, taps, up, down, lead, n_out):
    """Naive zero-stuffed reference: y[t] = Σₖ h[k]·z[lead + t·down − k]."""
    n = len(x)
    z = np.zeros((n - 1) * up + 1, dtype=complex)
    z[::up] = x
    L = len(taps)
    y = np.zeros(n_out, dtype=complex)
    for t in range(n_out):
        j = lead + t * down
        for k in range(L):
            if 0 <= j - k < len(z):
                y[t] += taps[k] * z[j - k]
    return y


@pytest.mark.parametrize("up,down", [(3, 2), (2, 3), (7, 4), (1, 5), (5, 1)])
def test_matches_naive_upfirdn(up, down):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(200) + 1j * rng.standard_normal(200)
         ).astype(np.complex64)
    taps = dsp.resample_taps(up, down, taps_per_phase=8)
    y = np.asarray(dsp.resample(x, up, down, taps))
    gd = (len(taps) - 1) // 2
    ref = _upfirdn_ref(x, taps, up, down, gd, len(y))
    assert len(y) == -(-len(x) * up // down)
    np.testing.assert_allclose(y, ref.astype(np.complex64), atol=2e-4)


def _bh4(n):
    """4-term Blackman–Harris analysis window (same rationale as the OOB
    shaping tests: Hann sidelobes would mask the filter's stopband)."""
    k = np.arange(n)
    a = (0.35875, 0.48829, 0.14128, 0.01168)
    return (a[0] - a[1] * np.cos(2 * np.pi * k / n)
            + a[2] * np.cos(4 * np.pi * k / n)
            - a[3] * np.cos(6 * np.pi * k / n))


@pytest.mark.parametrize("up,down", [(3, 2), (160, 147), (2, 5)])
def test_tone_frequency_and_snr(up, down):
    """A tone resampled up/down must land at the same absolute frequency at
    the new rate, clean (>65 dB against the Kaiser 70 dB design)."""
    fs = 48_000.0
    f0 = 5_000.0
    n = 1 << 14
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    y = np.asarray(dsp.resample(x, up, down))
    fs2 = fs * up / down
    m = len(y) // 2
    w = min(4096, m // 2)
    yy = y[m - w:m + w] * _bh4(2 * w)
    spec = np.abs(np.fft.fft(yy)) ** 2
    pk = int(np.argmax(spec))
    f_pk = pk / len(yy) * fs2
    assert abs(f_pk - f0) < fs2 / len(yy) * 1.5
    sig = spec[max(pk - 5, 0):pk + 6].sum()
    rest = spec.sum() - sig
    snr = 10 * np.log10(sig / rest)
    assert snr > 65.0, snr


def test_identity_ratio_is_delay_compensated():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1000).astype(np.float32)
    # a gentle lowpass first so the identity resample sees an in-band signal
    taps = dsp.kaiser_lowpass_taps(63, 0.2, 60.0)
    x, _ = dsp.fir_apply(x, taps)
    x = np.asarray(x)
    y = np.asarray(dsp.resample(x, 7, 7))   # gcd-reduces to 1/1
    assert len(y) == len(x)
    np.testing.assert_allclose(y[50:-50], x[50:-50], atol=1e-3)


@pytest.mark.parametrize("up,down", [(3, 2), (147, 160), (4, 1), (1, 4)])
def test_streaming_chunk_invariance(up, down):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(3000) + 1j * rng.standard_normal(3000)
         ).astype(np.complex64)
    one = dsp.Resampler(up, down)
    y_one = np.concatenate([one.feed(x), one.flush()])

    chunked = dsp.Resampler(up, down)
    parts, i = [], 0
    for sz in rng.integers(1, 400, 100):
        if i >= len(x):
            break
        parts.append(chunked.feed(x[i:i + sz]))
        i += sz
    parts.append(chunked.feed(x[i:]))
    parts.append(chunked.flush())
    y_chunked = np.concatenate(parts)
    assert y_one.shape == y_chunked.shape
    np.testing.assert_allclose(y_chunked, y_one, atol=1e-4)


def test_streaming_matches_one_shot_causal():
    """Stream output = one-shot causal conv of the whole input (the same
    invariant fir_apply keeps), here for up/down = 3/2."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1200).astype(np.float32)
    r = dsp.Resampler(3, 2)
    y = np.concatenate([r.feed(x), r.flush()])
    ref = _upfirdn_ref(x.astype(complex), r.taps, 3, 2, 0,
                       len(y)).real.astype(np.float32)
    np.testing.assert_allclose(y, ref, atol=2e-4)


def test_batched_and_empty():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 500)).astype(np.float32)
    y = np.asarray(dsp.resample(x, 2, 3))
    assert y.shape == (3, -(-500 * 2 // 3))
    for i in range(3):
        np.testing.assert_allclose(
            y[i], np.asarray(dsp.resample(x[i], 2, 3)), atol=1e-5)
    r = dsp.Resampler(2, 3)
    assert r.feed(np.zeros(0, np.float32)).size == 0
    with pytest.raises(ValueError):
        dsp.Resampler(0, 3)


def test_audio_rate_conversion_level():
    """48 kHz → 44.1 kHz (147/160): a full-scale in-band tone keeps its
    amplitude within 0.1 dB."""
    fs = 48_000.0
    n = 1 << 14
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    y = np.asarray(dsp.resample(x, 147, 160))
    mid = y[len(y) // 4: -len(y) // 4]
    level = 20 * np.log10(np.sqrt(2) * np.sqrt(np.mean(mid ** 2)))
    assert abs(level) < 0.1, level
