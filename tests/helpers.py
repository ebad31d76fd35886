"""Shared test helpers (mirrors the role of reference tests/common/mod.rs)."""

import numpy as np


def tone_snr_db(fs: float, f0: float, x) -> float:
    """Tone-vs-off-tone projection ratio (ref tests/common/mod.rs:9-24).

    Projects onto f0 and onto 0.73·f0; the ratio in dB is the test metric the
    reference gates its analog roundtrips on (> 20 dB etc.).
    """
    x = np.asarray(x, dtype=np.float64)
    n = max(len(x), 1)

    def proj(f):
        w = -2.0 * np.pi * f / fs
        t = w * np.arange(n)
        re = float(np.sum(x * np.cos(t)))
        im = float(np.sum(x * np.sin(t)))
        return (re * re + im * im) / (n * n)

    return 10.0 * np.log10(proj(f0) / (proj(f0 * 0.73) + 1e-20))


def tail(x, frac: float = 0.5) -> np.ndarray:
    """Drop the leading transient; keep the last `frac` of the signal."""
    x = np.asarray(x)
    return x[int(len(x) * (1.0 - frac)):]


def add_awgn(rng: np.random.Generator, x, noise_power: float):
    """Complex AWGN with total noise power `noise_power` (per complex sample)."""
    x = np.asarray(x)
    scale = np.sqrt(noise_power / 2.0)
    n = scale * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
    return (x + n).astype(np.complex64)
