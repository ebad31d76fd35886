"""WSPR beacon transmitter, wire-compatible with the published protocol
(codec/wspr.py carries the full coding-process provenance): 162 × 4-FSK
continuous-phase tones, fs/8192 spacing, 8192 samples/symbol."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit
from ..dsp.osc import TAU
from ..codec.wspr import wspr_symbols, WSPR_SPS, WSPR_FS


@cjit
def _tones_iq(tones, fs: float, base_hz: float, amplitude: float):
    df = fs / WSPR_SPS
    sym = jnp.repeat(jnp.asarray(tones).astype(jnp.float32), WSPR_SPS)
    freq = base_hz + sym * df
    phase = jnp.cumsum(jnp.float32(TAU / fs) * freq)
    return (amplitude * jnp.exp(1j * phase)).astype(jnp.complex64)


def wspr_mod(callsign: str, grid: str, dbm: int, fs: float = WSPR_FS,
             base_hz: float = 1500.0, amplitude: float = 1.0) -> np.ndarray:
    """Message → ≈110.6 s complex beacon at ``fs`` (must be 12 kHz — the
    numerology is fixed like FT8's)."""
    if fs != WSPR_FS:
        raise ValueError("the WSPR-style numerology is fixed at 12 kHz")
    tones = wspr_symbols(callsign, grid, dbm)
    return np.asarray(_tones_iq(tones, float(fs), float(base_hz),
                                float(amplitude)))
