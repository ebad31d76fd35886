"""Single-carrier digital waveform stages (ref: modulate/{bpsk,qpsk,qam}.rs).

Two-stage split matching the reference's design (docs/design.md:47-89):
bits → map_bits → symbols → psk_qam_mod → IQ. The waveform stage is just
gain + optional carrier rotation; rf_hz == 0 is a baseband passthrough.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dsp.device import cjit as _cjit

from ..constellation import map_bits
from ..dsp.osc import rotate


@_cjit
def psk_qam_mod(symbols, fs, rf_hz=0.0, gain=1.0, phase0=0.0):
    """Symbols → IQ at rf_hz (ref: BpskMod/QpskMod/QamMod). Returns (iq, phase)."""
    s = jnp.asarray(symbols) * gain
    if rf_hz == 0.0:
        return s.astype(jnp.complex64), phase0
    return rotate(s, rf_hz, fs, phase0)


@_cjit
def digital_mod(bits, order, fs, rf_hz=0.0, gain=1.0, phase0=0.0):
    """bits → symbols → IQ in one call. Returns (iq, phase_out)."""
    return psk_qam_mod(map_bits(bits, order), fs, rf_hz, gain, phase0)


def rrc_taps(sps: int, beta: float = 0.35, span: int = 8):
    """Root-raised-cosine pulse, unit energy (beyond the reference, whose
    single-carrier waveform is symbol-rate only)."""
    import numpy as np
    n = span * sps
    t = (np.arange(-n, n + 1)) / sps
    taps = np.zeros_like(t)
    for i, ti in enumerate(t):
        if abs(ti) < 1e-9:
            taps[i] = 1.0 - beta + 4 * beta / np.pi
        elif abs(abs(4 * beta * ti) - 1.0) < 1e-9:
            taps[i] = (beta / np.sqrt(2)) * (
                (1 + 2 / np.pi) * np.sin(np.pi / (4 * beta))
                + (1 - 2 / np.pi) * np.cos(np.pi / (4 * beta)))
        else:
            taps[i] = (np.sin(np.pi * ti * (1 - beta))
                       + 4 * beta * ti * np.cos(np.pi * ti * (1 + beta))) \
                / (np.pi * ti * (1 - (4 * beta * ti) ** 2))
    return (taps / np.sqrt(np.sum(taps ** 2))).astype(np.float32)


def burst_mod(bits, order: str, sps: int, beta: float = 0.35,
              span: int = 8, preamble_syms=None):
    """Oversampled RRC-shaped single-carrier burst: optional known
    preamble symbols + mapped payload, zero-stuffed ×sps and pulse-shaped.
    Returns complex64 IQ at sps samples/symbol (beyond the reference)."""
    import numpy as np
    from ..dsp.fir import fir_filter_aligned
    syms = np.asarray(map_bits(jnp.asarray(bits), order))
    if preamble_syms is not None:
        syms = np.concatenate([np.asarray(preamble_syms, np.complex64),
                               syms])
    up = np.zeros(len(syms) * sps, np.complex64)
    up[::sps] = syms
    taps = rrc_taps(sps, beta, span) * np.sqrt(sps)
    return np.asarray(fir_filter_aligned(jnp.asarray(up), taps)
                      ).astype(np.complex64)


def burst_preamble(n: int = 32, seed: int = 7):
    """A fixed QPSK preamble both ends share (resolves timing and the
    constellation's 90° rotational ambiguity at the receiver)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, n)
    return (np.exp(1j * (np.pi / 4 + np.pi / 2 * q))
            ).astype(np.complex64)
