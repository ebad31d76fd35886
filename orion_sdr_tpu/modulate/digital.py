"""Single-carrier digital waveform stages (ref: modulate/{bpsk,qpsk,qam}.rs).

Two-stage split matching the reference's design (docs/design.md:47-89):
bits → map_bits → symbols → psk_qam_mod → IQ. The waveform stage is just
gain + optional carrier rotation; rf_hz == 0 is a baseband passthrough.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dsp.device import cjit as _cjit

from ..constellation import map_bits, BITS_PER_SYMBOL
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
