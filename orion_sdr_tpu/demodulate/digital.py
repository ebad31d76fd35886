"""Single-carrier digital demod stages (ref: demodulate/{bpsk,qpsk,qam}.rs).

IQ → psk_qam_demod (carrier removal + gain) → soft symbols → decide / soft_llr.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..dsp.device import cjit as _cjit

from ..constellation import decide, soft_llr
from ..dsp.osc import rotate


@_cjit
def psk_qam_demod(iq, fs, rf_hz=0.0, gain=1.0, phase0=0.0):
    """Carrier removal + gain: soft symbol passthrough (ref: BpskDemod etc.).

    Returns (soft_symbols, phase_out)."""
    z = jnp.asarray(iq)
    if rf_hz != 0.0:
        z, phase0 = rotate(z, -rf_hz, fs, phase0)
    return (z * gain).astype(jnp.complex64), phase0


@_cjit
def digital_demod(iq, order, fs, rf_hz=0.0, gain=1.0, phase0=0.0):
    """IQ → hard bits in one call. Returns (bits, phase_out)."""
    soft, phase = psk_qam_demod(iq, fs, rf_hz, gain, phase0)
    return decide(soft, order), phase
