"""DVB-T waveform building blocks (behavioral spec: waveform/dvb_t.rs,
ETSI EN 300 744). Started with the energy-dispersal PRBS (used by the frame
layer's ScramblerKind 'dvb'); the 2K numerology/pilots/TPS land with the
full DVB-T assembly.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# PRBS 1 + X^14 + X^15, init 100101010000000 (MSB-first), output = feedback
# bit (EN 300 744 §4.3.1; ref waveform/dvb_t.rs:32-110). Known answer: the
# first 8 output bits pack to 0x03.
_DISPERSAL_INIT = 0b100101010000000


@lru_cache(maxsize=16)
def dvb_t_prbs_bits(n_bits: int, init: int = _DISPERSAL_INIT) -> np.ndarray:
    """First ``n_bits`` of the energy-dispersal PRBS as uint8 bits."""
    reg = init
    out = np.empty(n_bits, np.uint8)
    for i in range(n_bits):
        fb = ((reg >> 1) ^ reg) & 1       # X^15 ⊕ X^14 (LSB = newest? see map)
        out[i] = fb
        reg = (reg >> 1) | (fb << 14)
    return out


@lru_cache(maxsize=16)
def dvb_t_prbs_bytes(n_bytes: int, init: int = _DISPERSAL_INIT) -> np.ndarray:
    return np.packbits(dvb_t_prbs_bits(n_bytes * 8, init))


def energy_disperse(data, skip_first: int = 0) -> np.ndarray:
    """XOR the dispersal PRBS over ``data`` bytes (self-inverse).

    ``skip_first``: clock the PRBS over this many leading bytes without
    applying it (the TS layer's sync-byte handling uses offsets)."""
    d = np.asarray(data, np.uint8)
    pn = dvb_t_prbs_bytes(skip_first + d.shape[-1])
    return d ^ pn[skip_first:]
