"""AIS receiver (beyond the reference): FM discriminator → bit-rate
slicing with timing search → NRZI decode → shared HDLC layer → ITU-R
M.1371 position parse. The discriminator and decision sampling are one
device-friendly pass; the frame layer is host-side."""

from __future__ import annotations

from typing import List

import numpy as np

from ..modulate.ais import AIS_BAUD
from ..modulate.afsk import nrzi_decode
from .afsk import _best_bit_values


def ais_demod_bits(iq, fs: float) -> np.ndarray:
    """GMSK capture → HDLC bit stream (post-NRZI-decode)."""
    z = np.asarray(iq)
    if len(z) < 64:
        return np.zeros(0, np.uint8)
    prod = z[1:] * np.conj(z[:-1])
    disc = np.arctan2(prod.imag, prod.real).astype(np.float32)
    # matched lowpass: the GMSK eye (±2π·dev/fs ≈ ±0.16 rad at 10 sps)
    # is SMALLER than the per-sample discriminator noise at useful SNRs —
    # the receive Gaussian filter buys the √sps coherent gain back
    from ..modulate.ais import _gauss_taps
    g = _gauss_taps(fs, AIS_BAUD, 0.5)
    disc = np.convolve(disc, g, mode="same").astype(np.float32)
    # one bit-time of zero tail: the slicer's floor() must not drop the
    # closing flag's final bit
    disc = np.concatenate([disc[:1], disc,
                           np.zeros(int(fs / AIS_BAUD) + 2, np.float32)])
    vals = _best_bit_values(disc, fs / AIS_BAUD)
    if vals.size == 0:
        return np.zeros(0, np.uint8)
    return nrzi_decode((vals > 0).astype(np.uint8))


def ais_decode(iq, fs: float) -> List:
    """Capture → [codec.ais.AisPosition] (FCS-gated)."""
    from ..codec.ais import ais_bits_to_positions
    return ais_bits_to_positions(ais_demod_bits(iq, fs))
