"""POCSAG transmitter (beyond the reference): preamble + batches as direct
binary FSK at IQ baseband (±deviation, NRZ, continuous phase — one cumsum
phase accumulator, no per-bit loop). POCSAG convention: a 0 bit is the
HIGH frequency."""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit as _cjit
from ..dsp.osc import TAU

POCSAG_PREAMBLE_BITS = 576


@_cjit
def _fsk_iq(bits, fs: float, sps: float, deviation_hz: float, n: int):
    t_idx = jnp.arange(n, dtype=jnp.float32)
    k = jnp.minimum(jnp.floor(t_idx / sps).astype(jnp.int32),
                    bits.shape[-1] - 1)
    sel = jnp.asarray(bits)[k].astype(jnp.float32)
    freq = deviation_hz * (1.0 - 2.0 * sel)      # 0 bit = +deviation
    phase = jnp.cumsum(jnp.float32(TAU / fs) * freq)
    return jnp.exp(1j * phase).astype(jnp.complex64)


def pocsag_mod(pages, fs: float, baud: float = 1200.0,
               deviation_hz: float = 4500.0) -> np.ndarray:
    """Pages (codec.pocsag.PocsagPage) → complex64 FSK capture: 576-bit
    1010… preamble, then sync+batch codewords MSB-first."""
    from ..codec.pocsag import pocsag_encode_batches
    if fs < 4.0 * deviation_hz:
        raise ValueError(f"fs must exceed {4 * deviation_hz:.0f} Hz")
    words = pocsag_encode_batches(list(pages))
    bits: List[int] = [(i + 1) & 1 for i in range(POCSAG_PREAMBLE_BITS)]
    for w in words:
        bits.extend((w >> (31 - j)) & 1 for j in range(32))
    b = np.asarray(bits, np.uint8)
    sps = fs / baud
    n = int(round(len(b) * sps))
    return np.asarray(_fsk_iq(jnp.asarray(b), float(fs), float(sps),
                              float(deviation_hz), n))
