"""POCSAG receiver (beyond the reference): FM discriminator → per-bit
integrate with timing from the 1010… preamble → sync-codeword hunt (both
polarities) → BCH-corrected codeword stream → pages.

The discriminator and bit integration run as one batched device program;
the sync/codeword layer is host-side (kbit/s-rate work)."""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit as _cjit
from ..codec.pocsag import (POCSAG_SYNC, pocsag_check, pocsag_decode_words,
                            PocsagPage)


@_cjit
def _discriminate(re, im):
    z = re + 1j * im
    prev = jnp.concatenate([z[..., :1], z[..., :-1]], axis=-1)
    prod = z * jnp.conj(prev)
    return jnp.arctan2(prod.imag, prod.real).astype(jnp.float32)


def pocsag_demod_bits(iq, fs: float, baud: float = 1200.0) -> np.ndarray:
    """IQ capture → hard bit stream (0 = high frequency, the POCSAG
    sense), bit timing by offset search."""
    z = np.asarray(iq)
    disc = np.asarray(_discriminate(
        np.ascontiguousarray(z.real, np.float32),
        np.ascontiguousarray(z.imag, np.float32)))
    sps = fs / baud
    n_bits = int(len(disc) / sps) - 1
    if n_bits < 64:
        return np.zeros(0, np.uint8)
    idx = np.arange(len(disc))
    best = None
    for off in np.arange(0.0, sps, sps / 8.0):
        k = ((idx - off) / sps).astype(np.int64)
        valid = (k >= 0) & (k < n_bits)
        sums = np.bincount(k[valid], disc[valid], minlength=n_bits)
        score = float(np.mean(np.abs(sums)))
        if best is None or score > best[0]:
            best = (score, sums)
    return (best[1] < 0).astype(np.uint8)       # 0 bit = +freq = +phase step


def pocsag_decode(iq, fs: float, baud: float = 1200.0) -> List[PocsagPage]:
    """IQ capture → pages. Hunts the 32-bit sync codeword in both
    polarities (FM discriminator sign is receiver-dependent), walks
    batches of 16 codewords, BCH-corrects each, re-hunts sync per batch."""
    bits = pocsag_demod_bits(iq, fs, baud)
    pages: List[PocsagPage] = []
    for pol in (0, 1):
        b = bits ^ pol
        if len(b) < 32:
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, 32)
        vals = win @ (1 << np.arange(31, -1, -1)).astype(np.int64)
        sync_pos = np.flatnonzero(vals == POCSAG_SYNC)
        if sync_pos.size == 0:
            continue
        words: List = []
        slot_stream: List = []
        i = int(sync_pos[0])
        while i + 32 <= len(b):
            v = int(vals[i]) if i < len(vals) else None
            if v != POCSAG_SYNC:
                break
            i += 32
            for _ in range(16):
                if i + 32 > len(b):
                    break
                slot_stream.append(pocsag_check(int(vals[i])
                                                if i < len(vals) else 0))
                i += 32
        pages = pocsag_decode_words(slot_stream)
        if pages:
            break
    return pages
