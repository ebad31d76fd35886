"""FT8/FT4 streaming decoder (behavioral spec: codec/ft8.rs:159-400).

Host-side accumulate-and-decode driver: feed IQ at 12 kHz; when a full frame
is buffered, run sync (device) → LDPC decode per candidate (device, stops at
the first CRC pass) → unpack77. A CallsignHashTable persists across frames
so hashed nonstandard calls resolve in later messages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from typing import List, Optional

from ..message import CallsignHashTable, unpack77, Ft8Message
from ..modulate.ft8 import (FT8_FRAME_LEN, FT4_FRAME_LEN,
                            FT8_TONE_SPACING_HZ, FT4_TONE_SPACING_HZ)
from ..sync.ft8_sync import ft8_sync, ft4_sync
from .ft8 import ft8_decode_soft, ft4_decode_soft


@dataclass
class Ft8DecodeResult:
    """(ref Ft8DecodeResult)"""
    message: Ft8Message
    carrier_hz: float
    snr_db: float       # Costas score — monotone with true SNR


class Ft8StreamDecoder:
    """Accumulates IQ at 12 kHz and decodes FT8 or FT4 frames."""

    def __init__(self, fs: float, base_hz: float, max_hz: float,
                 max_cand: int = 4, ft8: bool = True) -> None:
        self.fs = float(fs)
        self.base_hz = float(base_hz)
        self.max_hz = float(max_hz)
        self.max_cand = max(int(max_cand), 1)
        self.is_ft8 = ft8
        self.frame_len = FT8_FRAME_LEN if ft8 else FT4_FRAME_LEN
        self._buf = np.zeros(0, np.complex64)
        self.hash_table = CallsignHashTable()

    @classmethod
    def new_ft8(cls, fs: float, base_hz: float, max_hz: float,
                max_cand: int = 4):
        return cls(fs, base_hz, max_hz, max_cand, ft8=True)

    @classmethod
    def new_ft4(cls, fs: float, base_hz: float, max_hz: float,
                max_cand: int = 4):
        return cls(fs, base_hz, max_hz, max_cand, ft8=False)

    def __len__(self) -> int:
        return len(self._buf)

    def view_buf(self) -> np.ndarray:
        return self._buf

    def clear(self) -> None:
        self._buf = np.zeros(0, np.complex64)

    def feed(self, iq) -> List[Ft8DecodeResult]:
        """Append samples; decode when a full frame is buffered."""
        from ..dsp.device import sanitize_iq
        self._buf = np.concatenate([self._buf, sanitize_iq(iq)])
        if len(self._buf) >= self.frame_len:
            return self._decode_buf()
        return []

    def flush(self) -> List[Ft8DecodeResult]:
        """Decode whatever is buffered (does not clear the buffer)."""
        if len(self._buf) == 0:
            return []
        return self._decode_buf()

    def _decode_buf(self) -> List[Ft8DecodeResult]:
        spacing = FT8_TONE_SPACING_HZ if self.is_ft8 else FT4_TONE_SPACING_HZ
        search_min = self.base_hz
        search_max = max(self.max_hz + spacing, search_min + spacing)
        sync = ft8_sync if self.is_ft8 else ft4_sync
        decode = ft8_decode_soft if self.is_ft8 else ft4_decode_soft
        for cand in sync(self._buf, self.fs, search_min, search_max,
                         0, 0, self.max_cand):
            payload = decode(cand.llr)
            # the all-zero codeword is CRC-consistent, so silence would
            # otherwise "decode" as an empty free-text message — reject it
            if payload is not None and np.any(payload):
                msg = unpack77(payload, self.hash_table)
                return [Ft8DecodeResult(
                    message=msg,
                    carrier_hz=self.base_hz + cand.freq_bin * spacing,
                    snr_db=cand.score)]
        return []


def _decode_windows(windows, fs, base_hz, max_hz, max_cand, hash_table, ft8):
    from . import ft8_ldpc
    from .ft8 import FT4_XOR
    from ..message import unpack77 as _unpack
    from ..sync.ft8_sync import ft8_sync_batch, ft4_sync_batch

    from ..dsp.device import sanitize_iq
    windows = sanitize_iq(windows)
    assert windows.ndim == 2
    ht = hash_table if hash_table is not None else CallsignHashTable()
    spacing = FT8_TONE_SPACING_HZ if ft8 else FT4_TONE_SPACING_HZ
    sync_batch = ft8_sync_batch if ft8 else ft4_sync_batch

    cands_per_win = sync_batch(windows, fs, base_hz,
                               max(max_hz + spacing, base_hz + spacing),
                               max_cand)
    all_llrs = [c.llr for cands in cands_per_win for c in cands]
    if not all_llrs:
        return [None] * len(windows)

    # one batched BP over every candidate of every window
    llr_mat = np.stack(all_llrs).astype(np.float32)
    bits, errs = ft8_ldpc.ldpc_decode_soft(llr_mat)
    bits = np.asarray(bits)
    errs = np.asarray(errs)

    from .ft8_crc import ft8_check_crc
    results: List[Optional[Ft8DecodeResult]] = []
    k = 0
    for cands in cands_per_win:
        hit = None
        for c in cands:
            if hit is None and errs[k] == 0:
                a91 = np.packbits(np.concatenate(
                    [bits[k].astype(np.uint8), np.zeros(5, np.uint8)]))
                if ft8_check_crc(a91) and np.any(a91[:10]):
                    payload = a91[:10].copy()
                    if not ft8:
                        payload = (payload ^ FT4_XOR).astype(np.uint8)
                    payload[9] &= 0xF8
                    hit = Ft8DecodeResult(
                        message=_unpack(payload, ht),
                        carrier_hz=base_hz + c.freq_bin * spacing,
                        snr_db=c.score)
            k += 1
        results.append(hit)
    return results


def ft8_decode_windows(windows, fs: float = 12000.0, base_hz: float = 200.0,
                       max_hz: float = 3000.0, max_cand: int = 4,
                       hash_table: Optional[CallsignHashTable] = None):
    """Batch-decode many 15 s FT8 receive windows (BASELINE.json config 3).

    ``windows``: (B, n) IQ at 12 kHz. ONE fused device program computes every
    window's waterfall + Costas score grid + top-k; every candidate's 174
    LLRs across ALL windows then decode in ONE batched LDPC BP call, and
    each window keeps its first CRC-passing candidate. Returns a list
    (len B) of Ft8DecodeResult-or-None.
    """
    return _decode_windows(windows, fs, base_hz, max_hz, max_cand,
                           hash_table, ft8=True)


def ft4_decode_windows(windows, fs: float = 12000.0, base_hz: float = 200.0,
                       max_hz: float = 3000.0, max_cand: int = 4,
                       hash_table: Optional[CallsignHashTable] = None):
    """ft8_decode_windows for 7.5 s FT4 windows (XOR-descrambled payloads)."""
    return _decode_windows(windows, fs, base_hz, max_hz, max_cand,
                           hash_table, ft8=False)


def _decode_multi_frame(frames, fs, base_hz, max_hz, max_cand, ft8,
                        hash_table, max_iter: int = 30
                        ) -> Optional[Ft8DecodeResult]:
    from ..sync.ft8_sync import ft_sync_multi
    from ..dsp.device import sanitize_iq
    frames = sanitize_iq(frames)
    spacing = FT8_TONE_SPACING_HZ if ft8 else FT4_TONE_SPACING_HZ
    decode = ft8_decode_soft if ft8 else ft4_decode_soft
    ht = hash_table if hash_table is not None else CallsignHashTable()
    for cand in ft_sync_multi(frames, fs, base_hz,
                              max(max_hz + spacing, base_hz + spacing),
                              max_cand, "ft8" if ft8 else "ft4"):
        payload = decode(cand.llr, max_iter)
        if payload is not None and np.any(payload):
            return Ft8DecodeResult(
                message=unpack77(payload, ht),
                carrier_hz=base_hz + cand.freq_bin * spacing,
                snr_db=cand.score)
    return None


def ft8_decode_multi_frame(frames, fs: float = 12000.0,
                           base_hz: float = 200.0, max_hz: float = 3000.0,
                           max_cand: int = 4, hash_table=None,
                           max_iter: int = 30) -> Optional[Ft8DecodeResult]:
    """Multi-frame averaging FT8 decode (beyond-reference sensitivity).

    ``frames``: (n_frames, 151680) — frame-aligned captures of the SAME
    message repeated over successive 15-s cycles (the WSJT-X multi-frame
    averaging scenario behind its −21 dB floor; the single-frame reference
    stops at −15). Candidates come from the SUMMED Costas score grids and
    their LLRs are summed across frames before one LDPC decode — each
    doubling of n_frames is worth ~1.5 dB of decode floor.
    """
    return _decode_multi_frame(frames, fs, base_hz, max_hz, max_cand,
                               True, hash_table, max_iter)


def ft4_decode_multi_frame(frames, fs: float = 12000.0,
                           base_hz: float = 200.0, max_hz: float = 3000.0,
                           max_cand: int = 4, hash_table=None,
                           max_iter: int = 30) -> Optional[Ft8DecodeResult]:
    """Multi-frame averaging FT4 decode — see ft8_decode_multi_frame
    ((n_frames, 60480) captures)."""
    return _decode_multi_frame(frames, fs, base_hz, max_hz, max_cand,
                               False, hash_table, max_iter)
