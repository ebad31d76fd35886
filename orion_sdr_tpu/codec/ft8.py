"""FT8/FT4 channel codecs (behavioral spec: codec/ft8.rs, codec/ft4.rs).

Encode: 77-bit payload → CRC-14 → LDPC(174,91) → Gray → tone indices
(58 × 3-bit for FT8, 87 × 2-bit for FT4; FT4 additionally XOR-scrambles the
payload before the CRC). Decode: LLRs → LDPC BP → CRC check → payload.

Bit↔byte plumbing is numpy (host); the LDPC encode/decode run on device and
batch over frames/candidates.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .ft8_crc import ft8_add_crc, ft8_check_crc
from .gray import gray8_encode, gray8_decode, gray4_encode, gray4_decode
from . import ft8_ldpc

FT8_DATA_SYMS = 58
FT4_DATA_SYMS = 87

# FT4 payload XOR scramble (ft8_lib kFT4_XOR_sequence).
FT4_XOR = np.array([0x4A, 0x5E, 0x89, 0xB4, 0xB0, 0x8A, 0x79, 0x55, 0xBE, 0x28],
                   np.uint8)


def _payload_to_codeword_bits(payload: np.ndarray) -> np.ndarray:
    """payload (10 bytes) → (174,) codeword bits via CRC + LDPC."""
    a91 = ft8_add_crc(payload)
    msg_bits = np.unpackbits(a91)[:ft8_ldpc.K]
    return np.asarray(ft8_ldpc.ldpc_encode(msg_bits))


def ft8_encode(payload) -> np.ndarray:
    """77-bit payload (10 bytes) → 58 Gray-coded tone indices (0-7)."""
    cw = _payload_to_codeword_bits(np.asarray(payload, np.uint8))
    bins = cw.reshape(FT8_DATA_SYMS, 3) @ np.array([4, 2, 1], np.uint8)
    return gray8_encode(bins)


def ft4_encode(payload) -> np.ndarray:
    """77-bit payload (10 bytes) → 87 Gray-coded tone indices (0-3)."""
    scrambled = (np.asarray(payload, np.uint8) ^ FT4_XOR).astype(np.uint8)
    cw = _payload_to_codeword_bits(scrambled)
    bins = cw.reshape(FT4_DATA_SYMS, 2) @ np.array([2, 1], np.uint8)
    return gray4_encode(bins)


def _decode_llr(llr, max_iter: int = 20) -> Optional[np.ndarray]:
    """174 LLRs → 10-byte payload (still scrambled for FT4) or None."""
    bits, errs = ft8_ldpc.ldpc_decode_soft(np.asarray(llr, np.float32), max_iter)
    if int(errs) != 0:
        return None
    a91 = np.packbits(np.concatenate([np.asarray(bits, np.uint8),
                                      np.zeros(5, np.uint8)]))
    if not ft8_check_crc(a91):
        return None
    payload = a91[:10].copy()
    payload[9] &= 0xF8
    return payload


def ft8_decode_soft(llr, max_iter: int = 20) -> Optional[np.ndarray]:
    """174 soft LLRs (positive ⇒ bit 0) → 77-bit payload or None."""
    return _decode_llr(llr, max_iter)


def ft4_decode_soft(llr, max_iter: int = 20) -> Optional[np.ndarray]:
    payload = _decode_llr(llr, max_iter)
    if payload is None:
        return None
    payload = (payload ^ FT4_XOR).astype(np.uint8)
    payload[9] &= 0xF8
    return payload


def ft8_frame_llr_hard(tones) -> np.ndarray:
    """Hard tone decisions → ±10 LLRs (ref frame_to_llr_hard)."""
    bins = gray8_decode(np.asarray(tones, np.uint8))
    bits = np.unpackbits(bins[:, None], axis=1)[:, 5:8].reshape(-1)
    return np.where(bits == 0, 10.0, -10.0).astype(np.float32)


def ft4_frame_llr_hard(tones) -> np.ndarray:
    bins = gray4_decode(np.asarray(tones, np.uint8))
    bits = np.unpackbits(bins[:, None], axis=1)[:, 6:8].reshape(-1)
    return np.where(bits == 0, 10.0, -10.0).astype(np.float32)


def ft8_decode_hard(tones, max_iter: int = 20) -> Optional[np.ndarray]:
    return ft8_decode_soft(ft8_frame_llr_hard(tones), max_iter)


def ft4_decode_hard(tones, max_iter: int = 20) -> Optional[np.ndarray]:
    return ft4_decode_soft(ft4_frame_llr_hard(tones), max_iter)
