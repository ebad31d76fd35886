"""CRC-14 for FT8/FT4, polynomial 0x2757 (behavioral spec: codec/crc.rs;
algorithm from the public ft8_lib protocol definition).

The CRC covers the 77-bit payload zero-extended to 82 bits (the 14 CRC bits
are never fed back in). a91 layout (12 bytes): bits 0-76 payload,
bits 77-90 CRC, bits 91-95 zero.
"""

from __future__ import annotations

import numpy as np

CRC14_POLY = 0x2757
_WIDTH = 14
_TOP = 1 << (_WIDTH - 1)


def ft8_crc14(message: np.ndarray, num_bits: int) -> int:
    """Bitwise CRC-14 over the first ``num_bits`` bits (MSB first)."""
    msg = np.asarray(message, dtype=np.uint8)
    rem = 0
    idx_byte = 0
    for idx_bit in range(num_bits):
        if idx_bit % 8 == 0:
            rem ^= int(msg[idx_byte]) << (_WIDTH - 8)
            idx_byte += 1
        if rem & _TOP:
            rem = ((rem << 1) ^ CRC14_POLY) & 0x3FFF
        else:
            rem = (rem << 1) & 0x3FFF
    return rem


def ft8_add_crc(payload: np.ndarray) -> np.ndarray:
    """77-bit payload (10 bytes) → 91-bit a91 block (12 bytes)."""
    a91 = np.zeros(12, np.uint8)
    a91[:10] = np.asarray(payload, dtype=np.uint8)
    a91[9] &= 0xF8           # slack bits 77-79 must be zero
    checksum = ft8_crc14(a91, 96 - 14)   # bits 0..81
    a91[9] |= (checksum >> 11) & 0x07
    a91[10] = (checksum >> 3) & 0xFF
    a91[11] = (checksum << 5) & 0xFF
    return a91


def ft8_extract_crc(a91: np.ndarray) -> int:
    """CRC from bits 77..90 of a packed a91 block."""
    a = np.asarray(a91, dtype=np.uint8)
    return ((int(a[9]) & 0x07) << 11) | (int(a[10]) << 3) | (int(a[11]) >> 5)


def ft8_check_crc(a91: np.ndarray) -> bool:
    """True iff the embedded CRC matches the payload's CRC."""
    a = np.array(a91, dtype=np.uint8, copy=True)
    extracted = ft8_extract_crc(a)
    a[9] &= 0xF8
    a[10] = 0
    a[11] = 0
    return extracted == ft8_crc14(a, 82)
