"""Generic frame CRCs (ref: /root/reference/src/codec/crc.rs:94-130).

Table-driven, vectorized over bytes where possible; known answers:
crc16(b"123456789") == 0x29B1, crc32(b"123456789") == 0xCBF43926.
"""

from __future__ import annotations

import numpy as np


def _crc16_table():
    poly = 0x1021
    t = np.zeros(256, np.uint16)
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ poly if crc & 0x8000 else crc << 1) & 0xFFFF
        t[b] = crc
    return t


def _crc32_table():
    poly = 0xEDB88320
    t = np.zeros(256, np.uint32)
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        t[b] = crc
    return t


_T16 = _crc16_table()
_T32 = _crc32_table()


def _as_bytes(data) -> np.ndarray:
    if isinstance(data, (bytes, bytearray, memoryview)):
        return np.frombuffer(data, dtype=np.uint8)
    return np.asarray(data, np.uint8)


def crc16(data) -> int:
    """CRC-16/CCITT-FALSE: poly 0x1021, init 0xFFFF, non-reflected, no xorout."""
    crc = 0xFFFF
    for b in _as_bytes(data).tolist():
        crc = ((crc << 8) & 0xFFFF) ^ int(_T16[((crc >> 8) ^ b) & 0xFF])
    return crc


def crc32(data) -> int:
    """CRC-32/ISO-HDLC: reflected poly 0xEDB88320, init/xorout 0xFFFFFFFF."""
    crc = 0xFFFFFFFF
    for b in _as_bytes(data).tolist():
        crc = (crc >> 8) ^ int(_T32[(crc ^ b) & 0xFF])
    return crc ^ 0xFFFFFFFF
