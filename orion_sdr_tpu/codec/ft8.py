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


def ft8_ap_prior(call_a: Optional[str] = None, call_b: Optional[str] = None,
                 hash_table=None, ft4: bool = False):
    """A-priori decoding prior (WSJT-X "AP" — beyond the reference).

    A caller usually knows part of the message it is listening for: "CQ"
    in the first callsign slot, or its own call in either slot. The
    standard-message layout (message/message.py) is c28a r1a c28b r1b R1
    g15 i3, so fixing a slot pins 29 systematic codeword bits. Returns
    ``(positions, bits)`` over the 174-bit codeword, suitable for
    :func:`ft8_decode_soft`'s ``ap=`` argument (``ft4=True`` applies the
    FT4 payload scrambling so the bits are in codeword domain).
    """
    from ..message.callsign import pack28
    from ..message import CallsignHashTable
    ht = hash_table if hash_table is not None else CallsignHashTable()
    xor_bits = np.unpackbits(FT4_XOR)[:77] if ft4 else np.zeros(77, np.uint8)
    idx: list = []
    val: list = []
    for call, base in ((call_a, 0), (call_b, 29)):
        if call is None:
            continue
        packed = pack28(call, ht)
        if packed is None:
            raise ValueError(f"cannot pack callsign {call!r} for AP")
        n28, ip = packed
        b = np.unpackbits(np.array([(n28 >> 24) & 255, (n28 >> 16) & 255,
                                    (n28 >> 8) & 255, n28 & 255],
                                   np.uint8))[4:]
        bits29 = np.concatenate([b, [np.uint8(ip)]])
        pos = np.arange(base, base + 29)
        idx.append(pos)
        val.append(bits29 ^ xor_bits[pos])
    if not idx:
        raise ValueError("ft8_ap_prior needs at least one callsign")
    return (np.concatenate(idx).astype(np.int64),
            np.concatenate(val).astype(np.uint8))


def apply_ap_prior(llr, ap, amp: Optional[float] = None) -> np.ndarray:
    """Clamp the known-bit positions of (..., 174) LLRs to ±``amp``
    (default 4·rms + 8 — dominant but finite, mirroring WSJT-X)."""
    idx, bits = ap
    llr = np.array(llr, np.float32, copy=True)
    if amp is None:
        amp = 4.0 * float(np.sqrt(np.mean(llr ** 2))) + 8.0
    llr[..., idx] = np.where(bits == 0, np.float32(amp), np.float32(-amp))
    return llr


def ft8_decode_soft(llr, max_iter: int = 20, ap=None) -> Optional[np.ndarray]:
    """174 soft LLRs (positive ⇒ bit 0) → 77-bit payload or None.

    ``ap``: optional ``(positions, bits)`` a-priori prior from
    :func:`ft8_ap_prior`; the known bits are clamped before BP and the
    decode is rejected unless the result reproduces them (guards the
    CRC-14 against prior-seeded false converges).
    """
    if ap is None:
        return _decode_llr(llr, max_iter)
    payload = _decode_llr(apply_ap_prior(llr, ap), max_iter)
    if payload is None:
        return None
    idx, bits = ap
    got = np.unpackbits(payload)[:77]
    return payload if np.array_equal(got[idx], bits) else None


def ft4_decode_soft(llr, max_iter: int = 20, ap=None) -> Optional[np.ndarray]:
    """``ap``: prior from ``ft8_ap_prior(..., ft4=True)`` — bits are in the
    scrambled codeword domain, verified there before descrambling."""
    if ap is not None:
        llr = apply_ap_prior(llr, ap)
    payload = _decode_llr(llr, max_iter)
    if payload is None:
        return None
    if ap is not None:
        idx, bits = ap
        got = np.unpackbits(payload)[:77]
        if not np.array_equal(got[idx], bits):
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
