"""Frame/packet types + FEC scheme descriptors (behavioral spec: fec/frame.rs,
modulate/ofdm_frame.rs:125-210).

The concatenated chain these parameterize:
  payload → CRC → [scramble] → outer FEC → outer interleave →
             inner FEC → inner interleave → [scramble] → symbol map
reversed on receive, scrambler position per ``scrambler_pos``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

# ── packet types ─────────────────────────────────────────────────────────────


@dataclass(frozen=True)
class FrameMetadata:
    """Per-frame header metadata (ref fec/frame.rs:37-56)."""
    sequence_num: int = 0
    mcs_index: int = 0
    flags: int = 0


@dataclass
class FramePacket:
    """MAC-layer transport unit: metadata + opaque byte payload."""
    metadata: FrameMetadata
    payload: np.ndarray      # uint8 bytes

    def __init__(self, metadata: FrameMetadata, payload) -> None:
        self.metadata = metadata
        self.payload = np.asarray(
            bytearray(payload) if isinstance(payload, (bytes, bytearray))
            else payload, dtype=np.uint8)


class RxError(Exception):
    """Typed decode failure (ref fec/frame.rs:60-80)."""

    PREAMBLE_TIMEOUT = "no preamble found"
    MALFORMED_HEADER = "malformed frame header"
    HEADER_CRC_MISMATCH = "header CRC mismatch"
    CRC_MISMATCH = "payload CRC mismatch"
    FEC_UNCORRECTABLE = "FEC uncorrectable"

    def __init__(self, kind: str) -> None:
        super().__init__(kind)
        self.kind = kind

    def __eq__(self, other):
        return isinstance(other, RxError) and other.kind == self.kind

    def __hash__(self):
        return hash(self.kind)


# ── scheme descriptors ───────────────────────────────────────────────────────


@dataclass(frozen=True)
class OuterFec:
    """Outer (algebraic, hard-decision) FEC: none | bch(t) | rs(n, n_parity).
    DVB-T's outer code is rs(204, 16)."""
    kind: str = "none"
    t: int = 0
    n: int = 0
    n_parity: int = 0

    @classmethod
    def none(cls):
        return cls()

    @classmethod
    def bch(cls, t: int):
        return cls(kind="bch", t=t)

    @classmethod
    def reed_solomon(cls, n: int, n_parity: int):
        return cls(kind="rs", n=n, n_parity=n_parity)


@dataclass(frozen=True)
class InnerFec:
    """Inner (soft-decision) FEC: none | ldpc(code) | conv(rate, code)."""
    kind: str = "none"
    code: str = ""           # LDPC family name or conv code ("k5"/"dvb_k7")
    rate: str = "1/2"        # puncture rate for conv

    @classmethod
    def none(cls):
        return cls()

    @classmethod
    def ldpc(cls, code: str = "N512R12"):
        return cls(kind="ldpc", code=code)

    @classmethod
    def convolutional(cls, rate: str = "1/2", code: str = "k5"):
        return cls(kind="conv", code=code, rate=rate)


@dataclass(frozen=True)
class InterleaverKind:
    """none | block(rows, cols) | convolutional(branches, depth).
    DVB-T's outer interleaver is convolutional(12, 17)."""
    kind: str = "none"
    rows: int = 0
    cols: int = 0
    branches: int = 0
    depth: int = 0

    @classmethod
    def none(cls):
        return cls()

    @classmethod
    def block(cls, rows: int, cols: int):
        return cls(kind="block", rows=rows, cols=cols)

    @classmethod
    def convolutional(cls, branches: int, depth: int):
        return cls(kind="conv", branches=branches, depth=depth)


def crc_len_bytes(crc: str) -> int:
    """'none' | 'crc16' | 'crc32' → appended byte count."""
    return {"none": 0, "crc16": 2, "crc32": 4}[crc]


@dataclass(frozen=True)
class ScramblerKind:
    """none | additive LFSR | DVB-T energy dispersal (exact standard PRBS).

    ``seed_mode``: 'fixed' (seed known to both ends) or 'per_frame' (random,
    signaled in the header)."""
    kind: str = "none"
    poly: int = 0
    width: int = 0
    seed_mode: str = "fixed"
    seed: int = 0

    @classmethod
    def none(cls):
        return cls()

    @classmethod
    def additive(cls, poly: int, width: int, seed: int = 0,
                 per_frame: bool = False):
        return cls(kind="additive", poly=poly, width=width, seed=seed,
                   seed_mode="per_frame" if per_frame else "fixed")

    @classmethod
    def dvb_t_energy_dispersal(cls):
        return cls(kind="dvb")


SCRAMBLER_BEFORE_OUTER = "before_outer_fec"
SCRAMBLER_AFTER_INNER = "after_inner_fec"

HEADER_ORION_SDR = "orion_sdr"
HEADER_NONE = "no_header"
HEADER_DVB_TPS = "dvb_tps"


def header_has_block(header_format: str) -> bool:
    """Only the OrionSdr format prepends a separately-coded header block."""
    return header_format == HEADER_ORION_SDR


# ── MCS ──────────────────────────────────────────────────────────────────────


@dataclass(frozen=True)
class Mcs:
    """Modulation-and-coding scheme (ref modulate/ofdm_frame.rs:140-160)."""
    constellation: str
    inner_fec: InnerFec
    outer_fec: OuterFec


@dataclass(frozen=True)
class McsTable:
    entries: tuple

    def __init__(self, entries) -> None:
        entries = tuple(entries)
        assert entries, "MCS table must have at least one entry"
        object.__setattr__(self, "entries", entries)

    @classmethod
    def default_ladder(cls) -> "McsTable":
        """BPSK→QAM64, rate-1/2 LDPC inner + BCH(t=8) outer (ref :180-193)."""
        inner = InnerFec.ldpc("N512R12")
        outer = OuterFec.bch(8)
        return cls([Mcs(c, inner, outer)
                    for c in ("bpsk", "qpsk", "qam16", "qam64")])

    def get(self, mcs_index: int) -> Optional[Mcs]:
        if 0 <= mcs_index < len(self.entries):
            return self.entries[mcs_index]
        return None

    def __len__(self) -> int:
        return len(self.entries)


class CodecCache:
    """Drop-in stand-in for the reference's shared FEC-code cache
    (python/__init__.pyi:955-983). Here code construction is memoized
    process-wide (``lru_cache`` on the graph/table builders) and jitted
    programs cache by shape, so a per-link cache object has nothing left to
    do — accepted by the frame mod/demod constructors for source
    compatibility and otherwise inert."""

    def __repr__(self) -> str:  # stable, in case anyone keys on it
        return "CodecCache()"
