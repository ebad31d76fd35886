"""Streaming PSK31 decode pipeline (behavioral spec: codec/psk31.rs:400-572).

Host-side feed/flush driver around the device demod: IQ chunks are buffered
to whole symbols, the decision-feedback matched filter + PLL runs on device
with its (prev_sym, phase_acc) carry held across feeds, and the text layers
(Viterbi for QPSK, varicode) run on host. Chunk-boundary invariant: feeding
sample-by-sample decodes identically to one-shot.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from .varicode import VaricodeDecoder
from .psk31 import StreamingViterbi, DQPSK_EXP
from ..demodulate.psk31 import stream_step, bpsk31_decide
from ..modulate.psk31 import psk31_sps


class Psk31Stream:
    """Persistent streaming PSK31 text decoder (BPSK31 or QPSK31)."""

    def __init__(self, fs: float, carrier_hz: float = 0.0, gain: float = 1.0,
                 qpsk: bool = False) -> None:
        self.fs = float(fs)
        self.carrier_hz = float(carrier_hz)
        self.gain = float(gain)
        self.qpsk = qpsk
        self.sps = psk31_sps(fs)
        self._buf = np.zeros(0, np.complex64)
        self._fed_up_to = 0
        self._n_mixed = 0               # samples already through the rotator
        self._prev_sym = 1.0 + 0.0j
        self._phase_acc = 0.0
        self.vdec = VaricodeDecoder()
        self.viterbi = StreamingViterbi(DQPSK_EXP) if qpsk else None

    @classmethod
    def new_bpsk(cls, fs: float, carrier_hz: float = 0.0, gain: float = 1.0):
        return cls(fs, carrier_hz, gain, qpsk=False)

    @classmethod
    def new_qpsk(cls, fs: float, carrier_hz: float = 0.0, gain: float = 1.0):
        return cls(fs, carrier_hz, gain, qpsk=True)

    @property
    def fed_up_to(self) -> int:
        return self._fed_up_to

    def feed(self, iq) -> str:
        """Feed IQ samples; returns newly decoded printable ASCII."""
        from ..dsp.device import sanitize_iq
        iq = sanitize_iq(iq)
        if iq.size == 0:
            return ""
        self._fed_up_to += len(iq)
        self._buf = np.concatenate([self._buf, iq])
        n_syms = len(self._buf) // self.sps
        if n_syms == 0:
            return ""
        take = n_syms * self.sps
        z = self._buf[:take]
        self._buf = self._buf[take:]
        # continue the down-mix phase across feeds
        phase0 = np.float32(-2.0 * np.pi * self.carrier_hz
                            * self._n_mixed / self.fs)
        self._n_mixed += take
        soft, prev_sym, phase_acc = stream_step(
            z, phase0, np.complex64(self._prev_sym),
            np.float32(self._phase_acc), self.sps, self.gain, self.qpsk,
            self.carrier_hz, self.fs)
        self._prev_sym = complex(prev_sym)
        self._phase_acc = float(phase_acc)

        if not self.qpsk:
            return self.vdec.push_bits(bpsk31_decide(np.asarray(soft.real)))

        text = []
        for d_re, d_im in np.asarray(soft):
            if d_re * d_re + d_im * d_im < 0.01:   # silence/startup skip
                continue
            b = self.viterbi.feed_symbol(float(d_re), float(d_im))
            if b is not None:
                text.append(self.vdec.push_bits([b]))
        return "".join(text)

    def flush(self) -> str:
        """Emit trailing characters after the last feed."""
        if not self.qpsk:
            return self.vdec.push_bits([0, 0])
        text = [self.vdec.push_bits(self.viterbi.flush())]
        text.append(self.vdec.push_bits([0, 0]))
        return "".join(text)


# ── whole-band decode ────────────────────────────────────────────────────────


@dataclass
class Psk31BandResult:
    """One decoded PSK31 transmission from a band scan."""
    carrier_hz: float
    time_sym: int
    score: float
    text: str


def psk31_decode_band(iq, fs: float, base_hz: float, max_hz: float,
                      qpsk: bool = False, max_carriers: int = 8,
                      min_carrier_syms: int = 8, peak_margin_db: float = 6.0,
                      gain: float = 1.0) -> List[Psk31BandResult]:
    """Decode EVERY PSK31 transmission in a band in one batched pass.

    Beyond-reference: sync/psk31_sync.rs + Psk31Stream decode one carrier
    per receiver instance; here the waterfall carrier search finds all
    persistent peaks, the K detected carriers demodulate in ONE device
    program (psk31_demod_multi: broadcast mix + batched matched-filter
    matmul + vmapped PLL scans), and only the text layers run per carrier
    on host. Results sorted strongest first.
    """
    from ..dsp.device import sanitize_iq
    from ..sync.psk31_sync import psk31_carrier_search
    from ..demodulate.psk31 import psk31_demod_multi, psk31_refine_carriers
    from ..modulate.psk31 import PSK31_BAUD

    iq = sanitize_iq(iq)
    found = psk31_carrier_search(iq, fs, base_hz, max_hz,
                                 min_carrier_syms, peak_margin_db)
    # one carrier per spectral neighborhood: strongest run wins its ±2-baud
    # cluster; the cluster's earliest start / latest end bound the decode
    found.sort(key=lambda c: -c[3])
    picked: List[list] = []       # [time_sym, carrier_hz, score, end_sym]
    for start, _bin, hz, score, end in found:
        for p in picked:
            if abs(p[1] - hz) <= 2.0 * PSK31_BAUD:
                p[0] = min(p[0], start)
                p[3] = max(p[3], end)
                break
        else:
            if len(picked) < max_carriers:
                picked.append([start, hz, score, end])
    if not picked:
        return []

    coarse = np.asarray([p[1] for p in picked], np.float32)
    carriers = np.asarray(psk31_refine_carriers(iq, fs, coarse, qpsk))
    soft, _off = psk31_demod_multi(iq, fs, carriers, gain, qpsk)
    soft = np.asarray(soft)
    for p, hz in zip(picked, carriers):
        p[1] = float(hz)

    results: List[Psk31BandResult] = []
    for (start, hz, score, end), row in zip(picked, soft):
        # the timing-recovered grid can sit up to one symbol off the
        # detection grid; varicode's 00-delimiters absorb a leading symbol,
        # and the run end (+1) stops the decode before post-signal noise —
        # in a crowded band the leakage floor after a signal ends would
        # otherwise decode a strong neighbor's text
        start = max(start - 1, 0)
        end = min(end + 1, row.shape[0])
        row = row[:end]
        vdec = VaricodeDecoder()
        if not qpsk:
            bits = bpsk31_decide(row[start:])
            # align the decoder to the first mark bit: the "00"-boundary
            # automaton (wire-compatible with ref codec/varicode.rs:290-313)
            # consumes idle zeros in pairs, so an odd-length leading idle run
            # would poison the first character with a leading zero
            nz = np.flatnonzero(bits)
            text = ""
            if nz.size:
                vdec.push_bits([0, 0])
                text = vdec.push_bits(bits[nz[0]:])
                text += vdec.push_bits([0, 0])
        else:
            vit = StreamingViterbi(DQPSK_EXP)
            parts = []
            for d_re, d_im in row[start:]:
                if d_re * d_re + d_im * d_im < 0.01:   # silence/startup skip
                    continue
                b = vit.feed_symbol(float(d_re), float(d_im))
                if b is not None:
                    parts.append(vdec.push_bits([b]))
            parts.append(vdec.push_bits(vit.flush()))
            parts.append(vdec.push_bits([0, 0]))
            text = "".join(parts)
        results.append(Psk31BandResult(carrier_hz=float(hz), time_sym=start,
                                       score=float(score), text=text))
    return results
