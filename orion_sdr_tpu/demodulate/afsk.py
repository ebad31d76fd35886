"""AFSK-1200 (Bell 202) receiver → AX.25 frames (beyond the reference,
which has no packet modes).

Non-coherent dual-tone discrimination: complex correlators at 1200/2200 Hz
(mix + boxcar over one bit — a matched filter for the tone envelope), the
decision waveform |mark| − |space|, bit sampling at the baud grid with a
timing-offset search (aligned offsets maximize decision energy), NRZI
decode, HDLC deframe + FCS. Everything through the decision waveform is
one batched device program; timing + framing are host-side text-rate work.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit as _cjit
from ..dsp.osc import TAU
from ..modulate.afsk import AFSK_BAUD, AFSK_MARK_HZ, AFSK_SPACE_HZ
from ..modulate.afsk import nrzi_decode


@_cjit
def fsk2_decision(audio, fs: float, sps_i: int,
                  mark_hz: float = AFSK_MARK_HZ,
                  space_hz: float = AFSK_SPACE_HZ):
    """(…, n) audio → (…, n) decision waveform |mark| − |space| (boxcar
    matched filters, length one bit) — shared by AFSK-1200 and RTTY."""
    x = jnp.asarray(audio, jnp.float32)
    n = x.shape[-1]
    t = jnp.arange(1, n + 1, dtype=jnp.float32)

    def tone_env(f_hz):
        ph = jnp.float32(TAU * f_hz / fs) * t
        bb = x * jnp.exp(-1j * ph)
        # boxcar over one bit on re/im (VALID→same via edge pad)
        pad = [(0, 0)] * (x.ndim - 1) + [(sps_i // 2, sps_i - 1 - sps_i // 2)]
        bbp = jnp.pad(bb, pad)
        from ..dsp.fir import _conv_valid_f32
        re = _conv_valid_f32(bbp.real, np.ones(sps_i, np.float32) / sps_i)
        im = _conv_valid_f32(bbp.imag, np.ones(sps_i, np.float32) / sps_i)
        return jnp.sqrt(re * re + im * im)

    return (tone_env(mark_hz) - tone_env(space_hz)).astype(jnp.float32)


def _best_bit_values(d: np.ndarray, sps: float) -> np.ndarray:
    """Sample a decision waveform at the baud grid, searching 8 timing
    offsets for the one maximizing mean |decision| — shared by the AFSK
    and RTTY paths."""
    n_bits = int(len(d) / sps) - 1
    if n_bits < 8:
        return np.zeros(0, np.float32)
    best = None
    for off in np.arange(0.0, sps, sps / 8.0):
        centers = (off + sps / 2.0 + np.arange(n_bits) * sps).astype(np.int64)
        centers = centers[centers < len(d)]
        vals = d[centers]
        score = float(np.mean(np.abs(vals)))
        if best is None or score > best[0]:
            best = (score, vals)
    return best[1]


def afsk1200_demod(audio, fs: float) -> np.ndarray:
    """Audio → HDLC bit stream (pre-NRZI bits, feed codec.ax25.hdlc_decode).
    Bit timing by offset search over one bit period."""
    a = np.asarray(audio, np.float32)
    sps = fs / AFSK_BAUD
    sps_i = max(int(round(sps)), 2)
    d = np.asarray(fsk2_decision(a, float(fs), sps_i))
    vals = _best_bit_values(d, sps)
    if vals.size == 0:
        return np.zeros(0, np.uint8)
    return nrzi_decode((vals > 0).astype(np.uint8))


def ax25_decode(audio, fs: float) -> List:
    """AFSK-1200 audio → validated AX.25 frames (the TNC receive path)."""
    from ..codec.ax25 import hdlc_decode
    return hdlc_decode(afsk1200_demod(audio, fs))


def rtty_decode(audio, fs: float, baud: float = 45.45,
                mark_hz: float = 2125.0, space_hz: float = 2295.0) -> str:
    """RTTY receive: 2-FSK audio → text. The dual-tone decision runs on
    device; bit timing by offset search (best mean |decision| at the baud
    grid), then async unframing + Baudot page tracking."""
    from ..codec.rtty import rtty_unframe_bits, baudot_decode
    a = np.asarray(audio, np.float32)
    sps = fs / baud
    sps_i = max(int(round(sps)), 2)
    d = np.asarray(fsk2_decision(a, float(fs), sps_i, float(mark_hz),
                                 float(space_hz)))
    vals = _best_bit_values(d, sps)
    if vals.size == 0:
        return ""
    states = (vals > 0).astype(np.uint8)
    return baudot_decode(rtty_unframe_bits(states))


class Afsk1200Stream:
    """Streaming AFSK-1200 TNC: feed audio chunks of any size, get AX.25
    frames as they complete — the feed/flush contract every other
    streaming receiver here follows (chunk-boundary invariant,
    checkpointable).

    Each drain demodulates the whole buffered window but only COMMITS
    frames that start before the retained overlap (one max-length frame +
    timing slack), so a frame split across feeds decodes exactly once when
    its tail arrives."""

    # a full 330-byte AX.25 frame + flags ≈ 2700 bits ≈ 2.3 s at 1200 baud
    _OVERLAP_S = 2.5

    def __init__(self, fs: float) -> None:
        self.fs = float(fs)
        self._buf = np.zeros(0, np.float32)
        self._base_bits = 0          # absolute bit index of buffer start
        self._emitted_to = 0         # absolute bit index already committed

    def __len__(self) -> int:
        return len(self._buf)

    def clear(self) -> None:
        self._buf = np.zeros(0, np.float32)
        self._base_bits = 0
        self._emitted_to = 0

    def feed(self, audio) -> list:
        self._buf = np.concatenate([self._buf,
                                    np.asarray(audio, np.float32)])
        return self._drain(final=False)

    def flush(self) -> list:
        out = self._drain(final=True)
        return out

    def _drain(self, final: bool) -> list:
        sps = self.fs / AFSK_BAUD
        overlap_bits = int(self._OVERLAP_S * AFSK_BAUD)
        n_bits = int(len(self._buf) / sps) - 1
        if n_bits < 16:
            return []
        from ..codec.ax25 import hdlc_decode_with_pos
        bits = afsk1200_demod(self._buf, self.fs)
        commit_end = self._base_bits + (len(bits) if final
                                        else max(len(bits) - overlap_bits, 0))
        out = []
        for frame, pos in hdlc_decode_with_pos(bits):
            abs_pos = self._base_bits + pos
            if self._emitted_to <= abs_pos < commit_end:
                out.append(frame)
        self._emitted_to = max(self._emitted_to, commit_end)
        # retain the overlap so split frames finish next feed
        keep_bits = min(overlap_bits + 16, len(bits))
        keep_samples = int(keep_bits * sps) + len(self._buf) \
            - int(len(bits) * sps)
        keep_samples = min(max(keep_samples, 0), len(self._buf))
        drop = len(self._buf) - keep_samples
        self._base_bits += int(round(drop / sps))
        self._buf = self._buf[drop:]
        if final:
            self.clear()
        return out


def rtty_decode_fsk(iq, fs: float, baud: float = 45.45) -> str:
    """HF-style RTTY: RF frequency-shift keying at IQ baseband (typically
    170 Hz shift) rather than audio tones. FM-discriminate, integrate per
    bit with an offset search, try both mark/space polarities, and keep
    the text with more printable characters."""
    from ..demodulate.pocsag import pocsag_demod_bits
    from ..codec.rtty import rtty_unframe_bits, baudot_decode
    bits = pocsag_demod_bits(np.asarray(iq), fs, baud)
    if bits.size == 0:
        return ""
    best = ""
    for pol in (0, 1):
        text = baudot_decode(rtty_unframe_bits(bits ^ pol))
        printable = sum(c.isprintable() and c != " " for c in text)
        if printable > sum(c.isprintable() and c != " " for c in best):
            best = text
    return best
