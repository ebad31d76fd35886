"""AFSK-1200 (Bell 202) transmitter — the packet-radio/APRS physical layer
(beyond the reference, which has no packet modes). Continuous-phase dual
tones: NRZI-encoded HDLC bits select 1200 Hz (mark) / 2200 Hz (space) at
1200 baud; the whole burst is one cumsum phase accumulator (the CPFSK
trick — no per-bit loop).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit as _cjit
from ..dsp.osc import TAU

AFSK_BAUD = 1200.0
AFSK_MARK_HZ = 1200.0
AFSK_SPACE_HZ = 2200.0


def nrzi_encode(bits) -> np.ndarray:
    """HDLC NRZI: a 0 toggles the line state, a 1 holds it. Returns the
    per-bit line state (starting from state 1)."""
    b = np.asarray(bits, np.uint8) & 1
    toggles = np.cumsum(1 - b) % 2
    return (1 ^ toggles).astype(np.uint8)


def nrzi_decode(states) -> np.ndarray:
    """Per-bit line states → bits (1 = no transition). The first bit
    assumes a preceding state of ``states[0]`` (flag hunting absorbs it)."""
    s = np.asarray(states, np.uint8) & 1
    prev = np.concatenate([s[:1], s[:-1]])
    return (s == prev).astype(np.uint8)


@_cjit
def fsk2_tones(line, fs: float, sps: float, amplitude: float, n: int,
               mark_hz: float = AFSK_MARK_HZ,
               space_hz: float = AFSK_SPACE_HZ):
    """Per-bit line states (1 = mark) → continuous-phase 2-FSK audio of
    ``n`` samples — the shared tone engine for AFSK-1200 and RTTY."""
    t_idx = jnp.arange(n, dtype=jnp.float32)
    k = jnp.minimum(jnp.floor(t_idx / sps).astype(jnp.int32),
                    line.shape[-1] - 1)
    sel = jnp.asarray(line)[k]
    freq = jnp.where(sel == 1, mark_hz, space_hz).astype(jnp.float32)
    phase = jnp.cumsum(jnp.float32(TAU / fs) * freq)
    return (amplitude * jnp.sin(phase)).astype(jnp.float32)


def afsk1200_mod(bits, fs: float, amplitude: float = 0.8) -> np.ndarray:
    """HDLC bit stream (pre-NRZI, e.g. from codec.ax25.hdlc_encode) →
    AFSK-1200 audio at ``fs``. One device program; continuous phase across
    tone switches."""
    if fs < 2.5 * AFSK_SPACE_HZ:
        raise ValueError(f"fs must exceed {2.5 * AFSK_SPACE_HZ:.0f} Hz")
    line = nrzi_encode(bits)
    sps = fs / AFSK_BAUD
    n = int(round(len(line) * sps))
    return np.asarray(fsk2_tones(jnp.asarray(line), float(fs), float(sps),
                                 float(amplitude), n))


def ax25_beacon(frames, fs: float, amplitude: float = 0.8) -> np.ndarray:
    """AX.25 frames → one AFSK-1200 audio burst (TNC transmit path)."""
    from ..codec.ax25 import hdlc_encode
    encoded = [f.encode() if hasattr(f, "encode") else bytes(f)
               for f in frames]
    return afsk1200_mod(hdlc_encode(encoded), fs, amplitude)


def rtty_mod(text: str, fs: float, baud: float = 45.45,
             mark_hz: float = 2125.0, space_hz: float = 2295.0,
             amplitude: float = 0.8) -> np.ndarray:
    """RTTY transmit: text → Baudot/ITA2 → async start/stop framing →
    45.45-baud 2-FSK audio at the 2125/2295 Hz pair (one device program)."""
    import jax.numpy as jnp
    from ..codec.rtty import baudot_encode, rtty_frame_bits
    if fs < 2.5 * max(mark_hz, space_hz):
        raise ValueError(f"fs too low for the {mark_hz}/{space_hz} Hz pair")
    line = rtty_frame_bits(baudot_encode(text))
    sps = fs / baud
    n = int(round(len(line) * sps))
    return np.asarray(fsk2_tones(jnp.asarray(line), float(fs), float(sps),
                                 float(amplitude), n, float(mark_hz),
                                 float(space_hz)))
