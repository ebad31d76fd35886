"""ITU-R M.1677 Morse keying-envelope encoder (behavioral spec:
codec/morse.rs). Host text-domain: produces the 0/1 float envelope that
feeds modulate.cw_mod; the table is the public ITU standard.

PARIS timing: 1 unit = 1200/wpm ms; dot 1 unit, dash ``dash_weight``,
intra-char gap 1, inter-char ``char_space``, word gap ``word_space``;
optional per-element jitter simulates a human fist.
"""

from __future__ import annotations

import numpy as np

MORSE_TABLE = {
    "A": ".-", "B": "-...", "C": "-.-.", "D": "-..", "E": ".", "F": "..-.",
    "G": "--.", "H": "....", "I": "..", "J": ".---", "K": "-.-", "L": ".-..",
    "M": "--", "N": "-.", "O": "---", "P": ".--.", "Q": "--.-", "R": ".-.",
    "S": "...", "T": "-", "U": "..-", "V": "...-", "W": ".--", "X": "-..-",
    "Y": "-.--", "Z": "--..",
    "0": "-----", "1": ".----", "2": "..---", "3": "...--", "4": "....-",
    "5": ".....", "6": "-....", "7": "--...", "8": "---..", "9": "----.",
    ".": ".-.-.-", ",": "--..--", "?": "..--..", "'": ".----.", "!": "-.-.--",
    "/": "-..-.", "(": "-.--.", ")": "-.--.-", "&": ".-...", ":": "---...",
    ";": "-.-.-.", "=": "-...-", "+": ".-.-.", "-": "-....-", "_": "..--.-",
    '"': ".-..-.", "$": "...-..-", "@": ".--.-.",
}

_MASK64 = (1 << 64) - 1


def char_to_morse(c: str):
    return MORSE_TABLE.get(c.upper())


class MorseEncoder:
    """Text → keying envelope (0.0 = key up, 1.0 = key down)."""

    def __init__(self, sample_rate: float, wpm: float) -> None:
        self.sample_rate = float(sample_rate)
        self.wpm = float(wpm)
        self.jitter_pct = 0.0
        self.dash_weight = 3.0
        self.char_space = 3.0
        self.word_space = 7.0
        self.rng = 0x853C_49E6_748F_EA9B

    def with_jitter(self, pct: float) -> "MorseEncoder":
        self.jitter_pct = min(max(pct, 0.0), 30.0)
        return self

    def with_dash_weight(self, w: float) -> "MorseEncoder":
        self.dash_weight = min(max(w, 2.5), 3.5)
        return self

    def with_char_space(self, s: float) -> "MorseEncoder":
        self.char_space = min(max(s, 2.5), 4.0)
        return self

    def with_word_space(self, s: float) -> "MorseEncoder":
        self.word_space = min(max(s, 6.0), 9.0)
        return self

    def _unit(self) -> float:
        return (1200.0 / max(self.wpm, 1.0)) * 1e-3 * self.sample_rate

    def _xorshift_uniform(self) -> float:
        self.rng = (self.rng ^ (self.rng << 13)) & _MASK64
        self.rng = (self.rng ^ (self.rng >> 7)) & _MASK64
        self.rng = (self.rng ^ (self.rng << 17)) & _MASK64
        return (self.rng >> 11) * (1.0 / (1 << 53)) * 2.0 - 1.0

    def _jittered(self, unit: float, units: float) -> int:
        nominal = unit * units
        if self.jitter_pct <= 0.0:
            return int(round(nominal))
        delta = unit * (self.jitter_pct / 100.0) * self._xorshift_uniform()
        return max(int(round(nominal + delta)), 1)

    def encode_text(self, text: str) -> np.ndarray:
        """Unknown chars are skipped; runs of whitespace emit one word gap."""
        unit = self._unit()
        out = []
        pending_gap = None
        for c in text:
            if c.isspace():
                if pending_gap is not None or out:
                    pending_gap = self.word_space
                continue
            pattern = char_to_morse(c)
            if pattern is None:
                continue
            if pending_gap is not None:
                out.append(np.zeros(self._jittered(unit, pending_gap),
                                    np.float32))
                pending_gap = None
            for i, elem in enumerate(pattern):
                if i > 0:
                    out.append(np.zeros(self._jittered(unit, 1.0), np.float32))
                units = 1.0 if elem == "." else self.dash_weight
                out.append(np.ones(self._jittered(unit, units), np.float32))
            pending_gap = self.char_space
        return np.concatenate(out) if out else np.zeros(0, np.float32)
