"""Streaming PSK31 decode pipeline (behavioral spec: codec/psk31.rs:400-572).

Host-side feed/flush driver around the device demod: IQ chunks are buffered
to whole symbols, the decision-feedback matched filter + PLL runs on device
with its (prev_sym, phase_acc) carry held across feeds, and the text layers
(Viterbi for QPSK, varicode) run on host. Chunk-boundary invariant: feeding
sample-by-sample decodes identically to one-shot.
"""

from __future__ import annotations

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
