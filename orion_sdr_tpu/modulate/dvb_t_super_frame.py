"""DVB-T super-frame TX/RX drivers (behavioral spec:
modulate/dvb_t_super_frame.rs, demodulate/dvb_t_super_frame.rs; §4.4/§4.6).

Four frames 0..3 with the alternating TPS sync word; the 16-bit cell id rides
split high/low byte; the payload splits four ways (zero-padded to a common
per-frame length); the spectral mask runs once over the concatenation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..multicarrier import TxLowpass
from ..waveform.dvb_t import (
    DvbTLinkParams, DvbTFrameParams, DvbTSuperFrameParams,
    DVB_T_FRAMES_PER_SUPER_FRAME, DVB_T_N_FFT, guard_cp_len_2k,
)
from .dvb_t_frame import DvbTFrameMod


class DvbTSuperFrame(NamedTuple):
    iq: np.ndarray
    symbols_per_frame: int
    samples_per_symbol: int
    frame_payload_lens: tuple

    def n_symbols(self) -> int:
        return DVB_T_FRAMES_PER_SUPER_FRAME * self.symbols_per_frame


@dataclass
class DvbTSuperFrameMod:
    params: DvbTSuperFrameParams
    window_roll_off: int = 0
    tx_lowpass: Optional[TxLowpass] = None

    def with_symbol_window(self, roll_off: int) -> "DvbTSuperFrameMod":
        return DvbTSuperFrameMod(self.params, roll_off, self.tx_lowpass)

    def with_tx_lowpass(self, lowpass: TxLowpass) -> "DvbTSuperFrameMod":
        return DvbTSuperFrameMod(self.params, self.window_roll_off, lowpass)

    def modulate(self, payload) -> DvbTSuperFrame:
        payload = np.frombuffer(bytes(payload), np.uint8) \
            if isinstance(payload, (bytes, bytearray)) \
            else np.asarray(payload, np.uint8)
        n = DVB_T_FRAMES_PER_SUPER_FRAME
        base, rem = divmod(len(payload), n)
        lens = tuple(base + (1 if i < rem else 0) for i in range(n))
        part_len = max(lens) if lens else 0
        parts, off = [], 0
        for ln in lens:
            part = np.zeros(part_len, np.uint8)
            part[:ln] = payload[off:off + ln]
            parts.append(part)
            off += ln
        frames = [DvbTFrameMod(self.params.frame(f),
                               window_roll_off=self.window_roll_off)
                  .modulate(parts[f]) for f in range(n)]
        iq = np.concatenate([f.iq for f in frames])
        if self.tx_lowpass is not None:
            iq = np.asarray(self.tx_lowpass.apply(jnp.asarray(iq)))
        return DvbTSuperFrame(iq=iq.astype(np.complex64),
                              symbols_per_frame=frames[0].n_symbols,
                              samples_per_symbol=frames[0].samples_per_symbol,
                              frame_payload_lens=lens)
