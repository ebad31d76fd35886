"""DVB-T super-frame demodulator (behavioral spec:
demodulate/dvb_t_super_frame.rs): four per-frame decodes, frame-number
sequence 0,1,2,3 verified, 16-bit cell id reassembled, payloads concatenated.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from ..waveform.dvb_t import (DVB_T_N_FFT, guard_cp_len_2k,
                              DvbTSuperFrameParams,
                              DVB_T_FRAMES_PER_SUPER_FRAME)
from .dvb_t_frame import DvbTFrameDemod, DvbTRxError


class DvbTRxSuperFrame(NamedTuple):
    payload: np.ndarray
    cell_id: int


class DvbTRxSuperFrameError(Exception):
    def __init__(self, kind: str, frame: int = -1, got=None) -> None:
        super().__init__(kind)
        self.kind = kind
        self.frame = frame
        self.got = got


@dataclass
class DvbTSuperFrameDemod:
    params: DvbTSuperFrameParams
    integer_cfo: bool = False
    rx_window_backoff: int = 0

    def with_integer_cfo_correction(self, on: bool = True):
        return DvbTSuperFrameDemod(self.params, on, self.rx_window_backoff)

    def with_rx_window_backoff(self, backoff: int):
        return DvbTSuperFrameDemod(self.params, self.integer_cfo, backoff)

    def decode(self, iq, symbols_per_frame: int,
               frame_payload_lens) -> DvbTRxSuperFrame:
        iq = np.asarray(iq)
        cp_len = guard_cp_len_2k(self.params.link.guard)
        frame_samples = symbols_per_frame * (DVB_T_N_FFT + cp_len)
        payloads = []
        frame_numbers = []
        cell_hi = cell_lo = 0
        for f in range(DVB_T_FRAMES_PER_SUPER_FRAME):
            start = f * frame_samples
            if start >= len(iq):
                raise DvbTRxSuperFrameError("incomplete", frame=f)
            try:
                rx = DvbTFrameDemod(self.params.frame(f),
                                    integer_cfo=self.integer_cfo,
                                    rx_window_backoff=self.rx_window_backoff
                                    ).decode(iq[start:], symbols_per_frame,
                                             frame_payload_lens[f])
            except DvbTRxError as e:
                raise DvbTRxSuperFrameError(f"frame {f} failed: {e.kind}",
                                            frame=f) from e
            frame_numbers.append(rx.tps.frame_number)
            if f % 2 == 0:
                cell_hi = rx.tps.cell_id
            else:
                cell_lo = rx.tps.cell_id
            payloads.append(rx.payload)
        if frame_numbers != [0, 1, 2, 3]:
            raise DvbTRxSuperFrameError("frame numbers out of sequence",
                                        got=frame_numbers)
        return DvbTRxSuperFrame(payload=np.concatenate(payloads),
                                cell_id=(cell_hi << 8) | cell_lo)
