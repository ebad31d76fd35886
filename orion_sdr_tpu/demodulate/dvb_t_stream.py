"""Streaming DVB-T receiver (behavioral spec: demodulate/dvb_t_stream.rs).

Host feed/flush driver over the batch frame demod: front-of-buffer GI
acquisition → batch decode → drain; chunk-boundary invariant, fixed geometry
(n_symbols, payload_len) from construction.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np

from ..waveform.dvb_t import DVB_T_N_FFT, DvbTFrameParams, guard_cp_len_2k
from ..sync.dvb_t_gi_sync import dvb_t_gi_sync
from .dvb_t_frame import DvbTFrameDemod, DvbTRxFrame, DvbTRxError


class DvbTFrameStreamDemod:
    """Feed/flush receiver for a continuous run of equal-geometry frames."""

    def __init__(self, params: DvbTFrameParams, n_symbols: int,
                 payload_len: int) -> None:
        self.demod = DvbTFrameDemod(params)
        self.n_symbols = n_symbols
        self.payload_len = payload_len
        self.sps = DVB_T_N_FFT + guard_cp_len_2k(params.link.guard)
        self._buf = np.zeros(0, np.complex64)
        self._short_skips = 0

    def with_integer_cfo_correction(self, on: bool = True):
        self.demod = self.demod.with_integer_cfo_correction(on)
        return self

    def with_rx_window_backoff(self, backoff: int):
        self.demod = self.demod.with_rx_window_backoff(backoff)
        return self

    def __len__(self) -> int:
        return len(self._buf)

    def view_buf(self) -> np.ndarray:
        return self._buf

    def clear(self) -> None:
        self._buf = np.zeros(0, np.complex64)

    def _frame_samples(self) -> int:
        return self.n_symbols * self.sps

    def _decode_front(self, seg):
        return self.demod.decode(seg, self.n_symbols, self.payload_len)

    def feed(self, iq) -> List[Union[DvbTRxFrame, DvbTRxError]]:
        from ..dsp.device import sanitize_iq
        self._buf = np.concatenate([self._buf, sanitize_iq(iq)])
        return self._drain()

    def flush(self) -> List[Union[DvbTRxFrame, DvbTRxError]]:
        # end of stream: no more samples are coming, so attempt frames
        # without the one-symbol look-ahead margin
        return self._drain(final=True)

    def _drain(self, final: bool = False):
        out = []
        while True:
            step = self._try_one_frame(final)
            if step is None:
                return out
            result, consume_to = step
            self._buf = self._buf[consume_to:]
            out.append(result)

    def _try_one_frame(self, final: bool = False):
        cp_len = self.sps - DVB_T_N_FFT
        need = self._frame_samples() + (0 if final else self.sps)
        if len(self._buf) < need:
            return None
        acq = dvb_t_gi_sync(self._buf, DVB_T_N_FFT, cp_len, self.demod.fs,
                            self.sps)
        # score < 0.2 corresponds to ≈ −6 dB SNR — far below any decodable
        # operating point; treating weak locks as noise prevents dead-air
        # decode attempts from consuming samples that belong to a later frame
        if acq is not None and acq.score < 0.2:
            acq = None
        if acq is None:
            # no lock at the front (a silent/blanked gap): keep only the
            # last frame-plus-lookahead so the receiver re-syncs when signal
            # returns instead of holding a growing dead buffer — the GI
            # metric only examines the front of the buffer
            keep = need + 4 * self.sps   # margin for a few short skips
            if len(self._buf) > keep:
                self._buf = self._buf[len(self._buf) - keep:]
            return None
        start = acq.start_sample
        consume_to = start + self._frame_samples()
        if consume_to > len(self._buf):
            return None
        try:
            frame = self._decode_front(self._buf[start:])
            self._short_skips = 0
            return frame, consume_to
        except DvbTRxError as e:
            # A failure right after acquisition is often a symbol-misaligned
            # lock (the GI metric cannot tell frame boundaries from symbol
            # boundaries, e.g. across a silence→signal transition): advance
            # one symbol period and retry a few times before concluding the
            # frame is genuinely corrupt and skipping it whole.
            if self._short_skips < 3:
                self._short_skips += 1
                return e, min(start + self.sps, len(self._buf))
            self._short_skips = 0
            return e, consume_to


class DvbTHierFrameStreamDemod(DvbTFrameStreamDemod):
    """Feed/flush receiver for a run of equal-geometry HIERARCHICAL frames
    (beyond the reference): same GI-acquire/drain machinery, each frame
    decoding into a DvbTHierRxFrame (HP payload always, LP or None)."""

    def __init__(self, params, n_symbols: int, hp_payload_len: int,
                 lp_payload_len: int) -> None:
        from .dvb_t_frame import DvbTHierFrameDemod
        params.link.validate()
        self.demod = DvbTHierFrameDemod(params)
        self.n_symbols = n_symbols
        self.hp_payload_len = hp_payload_len
        self.lp_payload_len = lp_payload_len
        self.sps = DVB_T_N_FFT + guard_cp_len_2k(params.link.guard)
        self._buf = np.zeros(0, np.complex64)
        self._short_skips = 0

    def with_integer_cfo_correction(self, on: bool = True):
        raise NotImplementedError(
            "integer-CFO pre-correction is not wired for the hierarchical "
            "stream; correct CFO upstream (dsp.rotate) if needed")

    def _decode_front(self, seg):
        return self.demod.decode(seg, self.n_symbols, self.hp_payload_len,
                                 self.lp_payload_len)


class DvbTBandStreamDemod:
    """Multi-mux DVB-T gateway receive (beyond-reference): C equal-geometry
    DVB-T multiplexes at known centers in one wideband capture, channelized
    in ONE batched device program (dsp.channelizer.Channelizer), each mux
    drained by its own :class:`DvbTFrameStreamDemod`.

    ``fs`` is the per-mux sample rate (an NB-mode rate,
    ``dvb_t_fs_for_bandwidth``); ``fs_wide`` must be an integer multiple
    of it. Results come back as {mux_index: [DvbTRxFrame|DvbTRxError]}.
    """

    def __init__(self, params: DvbTFrameParams, n_symbols: int,
                 payload_len: int, centers_hz, fs: float, fs_wide: float,
                 stopband_db: float = 60.0) -> None:
        from ..dsp.channelizer import Channelizer
        from ..waveform.dvb_t import DVB_T_KMAX
        # occupied band: 1705 active carriers of 2048 → ±KMAX/2 bins
        occ_hz = (DVB_T_KMAX / 2 + 1) / DVB_T_N_FFT * fs
        self.channelizer = Channelizer(fs_wide, fs, centers_hz,
                                       passband_hz=occ_hz,
                                       stopband_db=stopband_db)
        self.streams = [DvbTFrameStreamDemod(params, n_symbols, payload_len)
                        for _ in range(self.channelizer.num_channels)]

    @property
    def centers_hz(self) -> np.ndarray:
        return self.channelizer.centers_hz

    def __len__(self) -> int:
        return len(self.channelizer)

    def _drain(self, y: np.ndarray):
        out = {}
        if y.shape[-1]:
            for c, s in enumerate(self.streams):
                res = s.feed(y[c])
                if res:
                    out[c] = res
        return out

    def feed(self, iq):
        """Feed wideband IQ; {mux_index: new results} for productive muxes."""
        return self._drain(self.channelizer.push(iq))

    def flush(self):
        out = self._drain(self.channelizer.flush())
        for c, s in enumerate(self.streams):
            res = s.flush()
            if res:
                out.setdefault(c, []).extend(res)
        return out
