"""Multi-channel COFDM band receive (beyond-reference).

The reference's `OfdmFrameStreamDemod` (demodulate/ofdm_frame.rs:695-893)
receives ONE link at baseband. A gateway receiver sees a wideband capture
carrying many COFDM channels at known centers; here the channelizer —
mix every channel to baseband, anti-alias lowpass, decimate to the link
rate — runs as ONE batched device program over all channels (a (C, N)
elementwise mix + one batched MXU/overlap-save convolution), and only the
per-channel acquire/decode drivers run on host. TPU-native throughput
scaling: adding channels widens the batch, it does not add passes.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit, sanitize_iq
from ..dsp.fir import fir_apply, kaiser_lowpass_taps, kaiser_num_taps
from ..ofdm import OfdmConfig
from ..sync.ofdm_sync import OfdmPreamble
from .types import McsTable, RxError
from .demodulator import OfdmFrameStreamDemod, RxFrame

_TAU = float(2.0 * np.pi)


@cjit
def _channelize_block(iq, centers, phase0, fir_state, taps: tuple, m: int,
                      fs: float):
    """Mix C channels to baseband + lowpass + decimate, one device program.

    ``iq`` (L,) with L a multiple of ``m``; ``centers`` (C,) Hz; ``phase0``
    (C,) carried mixer phases; ``fir_state`` (C, ntaps−1) carried filter
    tails; ``taps`` as a TUPLE (static — the FIR lowering needs concrete
    design data). Returns (y (C, L/m), phase_out (C,), new_state).
    """
    z = jnp.asarray(iq)
    f = jnp.asarray(centers, jnp.float32)
    n = z.shape[-1]
    w = jnp.float32(-_TAU / fs) * f                       # rad/sample
    k = jnp.arange(1, n + 1, dtype=jnp.float32)
    ph = jnp.asarray(phase0, jnp.float32)[:, None] + w[:, None] * k
    zb = z[None, :] * jnp.exp(1j * ph)
    phase_out = jnp.remainder(jnp.asarray(phase0, jnp.float32) + w * n,
                              jnp.float32(_TAU))
    y, st = fir_apply(zb, np.asarray(taps, np.float32),
                      state=jnp.asarray(fir_state))
    return y[..., ::m], phase_out, st


class OfdmFrameBandStreamDemod:
    """Streaming COFDM receive of C channels from one wideband capture.

    ``fs_wide`` must be an integer multiple of ``cfg.fs``; every channel
    runs the same link config. ``feed`` takes wideband IQ chunks (any
    size — chunk-boundary invariant) and returns results per channel;
    per-channel streams hold the usual Incomplete/Failed semantics.
    """

    def __init__(self, cfg: OfdmConfig, mcs_table: McsTable,
                 preamble: OfdmPreamble, centers_hz: Sequence[float],
                 fs_wide: float, score_threshold: float = 0.5,
                 stopband_db: float = 60.0) -> None:
        m = fs_wide / cfg.fs
        if abs(m - round(m)) > 1e-9 or round(m) < 1:
            raise ValueError(
                f"fs_wide ({fs_wide}) must be an integer multiple of the "
                f"link rate ({cfg.fs})")
        self.m = int(round(m))
        self.cfg = cfg
        self.fs_wide = float(fs_wide)
        self.centers_hz = np.asarray(list(centers_hz), np.float32)
        if self.centers_hz.ndim != 1 or self.centers_hz.size == 0:
            raise ValueError("centers_hz must be a non-empty 1-D sequence")
        nyq = fs_wide / 2.0
        if np.any(np.abs(self.centers_hz) >= nyq):
            raise ValueError("channel centers must sit inside ±fs_wide/2")

        # anti-alias design: pass the occupied link band, −6 dB midway to
        # the channel Nyquist, stopband at the link's image band
        plan = cfg.carrier_plan
        occ_hz = plan.occupied_half_carriers() / plan.n_fft * cfg.fs
        pass_n = occ_hz / fs_wide
        stop_n = 0.5 * cfg.fs / fs_wide
        trans = max(stop_n - pass_n, 1e-4)
        num_taps = kaiser_num_taps(trans, stopband_db)
        self.taps = kaiser_lowpass_taps(num_taps, 0.5 * (pass_n + stop_n),
                                        stopband_db)

        c = self.centers_hz.size
        self._phase = np.zeros(c, np.float32)
        self._state = np.zeros((c, len(self.taps) - 1), np.complex64)
        self._rem = np.zeros(0, np.complex64)
        self.streams = [OfdmFrameStreamDemod(cfg, mcs_table, preamble,
                                             score_threshold)
                        for _ in range(c)]

    def __len__(self) -> int:
        return len(self._rem)

    def _process(self, block: np.ndarray) -> List[List[Union[RxFrame,
                                                             RxError]]]:
        y, ph, st = _channelize_block(block, self.centers_hz, self._phase,
                                      self._state, tuple(self.taps.tolist()),
                                      self.m, self.fs_wide)
        self._phase = np.asarray(ph)
        self._state = np.asarray(st)
        y = np.asarray(y)
        return [s.feed(y[c]) for c, s in enumerate(self.streams)]

    def feed(self, iq) -> Dict[int, List[Union[RxFrame, RxError]]]:
        """Feed wideband IQ; returns {channel_index: new results} for
        channels that produced anything this call."""
        buf = np.concatenate([self._rem, sanitize_iq(iq)])
        take = (len(buf) // self.m) * self.m
        self._rem = buf[take:]
        out: Dict[int, List[Union[RxFrame, RxError]]] = {}
        if take:
            for c, res in enumerate(self._process(buf[:take])):
                if res:
                    out[c] = res
        return out

    def flush(self) -> Dict[int, List[Union[RxFrame, RxError]]]:
        """Process the sub-decimation remainder (zero-padded to one output
        sample) and drain every per-channel stream."""
        out: Dict[int, List[Union[RxFrame, RxError]]] = {}
        if len(self._rem):
            block = np.zeros(self.m, np.complex64)
            block[: len(self._rem)] = self._rem
            self._rem = np.zeros(0, np.complex64)
            for c, res in enumerate(self._process(block)):
                if res:
                    out[c] = res
        for c, s in enumerate(self.streams):
            res = s.flush()
            if res:
                out.setdefault(c, []).extend(res)
        return out
