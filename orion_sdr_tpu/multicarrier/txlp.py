"""TX baseband spectral mask (ref: /root/reference/src/multicarrier/tx_lowpass.rs).

The third out-of-band lever: a Kaiser lowpass applied group-delay-compensated
across the whole assembled stream (spanning symbol boundaries). Application
is `fir_filter_aligned` — one batched XLA conv.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..dsp.device import cjit

from ..dsp.fir import (
    kaiser_lowpass_taps,
    kaiser_num_taps,
    kaiser_transition_norm,
    fir_filter_aligned,
)


@dataclass(frozen=True)
class TxLowpass:
    """Mask spec: cutoff (fraction of fs), tap count, Kaiser stopband target.

    Design math mirrors tx_lowpass.rs:80-197; the guard-budget rule is
    ``roll_off + group_delay ≤ min(cp_len − backoff, backoff)``.
    """

    cutoff_norm: float
    num_taps: int
    stopband_db: float

    @staticmethod
    def for_null_band(n_fft: int, occupied_half: int, num_taps: int,
                      stopband_db: float) -> "TxLowpass":
        """Cutoff placed so the pass band ends at the outermost carrier and the
        stop band is reached as early as the length allows (tx_lowpass.rs:117-144)."""
        occ = occupied_half / max(n_fft, 1)
        half_tr = 0.5 * kaiser_transition_norm(num_taps, stopband_db)
        earliest = occ + half_tr
        latest = 0.5 - half_tr
        cutoff = earliest if earliest <= latest else 0.5 * (occ + 0.5)
        return TxLowpass(cutoff, num_taps, stopband_db)

    @staticmethod
    def taps_for_null_band(n_fft: int, occupied_half: int, stopband_db: float) -> int:
        occ = occupied_half / max(n_fft, 1)
        return kaiser_num_taps(0.5 - occ, stopband_db)

    def group_delay(self) -> int:
        return (max(self.num_taps, 3) | 1) // 2

    def transition_norm(self) -> float:
        return kaiser_transition_norm(self.num_taps, self.stopband_db)

    def transition_fits(self, n_fft: int, occupied_half: int) -> bool:
        return self.transition_norm() <= 0.5 - occupied_half / max(n_fft, 1)

    def stopband_edge_norm(self) -> float:
        return self.cutoff_norm + 0.5 * self.transition_norm()

    def fits_guard(self, cp_len: int, roll_off: int, backoff: int) -> bool:
        slack = min(max(cp_len - backoff, 0), backoff)
        return roll_off + self.group_delay() <= slack

    def taps(self):
        return kaiser_lowpass_taps(self.num_taps, self.cutoff_norm, self.stopband_db)

    def apply(self, stream):
        return _apply_mask(stream, self.cutoff_norm, self.num_taps,
                           self.stopband_db)

    def _apply_inline(self, stream):
        """Same-length, time-aligned mask over the whole burst."""
        return fir_filter_aligned(stream, self.taps())


@cjit
def _apply_mask(stream, cutoff_norm: float, num_taps: int, stopband_db: float):
    """Whole-stream aligned mask filter (host-boundary safe)."""
    taps = kaiser_lowpass_taps(num_taps, cutoff_norm, stopband_db)
    return fir_filter_aligned(stream, taps)
