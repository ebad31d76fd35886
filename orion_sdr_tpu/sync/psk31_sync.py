"""PSK31 carrier-detection sync (behavioral spec: sync/psk31_sync.rs).

No Costas pattern — detection is per-bin energy persistence with a
local-peak criterion over the symbol-rate waterfall. The waterfall itself is
device work (one matmul, sync/waterfall.py); the run detection over the tiny
(num_syms × num_bins) log-energy grid is vectorized numpy on the host, and
each candidate's soft bits come from the batched JAX BPSK31 demod.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..modulate.psk31 import PSK31_BAUD, psk31_sps
from ..demodulate.psk31 import bpsk31_demod
from .waterfall import compute_waterfall


@dataclass
class Psk31SyncResult:
    """One detected carrier (ref Psk31SyncResult, sync/psk31_sync.rs:21-34)."""
    time_sym: int
    freq_bin: int
    carrier_hz: float
    score: float
    soft_bits: np.ndarray


def psk31_sync(iq, fs: float, base_hz: float, max_hz: float,
               min_carrier_syms: int = 8, peak_margin_db: float = 6.0,
               n_bits: int = 64, max_cand: int = 4) -> List[Psk31SyncResult]:
    """Scan for PSK31 carriers; up to ``max_cand`` results by score desc."""
    iq = np.asarray(iq)
    sps = psk31_sps(fs)
    if sps == 0 or iq.size == 0:
        return []
    num_syms = len(iq) // sps
    if num_syms == 0:
        return []
    num_bins = int(np.ceil(max(max_hz - base_hz, 0.0) / PSK31_BAUD)) + 1

    wf = np.asarray(compute_waterfall(iq, fs, base_hz, PSK31_BAUD, sps,
                                      num_syms, num_bins))  # (syms, bins)

    ln_margin = peak_margin_db * np.log(10.0) / 10.0
    min_run = max(min_carrier_syms, 1)

    # Per-bin temporal median handles short bursts in silence; the cross-bin
    # noise floor (median of medians) handles constant full-duration carriers
    # whose per-bin median equals their max (ref :86-116).
    bin_medians = np.median(wf, axis=0)
    noise_floor = np.median(bin_medians)
    global_threshold = noise_floor + ln_margin

    # Peak mask: above per-bin OR global threshold, and a local max in freq.
    left = np.pad(wf, ((0, 0), (1, 0)), constant_values=-np.inf)[:, :-1]
    right = np.pad(wf, ((0, 0), (0, 1)), constant_values=-np.inf)[:, 1:]
    is_peak = ((wf > bin_medians + ln_margin) |
               (bin_medians > global_threshold)) & (wf >= left) & (wf >= right)

    candidates: List[Psk31SyncResult] = []
    for bin_ in range(num_bins):
        col = is_peak[:, bin_]
        # run-length extraction over the symbol axis
        edges = np.flatnonzero(np.diff(np.concatenate([[0], col.view(np.int8), [0]])))
        for start, end in zip(edges[0::2], edges[1::2]):
            if end - start < min_run:
                continue
            score = float(wf[start:end, bin_].mean())
            carrier_hz = base_hz + bin_ * PSK31_BAUD
            start_sample = start * sps
            if start_sample >= len(iq):
                continue
            soft = np.asarray(bpsk31_demod(iq[start_sample:], fs, carrier_hz, 1.0))
            candidates.append(Psk31SyncResult(
                time_sym=int(start), freq_bin=bin_, carrier_hz=float(carrier_hz),
                score=score, soft_bits=soft[:n_bits]))

    candidates.sort(key=lambda r: -r.score)
    return candidates[:max_cand]


def best_sync(results: List[Psk31SyncResult], carrier_hz: float, baud: float):
    """Pick the result nearest ``carrier_hz`` (≤ 2·baud away), preferring the
    earliest time_sym (ref util.rs:278-295). Returns (carrier_hz, time_sym)."""
    near = [r for r in results if abs(r.carrier_hz - carrier_hz) <= 2.0 * baud]
    if not near:
        return None
    best = min(near, key=lambda r: (r.time_sym, abs(r.carrier_hz - carrier_hz)))
    return (best.carrier_hz, best.time_sym)
