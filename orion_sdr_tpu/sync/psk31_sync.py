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


def psk31_carrier_search(iq, fs: float, base_hz: float, max_hz: float,
                         min_carrier_syms: int = 8,
                         peak_margin_db: float = 6.0,
                         bin_hz: float = PSK31_BAUD,
                         with_floor: bool = False):
    """Detection only: (time_sym, freq_bin, carrier_hz, score, end_sym)
    tuples for every persistent spectral-peak run, unsorted. The waterfall is
    one device matmul; the run extraction is host numpy over the tiny grid.

    ``bin_hz`` sets the waterfall bin spacing (ref is baud-spaced). The
    symbol-length correlator's response is sinc-shaped with first null at
    ±baud, so a carrier halfway off a baud-spaced grid splits −3.9 dB into
    two bins and the local-max flickers between them, fragmenting runs
    below min_carrier_syms; half-baud spacing bounds the split at −0.9 dB
    with a clean single winner (used by psk31_decode_band)."""
    iq = np.asarray(iq)
    sps = psk31_sps(fs)
    if sps == 0 or iq.size == 0:
        return ([], 0.0) if with_floor else []
    num_syms = len(iq) // sps
    if num_syms == 0:
        return ([], 0.0) if with_floor else []
    num_bins = int(np.ceil(max(max_hz - base_hz, 0.0) / bin_hz)) + 1

    wf = np.asarray(compute_waterfall(iq, fs, base_hz, bin_hz, sps,
                                      num_syms, num_bins))  # (syms, bins)

    ln_margin = peak_margin_db * np.log(10.0) / 10.0
    min_run = max(min_carrier_syms, 1)

    # Per-bin temporal median handles short bursts in silence; the cross-bin
    # noise floor handles constant full-duration carriers whose per-bin
    # median equals their max (ref :86-116). The floor is the 25th percentile
    # of bin medians rather than the reference's median: in a crowded band
    # the spectral skirts of strong carriers elevate a large fraction of
    # bins, and a median-of-medians floor can swallow weak co-band signals
    # (single-signal behavior is unchanged — most bins are then pure noise).
    bin_medians = np.median(wf, axis=0)
    noise_floor = np.percentile(bin_medians, 25.0)
    global_threshold = noise_floor + ln_margin

    # Peak mask: above per-bin OR global threshold, and a NEAR-local max in
    # freq — within 1 dB of both neighbors. A strict local max fragments
    # runs when a carrier sits halfway between two bins (the ~equal split
    # flickers the winner symbol to symbol); 1 dB keeps both split bins
    # alive (cluster merging downstream dedupes them) while still rejecting
    # the ≥3.9 dB-down neighbors of an on-grid carrier.
    near_ln = 1.0 * np.log(10.0) / 10.0
    left = np.pad(wf, ((0, 0), (1, 0)), constant_values=-np.inf)[:, :-1]
    right = np.pad(wf, ((0, 0), (0, 1)), constant_values=-np.inf)[:, 1:]
    is_peak = ((wf > bin_medians + ln_margin) |
               (bin_medians > global_threshold)) \
        & (wf >= left - near_ln) & (wf >= right - near_ln)

    found: List[tuple] = []
    for bin_ in range(num_bins):
        col = is_peak[:, bin_]
        # run-length extraction over the symbol axis
        edges = np.flatnonzero(np.diff(np.concatenate([[0], col.view(np.int8), [0]])))
        for start, end in zip(edges[0::2], edges[1::2]):
            if end - start < min_run:
                continue
            if start * sps >= len(iq):
                continue
            score = float(wf[start:end, bin_].mean())
            found.append((int(start), bin_,
                          float(base_hz + bin_ * bin_hz), score,
                          int(end)))
    return (found, float(noise_floor)) if with_floor else found


def psk31_sync(iq, fs: float, base_hz: float, max_hz: float,
               min_carrier_syms: int = 8, peak_margin_db: float = 6.0,
               n_bits: int = 64, max_cand: int = 4) -> List[Psk31SyncResult]:
    """Scan for PSK31 carriers; up to ``max_cand`` results by score desc."""
    iq = np.asarray(iq)
    sps = psk31_sps(fs)
    found = psk31_carrier_search(iq, fs, base_hz, max_hz,
                                 min_carrier_syms, peak_margin_db)
    candidates: List[Psk31SyncResult] = []
    for start, bin_, carrier_hz, score, _end in found:
        soft = np.asarray(bpsk31_demod(iq[start * sps:], fs, carrier_hz, 1.0))
        candidates.append(Psk31SyncResult(
            time_sym=start, freq_bin=bin_, carrier_hz=carrier_hz,
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
