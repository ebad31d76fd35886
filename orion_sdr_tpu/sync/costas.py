"""Costas-array sync scoring for FT8/FT4 (behavioral spec: sync/costas.rs).

The reference scores each (time, freq) candidate with a nested loop over
Costas cells. TPU design: the per-cell difference metric
    C[s, b] = max(0, wf[s,b] − max(neighbors in freq and time))
is computed ONCE for the whole waterfall (4 shifted maxes), and the score
grid over ALL candidate (t, f) pairs is a sum of shifted views of C — a
sparse correlation with the Costas kernel, fully vectorized. Top-N via
jax.lax.top_k instead of the reference's min-heap.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


@dataclass
class Candidate:
    """(ref sync/costas.rs Candidate)"""
    time_sym: int
    freq_bin: int
    score: float


def costas_kernel(costas, sync_pos: Sequence[int]) -> List[Tuple[int, int]]:
    """(symbol offset, tone offset) pairs of every Costas cell in a frame.

    ``costas``: one tone sequence shared by all blocks (FT8) or a (blocks,
    len) array with one sequence per block (FT4).
    """
    costas = np.asarray(costas, np.int64)
    if costas.ndim == 1:
        costas = np.broadcast_to(costas, (len(sync_pos), costas.shape[0]))
    out = []
    for blk, start in enumerate(sync_pos):
        for ci, tone in enumerate(costas[blk]):
            out.append((start + ci, int(tone)))
    return out


def costas_score(wf, costas, sync_pos: Sequence[int], time_sym: int,
                 freq_bin: int) -> float:
    """Score one candidate location (ref costas_score) — convenience/testing
    path; the batch search uses the vectorized grid below."""
    w = np.asarray(wf)
    S, B = w.shape
    total = 0.0
    for ds, tone in costas_kernel(costas, list(sync_pos)):
        sym = time_sym + ds
        bin_ = freq_bin + tone
        if not (0 <= sym < S and 0 <= bin_ < B):
            continue
        e_sig = w[sym, bin_]
        nb = [w[sym, bin_ - 1] if bin_ > 0 else -np.inf,
              w[sym, bin_ + 1] if bin_ + 1 < B else -np.inf,
              w[sym - 1, bin_] if sym > 0 else -np.inf,
              w[sym + 1, bin_] if sym + 1 < S else -np.inf]
        total += max(e_sig - max(nb), 0.0)
    return float(total)


def _shift_sum(cell, kernel, t_count, f_count, pad_top: int = 0):
    """score[t, f] = Σ_kernel cell[t + ds, f + db]; out-of-grid cells are 0
    (kernel offsets are pre-shifted so ds + pad_top ≥ 0)."""
    import jax
    max_ds = max(ds for ds, _ in kernel) + pad_top
    max_db = max(db for db, _ in kernel)
    pad_s = max(t_count + max_ds - (cell.shape[0] + pad_top), 0)
    pad_b = max(f_count + max_db - cell.shape[1], 0)
    cp = jnp.pad(cell, ((pad_top, pad_s), (0, pad_b)))
    score = jnp.zeros((t_count, f_count), jnp.float32)
    for ds, db in kernel:
        score = score + jax.lax.dynamic_slice(cp, (ds + pad_top, db),
                                              (t_count, f_count))
    return score


def find_candidates(wf, costas, sync_pos: Sequence[int], num_tones: int,
                    t_min: int, t_max: int, max_candidates: int
                    ) -> List[Candidate]:
    """Top-N Costas-scored frame starts (ref find_candidates).

    ``t_min``/``t_max`` are inclusive symbol offsets into the waterfall.
    """
    wf = jnp.asarray(wf)
    S, B = wf.shape
    if B <= num_tones:
        return []
    f_count = B - num_tones + 1
    t_count = t_max - t_min + 1
    if t_count <= 0:
        return []
    kernel = costas_kernel(costas, [p + t_min for p in sync_pos])

    w = wf
    neg_row = jnp.full((1, B), -jnp.inf, w.dtype)
    neg_col = jnp.full((S, 1), -jnp.inf, w.dtype)
    up = jnp.concatenate([neg_row, w[:-1, :]], axis=0)
    down = jnp.concatenate([w[1:, :], neg_row], axis=0)
    left = jnp.concatenate([neg_col, w[:, :-1]], axis=1)
    right = jnp.concatenate([w[:, 1:], neg_col], axis=1)
    neigh = jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
    cell = jnp.maximum(w - neigh, 0.0)

    pad_top = max(0, -min(ds for ds, _ in kernel))
    score = _shift_sum(cell, kernel, t_count, f_count, pad_top)
    k = min(max_candidates, t_count * f_count)
    import jax
    vals, idx = jax.lax.top_k(score.reshape(-1), k)
    vals = np.asarray(vals)
    idx = np.asarray(idx)
    return [Candidate(time_sym=int(i // f_count) + t_min,
                      freq_bin=int(i % f_count), score=float(v))
            for v, i in zip(vals, idx)]
