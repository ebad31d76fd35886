"""WSPR beacon receiver (wire-compatible — codec/wspr.py): joint coarse
time/frequency search on the published sync chips, then per-symbol 4-tone
energies → sequential decode.

TPU design: the WHOLE search grid's tone energies come from one batched
program — mix the capture by each frequency candidate, slice each time
candidate's 162-symbol window, and correlate every symbol against the 4
tone phasors as one einsum."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..dsp.device import cjit
from ..dsp.osc import TAU
from ..codec.wspr import (WSPR_SYMBOLS, WSPR_SPS, WSPR_FS, WSPR_SYNC,
                          wspr_decode_symbols, WsprMessage)


@cjit
def _energy_grid(re, im, dts, dfs, fs: float, base_hz: float):
    """(n,) capture → (F, D, 162, 4) tone energies for every (df, dt)."""
    z = re + 1j * im
    n = z.shape[-1]
    t = jnp.arange(1, n + 1, dtype=jnp.float32)
    df_tone = fs / WSPR_SPS
    # tone phasors for one symbol window
    k = jnp.arange(WSPR_SPS, dtype=jnp.float32)
    tones = jnp.exp(-1j * jnp.float32(TAU / fs)
                    * (base_hz + jnp.arange(4, dtype=jnp.float32)[:, None]
                       * df_tone) * k[None, :])           # (4, sps)
    need = WSPR_SYMBOLS * WSPR_SPS
    sym_idx = (jnp.arange(WSPR_SYMBOLS)[:, None] * WSPR_SPS
               + jnp.arange(WSPR_SPS)[None, :])

    def for_df(df):
        zz = z * jnp.exp(-1j * jnp.float32(TAU / fs) * df * t)

        def for_dt(dt):
            seg = zz[jnp.clip(sym_idx + dt, 0, n - 1)]    # (162, sps)
            c = jnp.einsum("sk,tk->st", seg, tones)       # (162, 4)
            return (jnp.abs(c) ** 2).astype(jnp.float32)
        return jax.vmap(for_dt)(jnp.asarray(dts))

    return jax.vmap(for_df)(jnp.asarray(dfs, jnp.float32))


def wspr_demod(iq, fs: float = WSPR_FS, base_hz: float = 1500.0,
               dt_max: int = 2 * WSPR_SPS,
               df_max_hz: float = 1.6) -> Optional[WsprMessage]:
    """Capture → message | None. Searches start offsets up to ``dt_max``
    samples and CFO up to ±``df_max_hz`` (quarter-tone steps)."""
    z = np.asarray(iq, np.complex64)
    if len(z) < WSPR_SYMBOLS * WSPR_SPS:
        return None
    df_step = fs / WSPR_SPS / 4.0
    dfs = np.arange(-df_max_hz, df_max_hz + 1e-9, df_step).astype(np.float32)
    dts = np.arange(0, max(dt_max, 1), WSPR_SPS // 4).astype(np.int32)
    dts = dts[dts + WSPR_SYMBOLS * WSPR_SPS <= len(z)]
    if dts.size == 0:
        dts = np.zeros(1, np.int32)
    eg = np.asarray(_energy_grid(
        np.ascontiguousarray(z.real, np.float32),
        np.ascontiguousarray(z.imag, np.float32),
        dts, dfs, float(fs), float(base_hz)))
    # sync score: energy in the two sync-consistent tones minus the rest
    s = WSPR_SYNC.astype(np.int64)
    i162 = np.arange(WSPR_SYMBOLS)
    insync = eg[..., i162, s] + eg[..., i162, s + 2]
    total = eg.sum(axis=-1)
    score = (insync - (total - insync)).sum(axis=-1)
    fi, di = np.unravel_index(np.argmax(score), score.shape)
    return wspr_decode_symbols(eg[fi, di])


@cjit
def _spectrogram(re, im, n_hops: int, hop: int):
    """Quarter-symbol-hopped symbol-length FFTs: bin spacing = the tone
    spacing exactly, so every (time, frequency) sync candidate in the
    whole band reads straight out of one program's output."""
    z = re + 1j * im
    idx = (jnp.arange(n_hops)[:, None] * hop
           + jnp.arange(WSPR_SPS)[None, :])
    segs = z[idx]
    spec = jnp.fft.fft(segs, axis=-1)
    return (jnp.abs(spec) ** 2).astype(jnp.float32)


def wspr_decode_band(iq, fs: float = WSPR_FS, base_hz: float = 1400.0,
                     width_hz: float = 200.0, max_decodes: int = 8,
                     min_score_sigma: float = 5.0) -> List[WsprMessage]:
    """Decode EVERY beacon in a band (the real WSPR band is 200 Hz wide):
    one spectrogram program covers all (time, frequency) candidates, the
    known sync chips score each, and the top distinct candidates decode
    through the stack decoder. Mirrors the FT8 batched-window design."""
    z = np.asarray(iq, np.complex64)
    hop = WSPR_SPS // 4
    n_hops = (len(z) - WSPR_SPS) // hop + 1
    if n_hops < 4 * WSPR_SYMBOLS:
        return []
    spec = np.asarray(_spectrogram(
        np.ascontiguousarray(z.real, np.float32),
        np.ascontiguousarray(z.imag, np.float32), int(n_hops), hop))
    df = fs / WSPR_SPS
    b0 = int(round(base_hz / df))
    nb = int(round(width_hz / df))
    s = WSPR_SYNC.astype(np.int64)
    i4 = np.arange(WSPR_SYMBOLS) * 4
    n_t0 = n_hops - 4 * WSPR_SYMBOLS + 1
    # the whole (t0, b) sync-score grid in one vectorized gather —
    # in-sync tones are {s, s+2}, the other two {1−s, 3−s}
    trow = np.arange(n_t0)[:, None, None] + i4[None, None, :]  # (n_t0,1,162)
    bcol = b0 + np.arange(nb)[None, :, None]                   # (1,nb,1)
    insync = spec[trow, bcol + s[None, None, :]] \
        + spec[trow, bcol + s[None, None, :] + 2]
    other = spec[trow, bcol + (1 - s)[None, None, :]] \
        + spec[trow, bcol + (3 - s)[None, None, :]]
    scores = (insync - other).sum(axis=-1).astype(np.float32)
    mu = float(np.median(scores))
    sd = float(np.median(np.abs(scores - mu))) * 1.4826 + 1e-12
    out: List[WsprMessage] = []
    work = scores.copy()
    for _ in range(4 * max_decodes):
        t0, b = np.unravel_index(int(np.argmax(work)), work.shape)
        if (work[t0, b] - mu) / sd < min_score_sigma:
            break
        # suppress the whole peak plateau (a strong beacon spans many
        # adjacent time/frequency cells) whether or not it decodes
        work[max(t0 - 8, 0): t0 + 9, max(b - 4, 0): b + 5] = -np.inf
        rows = spec[t0 + i4]
        e = np.stack([rows[np.arange(WSPR_SYMBOLS), b0 + b + k]
                      for k in range(4)], axis=-1)
        m = wspr_decode_symbols(e)
        if m is not None:
            out.append(m)
        if len(out) >= max_decodes:
            break
    return out
