"""WSPR-style beacon receiver: joint coarse time/frequency search on the
known sync chips, then per-symbol 4-tone energies → sequential decode.

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
