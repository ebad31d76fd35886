"""IIR sections as parallel linear recurrences.

The reference implements biquads/cascades as per-sample TDF-II loops
(/root/reference/src/dsp/iir.rs). Here each section's 2-state TDF-II
recurrence is solved with an O(log n) associative scan (dsp.recurrence),
so whole captures filter in one vectorized pass. Identical difference
equations → identical outputs (to f32 rounding).

State pytrees: a biquad state is a (..., 2) array (z1, z2); a DC blocker
state is a (..., 2) array (x1, y1).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .recurrence import first_order, affine2


class BiquadCoefs(NamedTuple):
    b0: float
    b1: float
    b2: float
    a1: float
    a2: float


def design_butter_lp(fs: float, fc: float) -> BiquadCoefs:
    """RBJ cookbook Butterworth lowpass biquad, Q = 1/√2 (ref: dsp/iir.rs:49-76)."""
    w0 = 2.0 * np.pi * fc / fs
    sin, cos = np.sin(w0), np.cos(w0)
    alpha = sin / (2.0 * np.sqrt(0.5))
    b0 = (1.0 - cos) * 0.5
    b1 = 1.0 - cos
    b2 = (1.0 - cos) * 0.5
    a0 = 1.0 + alpha
    return BiquadCoefs(b0 / a0, b1 / a0, b2 / a0, -2.0 * cos / a0, (1.0 - alpha) / a0)


def dc_pole(fs: float, cut_hz: float) -> float:
    """DC-blocker pole r (ref: dsp/dc.rs:15-22)."""
    return float(np.clip(1.0 - 2.0 * np.pi * (max(cut_hz, 0.1) / fs), 0.0, 0.9999))


def biquad(x, c: BiquadCoefs, state=None):
    """One TDF-II biquad over the last axis. Returns (y, state).

    TDF-II:  y = b0·x + z1;  z1' = b1·x + z2 − a1·y;  z2' = b2·x − a2·y.
    As a state recurrence s = (z1, z2):
      s[n] = A s[n−1] + B x[n],  A = [[−a1, 1], [−a2, 0]],
      B = (b1 − a1·b0, b2 − a2·b0),  y[n] = b0·x[n] + z1[n−1].
    """
    x = jnp.asarray(x)
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype)
    A = np.array([[-c.a1, 1.0], [-c.a2, 0.0]], dtype=np.float32)
    B = np.array([c.b1 - c.a1 * c.b0, c.b2 - c.a2 * c.b0], dtype=np.float32)
    s, s_last = affine2(A, B, x, s0=state)
    z1_prev = jnp.concatenate([state[..., 0:1], s[..., :-1, 0]], axis=-1)
    y = c.b0 * x + z1_prev
    return y, s_last


def lp_cascade(x, c: BiquadCoefs, state=None):
    """Two cascaded identical biquads = 4th-order LR lowpass (ref: dsp/iir.rs:44-87)."""
    x = jnp.asarray(x)
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (2, 2), dtype=x.dtype)
    y0, s0 = biquad(x, c, state[..., 0, :])
    y1, s1 = biquad(y0, c, state[..., 1, :])
    return y1, jnp.stack([s0, s1], axis=-2)


def dc_blocker(x, r: float, state=None):
    """y[n] = x[n] − x[n−1] + r·y[n−1] (ref: dsp/dc.rs). Returns (y, state).

    state = (x1, y1) packed in a (..., 2) array.
    """
    x = jnp.asarray(x)
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype)
    x1, y1 = state[..., 0], state[..., 1]
    xprev = jnp.concatenate([x1[..., None], x[..., :-1]], axis=-1)
    v = x - xprev
    y, y_last = first_order(jnp.asarray(r, dtype=x.dtype), v, y0=y1)
    return y, jnp.stack([x[..., -1], y_last], axis=-1)


class LpDcState(NamedTuple):
    bq: jnp.ndarray  # (..., 2, 2) two biquad states
    dc: jnp.ndarray  # (..., 2) dc blocker state


def lp_dc_cascade(x, c: BiquadCoefs, r: float, state: LpDcState | None = None, map_fn=None):
    """Fused LP4 + optional elementwise map + DC blocker (ref: dsp/iir.rs:90-187).

    ``map_fn`` (e.g. jnp.sqrt for AM-PowerSqrt) is applied between the LP and
    the DC blocker — all three stages remain whole-capture vectorized because
    the nonlinearity sits *between* two linear recurrences.
    """
    x = jnp.asarray(x)
    if state is None:
        state = LpDcState(
            bq=jnp.zeros(x.shape[:-1] + (2, 2), dtype=x.dtype),
            dc=jnp.zeros(x.shape[:-1] + (2,), dtype=x.dtype),
        )
    y, bq_state = lp_cascade(x, c, state.bq)
    if map_fn is not None:
        y = map_fn(y)
    y, dc_state = dc_blocker(y, r, state.dc)
    return y, LpDcState(bq=bq_state, dc=dc_state)
