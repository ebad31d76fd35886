"""Parallel linear recurrences — the TPU-native substrate for IIR state.

The reference library (orion-sdr) runs every IIR filter, DC blocker, and
one-pole envelope as a per-sample Rust loop (e.g. /root/reference/src/dsp/iir.rs,
dsp/dc.rs). On TPU a sequential per-sample loop is the one thing we must not
do: instead, every *linear* recurrence is evaluated as a parallel prefix via
``jax.lax.associative_scan`` (O(log n) depth, fully vectorized on the VPU).

Conventions
-----------
* Signals are ``float32`` / ``complex64`` with the time axis last.
* Streaming state is explicit: every function takes an optional carry-in and
  returns a carry-out, so long captures can be processed block-by-block and
  the carries exchanged across devices (see orion_sdr_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def first_order(a, b, y0=None):
    """Solve ``y[n] = a[n] * y[n-1] + b[n]`` along the last axis.

    ``a`` may be a scalar (constant-coefficient one-pole) or an array
    broadcastable to ``b``. ``y0`` is the carry-in (defaults to 0).

    Returns ``(y, y_last)`` where ``y_last`` is the carry-out (``y[..., -1]``).

    Implemented as an associative scan over affine maps
    ``(a2, b2) ∘ (a1, b1) = (a1*a2, a2*b1 + b2)``.
    """
    b = jnp.asarray(b)
    a = jnp.broadcast_to(jnp.asarray(a, dtype=b.dtype), b.shape)
    if y0 is not None:
        # Fold the carry into the first element: y[0] = a[0]*y0 + b[0].
        b = b.at[..., 0].add(a[..., 0] * jnp.asarray(y0, dtype=b.dtype))

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, b), axis=-1)
    return y, y[..., -1]


def affine2(A, B, x, s0=None):
    """Solve the 2-state recurrence ``s[n] = A @ s[n-1] + B * x[n]``.

    ``A``: (2, 2) constant matrix. ``B``: (2,) input vector. ``x``: (..., n).
    ``s0``: optional (..., 2) initial state.

    Returns ``(s, s_last)`` where ``s`` has shape (..., n, 2) and ``s[..., k, :]``
    is the state *after* absorbing ``x[..., k]``.

    Used for biquads (2nd-order IIR sections): the TDF-II state (z1, z2)
    evolves as exactly this recurrence — see orion_sdr_tpu.dsp.iir.
    """
    x = jnp.asarray(x)
    A = jnp.asarray(A, dtype=x.dtype)
    B = jnp.asarray(B, dtype=x.dtype)
    n = x.shape[-1]
    # Element n carries (A_n, b_n) with composition
    # (A2, b2) ∘ (A1, b1) = (A2 @ A1, A2 @ b1 + b2).
    As = jnp.broadcast_to(A, x.shape + (2, 2))
    bs = x[..., None] * B  # (..., n, 2)
    if s0 is not None:
        b0 = bs[..., 0, :] + jnp.einsum("ij,...j->...i", A, jnp.asarray(s0, dtype=x.dtype))
        bs = bs.at[..., 0, :].set(b0)

    def combine(l, r):
        A1, b1 = l
        A2, b2 = r
        return jnp.matmul(A2, A1), jnp.einsum("...ij,...j->...i", A2, b1) + b2

    _, s = jax.lax.associative_scan(combine, (As, bs), axis=-3)
    return s, s[..., -1, :]
