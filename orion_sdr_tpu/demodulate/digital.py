"""Single-carrier digital demod stages (ref: demodulate/{bpsk,qpsk,qam}.rs).

IQ → psk_qam_demod (carrier removal + gain) → soft symbols → decide / soft_llr.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit as _cjit

from ..constellation import decide, soft_llr
from ..dsp.osc import rotate


@_cjit
def psk_qam_demod(iq, fs, rf_hz=0.0, gain=1.0, phase0=0.0):
    """Carrier removal + gain: soft symbol passthrough (ref: BpskDemod etc.).

    Returns (soft_symbols, phase_out)."""
    z = jnp.asarray(iq)
    if rf_hz != 0.0:
        z, phase0 = rotate(z, -rf_hz, fs, phase0)
    return (z * gain).astype(jnp.complex64), phase0


@_cjit
def digital_demod(iq, order, fs, rf_hz=0.0, gain=1.0, phase0=0.0):
    """IQ → hard bits in one call. Returns (bits, phase_out)."""
    soft, phase = psk_qam_demod(iq, fs, rf_hz, gain, phase0)
    return decide(soft, order), phase


def estimate_cfo_mpsk(iq, fs: float, m: int = 4) -> float:
    """Blind carrier-offset estimate for M-PSK bursts (beyond the
    reference, which assumes a known rf_hz): raising z to the M-th power
    wipes the modulation, leaving a tone at M·CFO — read its frequency
    from the phase ramp of z^M. Capture range ±fs/(2M).

    Vectorized: one elementwise power + one delay-conjugate mean."""
    @_cjit
    def _est(re, im, m: int):
        z = (re + 1j * im) ** m
        prod = jnp.sum(z[..., 1:] * jnp.conj(z[..., :-1]), axis=-1)
        return jnp.arctan2(prod.imag, prod.real).astype(jnp.float32)

    z = np.asarray(iq)
    ang = float(_est(np.ascontiguousarray(z.real, np.float32),
                     np.ascontiguousarray(z.imag, np.float32), int(m)))
    return ang * fs / (2.0 * np.pi * m)


def fde_equalize(iq, training, block: int = 256, noise_var: float = 1e-3):
    """Single-carrier frequency-domain equalization (SC-FDE — beyond the
    reference, which has no single-carrier channel equalizer): estimate
    the channel by correlating against a known ``training`` burst at the
    capture start, then apply the MMSE inverse per overlap-save block.

    TPU design: channel estimate = one FFT ratio; equalization = batched
    FFT → elementwise MMSE weight → IFFT with 50% overlap-save. Returns
    the equalized capture (same length, training included)."""
    t = np.asarray(training)
    z = np.asarray(iq)
    n_t = len(t)
    if n_t < 8 or len(z) < n_t:
        raise ValueError("training must be ≥8 samples and fit the capture")
    L = min(block, 1 << int(np.floor(np.log2(n_t))))

    @_cjit
    def _run(zr, zi, tr, ti, L: int, n_t: int, noise_var: float):
        zz = zr + 1j * zi
        tt = tr + 1j * ti
        # channel estimate: average the per-block spectral ratio over the
        # training region (regularized least squares per bin)
        nb_t = n_t // L
        rxb = zz[: nb_t * L].reshape(nb_t, L)
        txb = tt[: nb_t * L].reshape(nb_t, L)
        rf = jnp.fft.fft(rxb, axis=-1)
        tf = jnp.fft.fft(txb, axis=-1)
        h = (jnp.sum(rf * jnp.conj(tf), axis=0)
             / (jnp.sum(jnp.abs(tf) ** 2, axis=0) + 1e-9))
        # MMSE weight, applied overlap-save with 50% overlap
        w = jnp.conj(h) / (jnp.abs(h) ** 2 + noise_var)
        n = zz.shape[-1]
        hop = L // 2
        nblk = (n - L) // hop + 1
        idx = jnp.arange(nblk)[:, None] * hop + jnp.arange(L)[None, :]
        blocks = zz[idx]
        eq = jnp.fft.ifft(jnp.fft.fft(blocks, axis=-1) * w, axis=-1)
        # keep each block's central half (discard circular edges)
        q = L // 4
        core = eq[:, q:q + hop].reshape(-1)
        head = eq[0, :q]
        tail = eq[-1, q + hop:]
        out = jnp.concatenate([head, core, tail])
        return out[:n]

    out = _run(np.ascontiguousarray(z.real, np.float32),
               np.ascontiguousarray(z.imag, np.float32),
               np.ascontiguousarray(t.real, np.float32),
               np.ascontiguousarray(t.imag, np.float32),
               int(L), int(n_t), float(noise_var))
    return np.asarray(out)
