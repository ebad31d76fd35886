"""Stage-by-stage chip profile of the FM stereo+RDS composite program
(12 Msps measured round 4 — ~200× slower per sample than the mono FM
chain). Times cumulative sub-programs by in-scan marginal so the costly
stage is unambiguous.

    python tools/tpu_stereo_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _marginal_s
from orion_sdr_tpu.dsp.osc import TAU
from orion_sdr_tpu.dsp.fir import (fir_filter_aligned, kaiser_lowpass_taps,
                                   kaiser_num_taps)
from orion_sdr_tpu.demodulate.fm_stereo import (_delay_conj_product,
                                                FM_STEREO_PILOT_HZ)

fs, n = 240_000.0, 1 << 17
rng = np.random.default_rng(0)
re = jnp.asarray(rng.standard_normal(n).astype(np.float32))
im = jnp.asarray(rng.standard_normal(n).astype(np.float32))

pil_taps = kaiser_lowpass_taps(kaiser_num_taps(900.0 / fs, 60.0),
                               500.0 / fs, 60.0)
aud_taps = kaiser_lowpass_taps(kaiser_num_taps(5000.0 / fs, 60.0),
                               16_000.0 / fs, 60.0)
rds_taps = kaiser_lowpass_taps(kaiser_num_taps(2400.0 / fs, 50.0),
                               2100.0 / fs, 50.0)
print(f"taps: pilot={len(pil_taps)} audio={len(aud_taps)} "
      f"rds={len(rds_taps)}", flush=True)


def stage(name, fn):
    def make():
        def body(carry):
            r, i, acc = carry
            acc = acc + fn(r, i)
            return (jnp.roll(r, 1) + 1e-12 * acc, jnp.roll(i, 1), acc)
        return body, (re, im, jnp.float32(0))
    per = _marginal_s(make, n_long=9, trials=5)
    print(f"{name:40s} {per * 1e3:8.3f} ms  ({n / per / 1e6:7.1f} Msps)",
          flush=True)


def disc(r, i):
    z = r + 1j * i
    prod = _delay_conj_product(z, jnp.ones(z.shape[:-1], jnp.complex64))
    return (jnp.arctan2(prod.imag, prod.real) * (fs / (TAU * 75e3))
            ).astype(jnp.float32)


e1 = None


def get_e1(nn):
    return jnp.exp(-1j * (TAU * FM_STEREO_PILOT_HZ / fs)
                   * jnp.arange(1, nn + 1, dtype=jnp.float32))


stage("discriminator only", lambda r, i: jnp.sum(disc(r, i)))
stage("disc + pilot FIR (965 taps, cplx)",
      lambda r, i: jnp.sum(jnp.abs(
          fir_filter_aligned(disc(r, i) * get_e1(n), pil_taps))))
stage("disc + audio FIR (real)",
      lambda r, i: jnp.sum(fir_filter_aligned(disc(r, i), aud_taps)))
stage("disc + audio FIR (cplx input)",
      lambda r, i: jnp.sum(jnp.abs(
          fir_filter_aligned(disc(r, i) * get_e1(n) * get_e1(n),
                             aud_taps))))
stage("disc + rds FIR (cplx input)",
      lambda r, i: jnp.sum(jnp.abs(
          fir_filter_aligned(disc(r, i) * get_e1(n) ** 3, rds_taps))))

from orion_sdr_tpu.demodulate.fm_stereo import _stereo_device
stage("FULL composite (want_rds=True)",
      lambda r, i: sum(jnp.sum(jnp.abs(o)) for o in
                       _stereo_device.__wrapped__(r, i, fs, 75e3, 15e3,
                                                  0.45, True)))
print("DONE", flush=True)
