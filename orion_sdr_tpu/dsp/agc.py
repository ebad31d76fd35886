"""RMS-tracking AGC (ref: /root/reference/src/dsp/agc.rs).

The envelope recurrence switches its pole per-sample on x² > env (attack vs
release), which is genuinely data-dependent — the one recurrence in the DSP
layer that cannot be an associative scan. We keep it a ``lax.scan`` and get
throughput by batching across channels (vmap/leading axes), exactly per the
build plan (SURVEY.md §7 "hard parts").

When attack == release the recurrence is linear and we take the parallel-scan
fast path automatically.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .recurrence import first_order


class AgcParams(NamedTuple):
    attack_a: float
    release_a: float
    target_rms: float
    min_gain: float = 0.05
    max_gain: float = 20.0


def design_agc(fs: float, attack_ms: float, release_ms: float, target_rms: float) -> AgcParams:
    a = lambda ms: float(np.exp(-1.0 / (fs * (max(ms, 1e-3) / 1000.0))))
    return AgcParams(a(attack_ms), a(release_ms), max(target_rms, 1e-6))


def _gain(env, p: AgcParams):
    rms = jnp.maximum(jnp.sqrt(env), 1e-6)
    return jnp.clip(p.target_rms / rms, p.min_gain, p.max_gain)


def agc_rms(x, p: AgcParams, env0=None):
    """AGC over real audio or complex IQ (scalar gain on both I and Q).

    Returns (y, env_out). ``env0=None`` seeds the envelope from the first
    sample's power (ref behavior: agc.rs:57-62), avoiding the initial blast.
    """
    x = jnp.asarray(x)
    x2 = (jnp.abs(x) ** 2).astype(jnp.float32)
    if env0 is None:
        env0 = jnp.maximum(x2[..., 0], 1e-12)
    env0 = jnp.asarray(env0, dtype=jnp.float32)

    if p.attack_a == p.release_a:
        env, env_last = first_order(p.attack_a, (1.0 - p.attack_a) * x2, y0=env0)
        return (x * _gain(env, p).astype(x.dtype if jnp.iscomplexobj(x) else jnp.float32)), env_last

    def step(env, x2n):
        a = jnp.where(x2n > env, p.attack_a, p.release_a)
        env = a * env + (1.0 - a) * x2n
        return env, env

    # scan over time (last axis); leading axes ride along via vectorized ops
    x2t = jnp.moveaxis(x2, -1, 0)
    env_last, envt = jax.lax.scan(step, env0, x2t)
    env = jnp.moveaxis(envt, 0, -1)
    g = _gain(env, p)
    if jnp.iscomplexobj(x):
        g = g.astype(jnp.complex64)
    return x * g, env_last
