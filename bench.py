"""Benchmark: FM quadrature demod chain throughput on one TPU chip.

Headline metric per BASELINE.json: complex Msamples/s/chip on the demod
chains. Baseline (BASELINE.md): FM demod = 103 Msps on M2 Pro single core,
measured on FmQuadratureDemod = delay-conjugate discriminator (atan2_approx)
→ LR4 audio lowpass — the exact chain timed here (demodulate/fm.rs:12-90),
batched over channels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from orion_sdr_tpu.dsp.iir import design_butter_lp, lp_cascade
    from orion_sdr_tpu.util import atan2_approx

    fs = 480_000.0
    channels, n = 64, 1 << 20   # 64 × 1M complex samples per step
    rng = np.random.default_rng(0)
    xr_np = rng.standard_normal((channels, n)).astype(np.float32)
    xi_np = rng.standard_normal((channels, n)).astype(np.float32)
    c = design_butter_lp(fs, 5_000.0)
    k = 1.0 / 75_000.0

    # real-valued boundary: the axon TPU backend cannot transfer complex64
    # across host<->device; complex math inside jit is fine.
    @jax.jit
    def fm_chain(z_re, z_im):
        z = z_re + 1j * z_im
        prev = jnp.concatenate([jnp.ones_like(z[..., :1]), z[..., :-1]],
                               axis=-1)
        prod = z * jnp.conj(prev)
        disc = (atan2_approx(prod.imag, prod.real) * k).astype(jnp.float32)
        audio, _ = lp_cascade(disc, c)
        return audio

    xr = jnp.asarray(xr_np)
    xi = jnp.asarray(xi_np)
    # Warm up and force completion: through the axon relay block_until_ready
    # is unreliable, so completion is forced via a scalar host fetch.
    float(jnp.sum(fm_chain(xr, xi)))
    iters = 8
    t0 = time.perf_counter()
    a = xr
    for _ in range(iters):
        a = fm_chain(a, xi)  # data-dependent chain: no elision across iters
    float(jnp.sum(a))
    dt = time.perf_counter() - t0

    msps = channels * n * iters / dt / 1e6
    baseline = 103.0  # M2 Pro single-core FM demod (docs/performance.md:20)
    print(json.dumps({
        "metric": "fm_demod_chain_throughput",
        "value": round(msps, 1),
        "unit": "Msps/chip",
        "vs_baseline": round(msps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
