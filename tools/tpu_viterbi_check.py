"""TPU check + hardened marginal for the Viterbi kernel (v4: bit-plane traceback).

Bit-exactness vs the jnp chunked path on integer-ish LLRs, then the 48-rep
marginal at the DVB-T operating point (128 lanes x 1216-step trellis).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orion_sdr_tpu.ops.viterbi import viterbi_chunks_pallas, _chunks_jnp


def fetch(x):
    return float(jnp.sum(jnp.asarray(x)))


print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
L, span, S = 256, 1216, 64

# integer-ish LLRs (the bit-exactness domain)
c0 = (rng.integers(-4, 5, (L, span))).astype(np.float32)
c1 = (rng.integers(-4, 5, (L, span))).astype(np.float32)
pm0 = np.zeros((L, S), np.float32)

bits_k = np.asarray(viterbi_chunks_pallas(jnp.asarray(c0), jnp.asarray(c1),
                                          jnp.asarray(pm0), "dvb_k7",
                                          interpret=False))
# jnp reference at 128 lanes (the 256-lane XLA compile takes >10 min through
# the relay); the 256-lane kernel instance must agree with both
bits_j = np.asarray(_chunks_jnp(c0[:128], c1[:128], pm0[:128], "dvb_k7"))
eq = np.array_equal(bits_k[:128], bits_j)
print("rows 0-127 bit-exact vs jnp (integer LLRs):", eq, flush=True)
from orion_sdr_tpu.ops.viterbi import _run_kernel
b128 = np.concatenate([
    np.asarray(_run_kernel(jnp.asarray(c0[i:i+128]), jnp.asarray(c1[i:i+128]),
                           jnp.asarray(pm0[i:i+128]), "dvb_k7", False,
                           lanes=128, lx_bf16=True))
    for i in (0, 128)])
print("256-lane == 2x128-lane kernel:", np.array_equal(bits_k, b128),
      flush=True)

# hardened 48-rep marginal
c0j, c1j = jnp.asarray(rng.standard_normal((L, span)).astype(np.float32)), \
           jnp.asarray(rng.standard_normal((L, span)).astype(np.float32))
pm0j = jnp.asarray(pm0)


def make_runner(R):
    @jax.jit
    def f(a, b):
        def body(carry, _):
            aa, bb = carry
            bits = viterbi_chunks_pallas(aa, bb, pm0j, "dvb_k7",
                                         interpret=False)
            bump = jnp.sum(bits) * 1e-6
            return (jnp.roll(aa, 1, axis=0) + bump,
                    jnp.roll(bb, 1, axis=0)), 0.0
        (aa, bb), _ = jax.lax.scan(body, (a, b), None, length=R)
        return jnp.sum(aa)
    return f


f1, fn = make_runner(1), make_runner(49)
fetch(f1(c0j, c1j))
fetch(fn(c0j, c1j))
pers = []
for _ in range(7):
    t0 = time.perf_counter(); fetch(f1(c0j, c1j)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); fetch(fn(c0j, c1j)); dn = time.perf_counter() - t0
    pers.append((dn - d1) / 48)
per = float(np.median(pers))
print(f"marginal: {per*1e3:.3f} ms/call -> "
      f"{L*1024/per/1e6:.0f} info-Mbps (1024 payload steps/lane)", flush=True)
print("done", flush=True)
