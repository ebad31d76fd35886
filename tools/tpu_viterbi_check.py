"""TPU check + hardened marginal for the v3 Viterbi kernel (round 3).

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
L, span, S = 128, 1216, 64

# integer-ish LLRs (the bit-exactness domain)
c0 = (rng.integers(-4, 5, (L, span))).astype(np.float32)
c1 = (rng.integers(-4, 5, (L, span))).astype(np.float32)
pm0 = np.zeros((L, S), np.float32)

bits_k = np.asarray(viterbi_chunks_pallas(jnp.asarray(c0), jnp.asarray(c1),
                                          jnp.asarray(pm0), "dvb_k7",
                                          interpret=False))
bits_j = np.asarray(_chunks_jnp(c0, c1, pm0, "dvb_k7"))
eq = np.array_equal(bits_k, bits_j)
print("bit-exact vs jnp (integer LLRs):", eq,
      "mismatch rows:" if not eq else "",
      int((bits_k != bits_j).any(axis=1).sum()) if not eq else "", flush=True)

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
