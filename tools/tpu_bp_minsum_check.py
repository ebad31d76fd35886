"""TPU check + marginal timing for the min-sum BP kernels (round 3).

Verifies compiled kernel output vs the CPU XLA path per rule, then times
the per-codeword marginal for each rule at the COFDM operating point.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orion_sdr_tpu.fec.ldpc import ldpc_graph, ldpc_encode, _graph_key, bp_decode
from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas


def fetch(x):
    return float(jnp.sum(jnp.asarray(x)))


def case(name, n_flips, B, seed):
    g = ldpc_graph(name)
    rng = np.random.default_rng(seed)
    msg = rng.integers(0, 2, (B, g.k)).astype(np.uint8)
    cw = np.asarray(ldpc_encode(name, msg))
    llr = np.where(cw == 0, 4.0, -4.0).astype(np.float32)
    for b in range(B):
        llr[b, rng.choice(g.n, n_flips, replace=False)] *= -1
    return g, msg, llr


print("backend:", jax.default_backend(), flush=True)

# correctness: compiled kernel vs interpret(=CPU jnp semantics)
g, msg, llr = case("N512R12", 6, 8, 0)
for rule in ("min_sum", "scaled_min_sum", "sum_product"):
    best, mu = bp_decode_pallas(_graph_key(g), jnp.asarray(llr), 30,
                                interpret=False, rule=rule)
    mu = np.asarray(mu)
    best = np.asarray(best)
    ok = (mu.sum() == 0) and np.array_equal(
        best[:, :g.k].astype(np.uint8), msg)
    print(f"{rule}: decode ok = {ok}, mu = {mu.tolist()}", flush=True)

# marginal timing per rule at the operating point (6 flips, max_iter 50)
def timing(rule, B_small=256, B_big=1024, trials=7):
    def make(B):
        gg, mm, ll = case("N512R12", 6, B, 3)
        l = jnp.asarray(ll)

        @jax.jit
        def f(x):
            def body(carry, _):
                xx, acc = carry
                best, mu = bp_decode_pallas(_graph_key(gg), xx, 50,
                                            interpret=False, rule=rule)
                acc = acc + jnp.sum(mu) + jnp.sum(best)
                return (jnp.roll(xx, 1, axis=0) + 1e-9 * acc, acc), 0.0
            (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None,
                                       length=32)
            return acc
        return f, l

    fs, xs = make(B_small)
    fb, xb = make(B_big)
    fetch(fs(xs)); fetch(fb(xb))
    ds, db = [], []
    for _ in range(trials):
        t0 = time.perf_counter(); fetch(fs(xs)); ds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(fb(xb)); db.append(time.perf_counter() - t0)
    per_cw = (np.median(db) - np.median(ds)) / (B_big - B_small) / 32
    print(f"{rule}: {per_cw*1e6:.3f} us/cw -> {512/per_cw/1e6:.0f} Mbps coded, "
          f"{256/per_cw/1e6:.0f} Mbps info", flush=True)


for rule in ("sum_product", "min_sum", "scaled_min_sum"):
    timing(rule)
print("done", flush=True)

# slab-vs-edge sum-product comparison
for rule in ("sum_product_edge",):
    timing(rule)
print("edge-vs-slab done", flush=True)
