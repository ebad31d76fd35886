"""Round-3 TPU probe: Viterbi (lanes × renorm cadence) variants + slab
sum-product BP timing. Sequential, one process (two concurrent tools
serialize on the relay)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from orion_sdr_tpu.ops import viterbi as V
from orion_sdr_tpu.ops.viterbi import _run_kernel, _chunks_jnp


def fetch(x):
    return float(jnp.sum(jnp.asarray(x)))


print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
L, span, S = 256, 1216, 64
c0 = (rng.integers(-4, 5, (L, span))).astype(np.float32)
c1 = (rng.integers(-4, 5, (L, span))).astype(np.float32)
pm0 = np.zeros((L, S), np.float32)
# reference = the default kernel config (chip-validated bit-exact vs jnp in
# tools/tpu_viterbi_check.py); the jnp path's 256-lane XLA compile takes >10
# min through the relay, so variants compare against the kernel instead
ref = np.asarray(_run_kernel(jnp.asarray(c0), jnp.asarray(c1),
                             jnp.asarray(pm0), "dvb_k7", False))


def probe(lanes, renorm_every, reps=48):
    l0j, l1j = jnp.asarray(c0[:lanes]), jnp.asarray(c1[:lanes])
    pm0j = jnp.asarray(pm0[:lanes])

    out = np.asarray(_run_kernel(l0j, l1j, pm0j, "dvb_k7", False,
                                 lanes=lanes, renorm_every=renorm_every))
    exact = np.array_equal(out, ref[:lanes])

    def runner(R):
        @jax.jit
        def f(a, b):
            def body(carry, _):
                aa, bb = carry
                bits = _run_kernel(aa, bb, pm0j, "dvb_k7", False,
                                   lanes=lanes, renorm_every=renorm_every)
                bump = jnp.sum(bits) * 1e-6
                return (jnp.roll(aa, 1, axis=0) + bump,
                        jnp.roll(bb, 1, axis=0)), 0.0
            (aa, _), _ = jax.lax.scan(body, (a, b), None, length=R)
            return jnp.sum(aa)
        return f

    f1, fn = runner(1), runner(reps + 1)
    fetch(f1(l0j, l1j)); fetch(fn(l0j, l1j))
    pers = []
    for _ in range(7):
        t0 = time.perf_counter(); fetch(f1(l0j, l1j)); d1 = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(fn(l0j, l1j)); dn = time.perf_counter() - t0
        pers.append((dn - d1) / reps)
    per = float(np.median(pers))
    print(f"lanes={lanes} renorm={renorm_every}: exact={exact} "
          f"{per*1e3:.3f} ms -> {lanes*1024/per/1e6:.0f} info-Mbps", flush=True)


for lanes, re_ in ((128, 1), (128, 4), (128, 8), (256, 4), (256, 1)):
    try:
        probe(lanes, re_)
    except Exception as e:                            # noqa: BLE001
        print(f"lanes={lanes} renorm={re_}: FAILED {str(e)[:160]}", flush=True)

# ── slab sum-product BP timing ──────────────────────────────────────────────
from orion_sdr_tpu.fec.ldpc import ldpc_graph, ldpc_encode, _graph_key
from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas

g = ldpc_graph("N512R12")
rng2 = np.random.default_rng(3)


def bp_case(B):
    msg = rng2.integers(0, 2, (B, g.k)).astype(np.uint8)
    cwb = np.asarray(ldpc_encode("N512R12", msg))
    llr = (1.0 - 2.0 * cwb).astype(np.float32) * 4.0
    for i in range(B):
        pos = rng2.choice(g.n, 6, replace=False)
        llr[i, pos] = -llr[i, pos]
    return msg, jnp.asarray(llr)


def bp_time(rule, B_small=256, B_big=1024):
    def make(B):
        _, l = bp_case(B)

        @jax.jit
        def f(x):
            def body(carry, _):
                xx, acc = carry
                best, mu = bp_decode_pallas(_graph_key(g), xx, 50,
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
    for _ in range(7):
        t0 = time.perf_counter(); fetch(fs(xs)); ds.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(fb(xb)); db.append(time.perf_counter() - t0)
    per_cw = (np.median(db) - np.median(ds)) / (B_big - B_small) / 32
    print(f"BP {rule}: {per_cw*1e6:.3f} us/cw -> {512/per_cw/1e6:.0f} Mbps coded",
          flush=True)


# correctness of slab sum_product compiled
msg, llr = bp_case(8)
best, mu = bp_decode_pallas(_graph_key(g), llr, 30, interpret=False,
                            rule="sum_product")
ok = (int(np.asarray(mu).sum()) == 0 and
      np.array_equal(np.asarray(best)[:, :g.k].astype(np.uint8), msg))
print("slab sum_product compiled decode ok:", ok, flush=True)

for rule in ("sum_product", "sum_product_edge", "min_sum", "scaled_min_sum"):
    try:
        bp_time(rule)
    except Exception as e:                            # noqa: BLE001
        print(f"BP {rule}: FAILED {str(e)[:160]}", flush=True)
print("done", flush=True)
