"""Per-stage profile of the COFDM frame-decode composite (VERDICT r4 #4).

The composite (bench.py::bench_cofdm) reads 943-978 Msps with
``bound: "lower"`` — some term clamps at the relay jitter floor. This
prints each term's RAW marginal (ms), its clamped flag, its rate, and its
SHARE of the composite's per-sample time, so the binding term is explicit.

    python tools/tpu_cofdm_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _size_marginal_s, _fetch, _JITTER_FLOOR_S


def main():
    from orion_sdr_tpu.multicarrier import CarrierPlan
    from orion_sdr_tpu.ofdm import OfdmConfig
    from orion_sdr_tpu.frame.demodulator import soft_demap
    from orion_sdr_tpu.fec.ldpc import ldpc_decode, ldpc_encode, ldpc_graph
    from orion_sdr_tpu.frame.chain import shortened_bch_for
    from orion_sdr_tpu import native

    print("backend:", jax.default_backend(), flush=True)
    plan = CarrierPlan(256, 64).with_contiguous_data(edge_guard=16)
    cfg = OfdmConfig(plan, fs=1e6, constellation="qpsk")
    n_data = plan.num_data_carriers()
    sps = cfg.samples_per_ofdm_symbol()
    batch = 4
    rng = np.random.default_rng(3)
    REPS = 64

    # ── demap term, at several spans to see where it resolves ─────────────
    def make_demap(n_sym):
        n = n_sym * sps
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

        @jax.jit
        def f(r, i):
            def body(carry, _):
                rr, ii, acc = carry
                llr = soft_demap(cfg, "qpsk", rr + 1j * ii, n_sym)
                acc = acc + jnp.sum(llr)
                return (jnp.roll(rr, 1, axis=0) + 1e-9 * acc,
                        jnp.roll(ii, 1, axis=0), acc), 0.0
            (_, _, acc), _ = jax.lax.scan(body, (r, i, jnp.float32(0)),
                                          None, length=REPS)
            return acc
        return f, (re, im)

    demap_rate = None
    for lo, hi in ((32, 256), (32, 1024), (32, 2048)):
        per_sym, cl = _size_marginal_s(make_demap, lo, hi)
        raw_ms = per_sym * (hi - lo) * 1e3
        per_sym /= REPS
        rate = batch * sps / per_sym
        print(f"demap span {lo}->{hi}: raw={raw_ms:.2f} ms clamped={cl} "
              f"rate={rate / 1e9:.1f} Gsps", flush=True)
        if not cl and demap_rate is None:
            demap_rate = rate
            demap_cl = cl
        if not cl and raw_ms > 3.0:
            demap_rate, demap_cl = rate, cl
            break
    if demap_rate is None:
        demap_rate, demap_cl = rate, True

    # ── LDPC BP term ───────────────────────────────────────────────────────
    g = ldpc_graph("N512R12")

    def make_bp_rule(nb, rule):
        msg = rng.integers(0, 2, (nb, g.k)).astype(np.uint8)
        cwb = np.asarray(ldpc_encode("N512R12", msg))
        llr_np = (1.0 - 2.0 * cwb).astype(np.float32) * 4.0
        for i in range(nb):
            pos = rng.choice(g.n, 6, replace=False)
            llr_np[i, pos] = -llr_np[i, pos]
        llr = jnp.asarray(llr_np)

        @jax.jit
        def f(l):
            def body(carry, _):
                ll, acc = carry
                bits, unsat = ldpc_decode("N512R12", ll, 50, rule)
                acc = acc + jnp.sum(unsat) + jnp.sum(bits)
                return (jnp.roll(ll, 1, axis=0) + 1e-9 * acc, acc), 0.0
            (_, acc), _ = jax.lax.scan(body, (l, jnp.float32(0)), None,
                                       length=REPS)
            return acc
        return f, (llr,)

    rates = {}
    for rule in ("sum_product", "scaled_min_sum"):
        per_cw, cl = _size_marginal_s(
            lambda nb: make_bp_rule(nb, rule), 256, 1024)
        raw_ms = per_cw * 768 * 1e3
        per_cw /= REPS
        rates[rule] = (g.n / per_cw, cl)
        print(f"bp {rule}: raw={raw_ms:.2f} ms clamped={cl} "
              f"per_cw={per_cw * 1e6:.3f} us "
              f"rate={g.n / per_cw / 1e9:.2f} Gbps coded", flush=True)

    # ── BCH device term ────────────────────────────────────────────────────
    bch = shortened_bch_for(8)
    msgs = rng.integers(0, 2, (4096, bch.k)).astype(np.uint8)
    cw = bch.encode(msgs.reshape(4096, bch.k)).astype(np.uint8)
    bad = cw.copy()
    for i in range(0, 4096, 8):
        pos = rng.choice(bch.n, 2, replace=False)
        bad[i, pos] ^= 1
    from orion_sdr_tpu.fec.bch_device import bch_decode_batch_device

    def make_bch(B):
        data = jnp.asarray(bad[:B])

        @jax.jit
        def f(d):
            def body(carry, _):
                dd, acc = carry
                out, okf = bch_decode_batch_device(bch.n, bch.k, 8, dd)
                acc = acc + jnp.sum(out) + jnp.sum(okf)
                return (dd ^ (acc.astype(jnp.uint8) & 0), acc), 0.0
            (_, acc), _ = jax.lax.scan(body, (d, jnp.int32(0)), None,
                                       length=8)
            return acc
        return f, (data,)

    per_cw_bch, bch_cl = _size_marginal_s(make_bch, 1024, 4096)
    raw_ms = per_cw_bch * 3072 * 1e3
    bch_info_rate = bch.k / (per_cw_bch / 8)
    print(f"bch device: raw={raw_ms:.2f} ms clamped={bch_cl} "
          f"rate={bch_info_rate / 1e9:.2f} Gbps info", flush=True)

    # ── composite shares ───────────────────────────────────────────────────
    coded_per_sample = n_data * 2 / sps
    ldpc_info_per_sample = coded_per_sample * g.k / g.n
    bch_info_per_sample = ldpc_info_per_sample * bch.k / bch.n
    for rule in ("sum_product", "scaled_min_sum"):
        bp_rate, bp_cl = rates[rule]
        terms = {
            "demap": 1.0 / demap_rate,
            "ldpc": coded_per_sample / bp_rate,
            "bch": bch_info_per_sample / bch_info_rate,
        }
        t = sum(terms.values())
        print(f"[{rule}] composite {1.0 / t / 1e6:.0f} Msps "
              f"(vs 58 = {1.0 / t / 58e6:.1f}x); shares: "
              + ", ".join(f"{k}={v / t * 100:.0f}%"
                          for k, v in terms.items()), flush=True)


if __name__ == "__main__":
    main()
