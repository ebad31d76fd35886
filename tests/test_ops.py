"""Pallas TPU kernel tests, run in interpreter mode on the CPU mesh
(compiled-mode validation happens on the real chip via tools/tpu_smoke.py
and the DVB-T receive chain, which routes through these kernels on TPU)."""

import numpy as np

from orion_sdr_tpu.fec.conv import (conv_encode_punctured, depuncture_llrs,
                                    tail_bits, viterbi_decode_soft)
from orion_sdr_tpu.ops.viterbi import (viterbi_decode_soft_pallas,
                                       viterbi_chunks_pallas)


def _llrs(code, rate, info, rng, flip=0.03):
    coded = np.stack([np.asarray(conv_encode_punctured(r, rate, code))
                      for r in info])
    llr = np.where(coded == 0, 4.0, -4.0).astype(np.float32)
    return np.where(rng.random(llr.shape) < flip, -llr, llr)


def test_pallas_plain_matches_jnp():
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (3, 200)).astype(np.uint8)
    llr = _llrs("k5", "1/2", info, rng)
    ref = np.asarray(viterbi_decode_soft(llr, 200, "1/2", "k5"))
    out = np.asarray(viterbi_decode_soft_pallas(llr, 200, "1/2", "k5",
                                                interpret=True))
    assert np.array_equal(out, ref)


def test_pallas_chunked_single_covering_chunk_matches_full():
    # one chunk spanning the whole zero-tail-terminated trellis: the chunked
    # kernel (argmax-start traceback, per-step renorm) must reproduce the
    # full Viterbi exactly (final argmax IS state 0 at termination).
    rng = np.random.default_rng(1)
    code, rate, n_info = "dvb_k7", "1/2", 120
    info = rng.integers(0, 2, (2, n_info)).astype(np.uint8)
    llr = _llrs(code, rate, info, rng, flip=0.02)
    ref = np.asarray(viterbi_decode_soft(llr, n_info, rate, code))

    full = np.asarray(depuncture_llrs(llr, n_info, rate, code))
    l0, l1 = full[:, 0::2], full[:, 1::2]
    S = 64
    pm0 = np.full((2, S), -1e30, np.float32)
    pm0[:, 0] = 0.0
    bits = np.asarray(viterbi_chunks_pallas(l0, l1, pm0, code,
                                            interpret=True))
    assert np.array_equal(bits[:, :n_info].astype(np.uint8), ref)
    assert np.array_equal(bits[:, :n_info].astype(np.uint8), info)


def test_pallas_chunked_uniform_start_converges():
    # a mid-stream chunk with uniform initial metrics: after the warm-up
    # margin the decoded bits match the full decode (fixed-lag property).
    rng = np.random.default_rng(2)
    code, rate = "dvb_k7", "1/2"
    n_info, V = 400, 96
    info = rng.integers(0, 2, (1, n_info)).astype(np.uint8)
    llr = _llrs(code, rate, info, rng, flip=0.02)
    ref = np.asarray(viterbi_decode_soft(llr, n_info, rate, code))[0]

    full = np.asarray(depuncture_llrs(llr, n_info, rate, code))
    l0, l1 = full[:, 0::2], full[:, 1::2]
    pm0 = np.zeros((1, 64), np.float32)          # uniform: unknown start
    bits = np.asarray(viterbi_chunks_pallas(l0, l1, pm0, code,
                                            interpret=True))[0]
    n_steps = n_info + tail_bits(code)
    assert np.array_equal(bits[V:n_steps - V].astype(np.uint8),
                          ref[V:n_steps - V])


# ── Pallas LDPC BP (interpret mode; compiled path validated on chip) ─────────

def _bp_case(name, n_flips, B, seed):
    from orion_sdr_tpu.fec import ldpc_encode, ldpc_graph
    g = ldpc_graph(name)
    rng = np.random.default_rng(seed)
    msg = rng.integers(0, 2, (B, g.k)).astype(np.uint8)
    cw = np.asarray(ldpc_encode(name, msg))
    llr = np.where(cw == 0, 4.0, -4.0).astype(np.float32)
    for b in range(B):
        llr[b, rng.choice(g.n, n_flips, replace=False)] *= -1
    return g, msg, llr


def test_bp_pallas_matches_xla_n512():
    from orion_sdr_tpu.fec.ldpc import bp_decode, _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    g, msg, llr = _bp_case("N512R12", 8, 3, 0)
    bits, unsat = bp_decode(g, llr, 30, "sum_product")   # XLA path on CPU
    best, mu = bp_decode_pallas(_graph_key(g), llr, 30, interpret=True)
    assert np.array_equal(np.asarray(mu), np.asarray(unsat))
    assert int(np.asarray(mu).sum()) == 0
    assert np.array_equal(np.asarray(best)[:, :g.k].astype(np.uint8), msg)


def test_bp_pallas_matches_xla_ft8():
    from orion_sdr_tpu.codec.ft8_ldpc import ft8_ldpc_graph
    from orion_sdr_tpu.fec.ldpc import _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    from orion_sdr_tpu.fec.ldpc import bp_decode
    g = ft8_ldpc_graph()
    rng = np.random.default_rng(1)
    from orion_sdr_tpu.codec import ft8_ldpc
    m = rng.integers(0, 2, (2, 91)).astype(np.uint8)
    cw = np.stack([np.asarray(ft8_ldpc.ldpc_encode(r)) for r in m])
    llr = np.where(cw == 0, 4.0, -4.0).astype(np.float32)
    llr[0, rng.choice(174, 6, replace=False)] *= -1
    best, mu = bp_decode_pallas(_graph_key(g), llr, 20, interpret=True)
    assert int(np.asarray(mu).sum()) == 0
    assert np.array_equal(np.asarray(best)[:, :91].astype(np.uint8), m)


def test_bp_pallas_reports_unsat_on_garbage():
    from orion_sdr_tpu.fec.ldpc import ldpc_graph, _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    g = ldpc_graph("N512R12")
    rng = np.random.default_rng(2)
    llr = rng.standard_normal((2, g.n)).astype(np.float32)
    _, mu = bp_decode_pallas(_graph_key(g), llr, 15, interpret=True)
    assert (np.asarray(mu) > 0).all()


def test_bp_tables_structure():
    """Operator-table invariants the kernel's exactness argument rests on:
    one-hot rows only for mask-true edge slots (padded slots all-zero, no
    dummy-bit column), H's column sums equal the true check degrees, and
    the bit axis is pad(n)."""
    from orion_sdr_tpu.fec.ldpc import ldpc_graph, _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import _bp_tables
    for name in ("N512R12", "N576R23"):
        g = ldpc_graph(name)
        SB, MC, H, ev, cv, Ep, Np, mp = _bp_tables(_graph_key(g))
        E = g.m * g.max_deg
        assert Np == -(-g.n // 128) * 128 and SB.shape == (Ep, Np)
        flat_mask = g.check_mask.reshape(-1)
        # each mask-true slot: exactly one 1 in SB and MC; padded: all-zero
        assert np.array_equal(SB[:E].sum(axis=1), flat_mask.astype(float))
        assert np.array_equal(MC[:E].sum(axis=1), flat_mask.astype(float))
        assert not SB[E:].any() and not MC[E:].any()
        # H column c = indicator of check c's bits; degree = mask row sum
        deg = g.check_mask.sum(axis=1)
        assert np.array_equal(H.sum(axis=0)[:g.m], deg.astype(float))
        assert not H[:, g.m:].any() and not H[g.n:, :].any()
        # bf16 exactness precondition: parity-count sums stay small integers
        assert int(deg.max()) < 64


def test_pallas_chunked_odd_span_falls_back():
    """Regression: the radix-2 kernel needs even spans; odd spans must take
    the jnp fallback instead of asserting."""
    rng = np.random.default_rng(9)
    c0 = rng.standard_normal((2, 1215)).astype(np.float32)
    c1 = rng.standard_normal((2, 1215)).astype(np.float32)
    pm0 = np.zeros((2, 64), np.float32)
    bits = np.asarray(viterbi_chunks_pallas(c0, c1, pm0, "dvb_k7"))
    assert bits.shape == (2, 1215)


def test_bp_pallas_min_sum_matches_xla():
    """Min-sum kernel (slab layout) vs the XLA min-sum path: identical
    min_unsat and decoded message on error-injected decodable codewords."""
    from orion_sdr_tpu.fec.ldpc import bp_decode, _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    for name, flips in (("N512R12", 8), ("N512R34", 4), ("N576R23", 6)):
        g, msg, llr = _bp_case(name, flips, 3, 7)
        bits, unsat = bp_decode(g, llr, 30, "min_sum")
        best, mu = bp_decode_pallas(_graph_key(g), llr, 30, interpret=True,
                                    rule="min_sum")
        assert np.array_equal(np.asarray(mu), np.asarray(unsat)), name
        assert int(np.asarray(mu).sum()) == 0, name
        assert np.array_equal(np.asarray(best)[:, :g.k].astype(np.uint8),
                              msg), name


def test_bp_pallas_scaled_min_sum_matches_xla():
    from orion_sdr_tpu.fec.ldpc import bp_decode, _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    g, msg, llr = _bp_case("N512R12", 10, 4, 11)
    bits, unsat = bp_decode(g, llr, 30, "scaled_min_sum", 0.75)
    best, mu = bp_decode_pallas(_graph_key(g), llr, 30, interpret=True,
                                rule="scaled_min_sum", alpha=0.75)
    assert np.array_equal(np.asarray(mu), np.asarray(unsat))
    assert int(np.asarray(mu).sum()) == 0
    assert np.array_equal(np.asarray(best)[:, :g.k].astype(np.uint8), msg)


def test_bp_pallas_min_sum_ft8_graph():
    """The slab kernel on the FT8 (174,91) graph (deg-7 slabs, small mp)."""
    from orion_sdr_tpu.codec.ft8_ldpc import ft8_ldpc_graph
    from orion_sdr_tpu.fec.ldpc import _graph_key, bp_decode
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    from orion_sdr_tpu.codec import ft8_ldpc
    g = ft8_ldpc_graph()
    rng = np.random.default_rng(3)
    m = rng.integers(0, 2, (2, 91)).astype(np.uint8)
    cw = np.stack([np.asarray(ft8_ldpc.ldpc_encode(r)) for r in m])
    llr = np.where(cw == 0, 4.0, -4.0).astype(np.float32)
    llr[0, rng.choice(174, 5, replace=False)] *= -1
    bits, unsat = bp_decode(g, llr, 25, "min_sum")
    best, mu = bp_decode_pallas(_graph_key(g), llr, 25, interpret=True,
                                rule="min_sum")
    assert np.array_equal(np.asarray(mu), np.asarray(unsat))
    assert int(np.asarray(mu).sum()) == 0
    assert np.array_equal(np.asarray(best)[:, :91].astype(np.uint8), m)


def test_bp_pallas_min_sum_unsat_on_garbage():
    from orion_sdr_tpu.fec.ldpc import ldpc_graph, _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    g = ldpc_graph("N512R12")
    rng = np.random.default_rng(5)
    llr = rng.standard_normal((2, g.n)).astype(np.float32)
    _, mu = bp_decode_pallas(_graph_key(g), llr, 15, interpret=True,
                             rule="min_sum")
    assert (np.asarray(mu) > 0).all()


def test_ms_tables_structure():
    """Slab-table invariants: row j·mp+c one-hot at check c's j-th bit for
    mask-true slots, zero otherwise; slab validity mirrors the mask; H
    matches the sum-product H."""
    from orion_sdr_tpu.fec.ldpc import ldpc_graph, _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import _ms_tables, _bp_tables
    for name in ("N512R12", "N512R34"):
        g = ldpc_graph(name)
        SBD, H, ev, cv, D, Np, mp = _ms_tables(_graph_key(g))
        assert D == g.max_deg and SBD.shape == (D * mp, Np)
        for c in (0, g.m // 2, g.m - 1):
            for j in range(D):
                row = SBD[j * mp + c]
                if g.check_mask[c, j]:
                    assert row.sum() == 1.0 and row[g.check_bits[c, j]] == 1.0
                    assert ev[0, j * mp + c] == 1.0
                else:
                    assert not row.any() and ev[0, j * mp + c] == 0.0
        H2 = _bp_tables(_graph_key(g))[2]
        assert np.array_equal(H, H2)


def test_bp_pallas_stall_iters_param():
    """ADVICE r2: stall_iters is caller-tunable; max_iter disables stalling
    without changing decodable-case results."""
    from orion_sdr_tpu.fec.ldpc import _graph_key
    from orion_sdr_tpu.ops.ldpc_bp import bp_decode_pallas
    g, msg, llr = _bp_case("N512R12", 6, 2, 13)
    for rule in ("sum_product", "min_sum"):
        best, mu = bp_decode_pallas(_graph_key(g), llr, 30, interpret=True,
                                    rule=rule, stall_iters=30)
        assert int(np.asarray(mu).sum()) == 0
        assert np.array_equal(np.asarray(best)[:, :g.k].astype(np.uint8),
                              msg)
