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
