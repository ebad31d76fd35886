"""Punctured convolutional codes + soft Viterbi (ref: /root/reference/src/fec/conv.rs).

Mother codes: K5 (G0=0o25, G1=0o23 — also PSK31's code, codec/psk31.rs:45) and
DvbK7 (G0=0o171, G1=0o133, ETSI EN 300 744 §4.3.3). Zero-tail termination,
standard DVB/802.11 puncture matrices for rates 2/3, 3/4, 5/6, 7/8.

TPU design:
* encode — a rate-1/2 convolutional encoder is two binary FIR convolutions
  (XOR-dot of the generator taps over the bit stream): one batched int conv,
  no sequential register.
* puncture/depuncture — precomputed boolean masks (trace-time numpy),
  applied as gathers/scatters.
* Viterbi — ACS as a lax.scan over trellis steps with all 2^(K−1) states
  updated as one vectorized max; decisions recorded per step, then a cheap
  reverse scan traceback. Batch over codewords via leading axes.
Branch metric = LLR correlation Σ(1−2c)·llr, maximized (positive ⇒ bit 0).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..dsp.device import cjit

CONV_CODES = {
    "k5": {"K": 5, "g0": 0b10101, "g1": 0b10011},
    "dvb_k7": {"K": 7, "g0": 0b1111001, "g1": 0b1011011},
}

PUNCTURE = {
    "1/2": ([1], [1]),
    "2/3": ([1, 1], [1, 0]),
    "3/4": ([1, 1, 0], [1, 0, 1]),
    "5/6": ([1, 1, 0, 1, 0], [1, 0, 1, 0, 1]),
    "7/8": ([1, 1, 1, 1, 0, 1, 0], [1, 0, 0, 0, 1, 0, 1]),
}


def tail_bits(code: str) -> int:
    return CONV_CODES[code]["K"] - 1


@lru_cache(maxsize=None)
def _tables(code: str):
    """Trellis tables: generator taps (time order), predecessor/branch arrays."""
    c = CONV_CODES[code]
    K, g0, g1 = c["K"], c["g0"], c["g1"]
    S = 1 << (K - 1)
    top = K - 2
    # taps[j] multiplies b_{t-j}: window bit (K-1-j)
    taps0 = np.array([(g0 >> (K - 1 - j)) & 1 for j in range(K)], np.int32)
    taps1 = np.array([(g1 >> (K - 1 - j)) & 1 for j in range(K)], np.int32)
    # next_state(s, b) = (s >> 1) | (b << top);  predecessors of ns:
    prev = np.zeros((S, 2), np.int32)
    sign0 = np.zeros((S, 2), np.float32)  # (1-2c0) for branch prev→ns
    sign1 = np.zeros((S, 2), np.float32)
    for ns in range(S):
        b = (ns >> top) & 1
        base = (ns & ((S >> 1) - 1)) << 1 if S > 1 else 0
        for z in range(2):
            p = base | z
            prev[ns, z] = p
            window = (b << (K - 1)) | p
            c0 = bin(window & g0).count("1") & 1
            c1 = bin(window & g1).count("1") & 1
            sign0[ns, z] = 1.0 - 2.0 * c0
            sign1[ns, z] = 1.0 - 2.0 * c1
    return K, S, top, taps0, taps1, prev, sign0, sign1


@cjit
def conv_encode(bits, code: str = "k5"):
    """Rate-1/2 mother encode (no tail): interleaved [g0_0, g1_0, g0_1, …].

    Equivalent of codec::conv_encode (K5) / conv_encode_code (ref).
    Implemented as two binary convolutions over the bit stream.
    """
    K, S, top, taps0, taps1, *_ = _tables(code)
    b = jnp.asarray(bits).astype(jnp.int32) & 1
    lead = b.shape[:-1]
    n = b.shape[-1]
    # prepend K-1 zeros (initial register), correlate with taps
    bp = jnp.concatenate([jnp.zeros(lead + (K - 1,), jnp.int32), b], axis=-1)
    # window for step t: bits b_t..b_{t-K+1}; build via stacked slices
    wins = jnp.stack([bp[..., j:j + n] for j in range(K)], axis=-1)  # b_{t-K+1+j}
    # taps ordering: taps[j] multiplies b_{t-j} → align: wins[..., K-1-j] = b_{t-j}
    t0 = jnp.asarray(taps0[::-1].copy())
    t1 = jnp.asarray(taps1[::-1].copy())
    c0 = jnp.sum(wins * t0, axis=-1) & 1
    c1 = jnp.sum(wins * t1, axis=-1) & 1
    out = jnp.stack([c0, c1], axis=-1).reshape(lead + (2 * n,))
    return out.astype(jnp.uint8)


def _puncture_mask(rate: str, n_steps: int) -> np.ndarray:
    """Boolean keep-mask over the interleaved 2·n_steps mother output."""
    g0, g1 = PUNCTURE[rate]
    period = len(g0)
    cols = np.arange(n_steps) % period
    keep = np.empty(2 * n_steps, dtype=bool)
    keep[0::2] = np.asarray(g0, bool)[cols]
    keep[1::2] = np.asarray(g1, bool)[cols]
    return keep


def punctured_coded_len(info_bits: int, rate: str, code: str = "k5") -> int:
    """Deterministic coded length (ref: conv.rs:229-251)."""
    n_steps = info_bits + tail_bits(code)
    return int(_puncture_mask(rate, n_steps).sum())


@cjit
def conv_encode_punctured(info_bits, rate: str = "1/2", code: str = "k5"):
    """Zero-tail + mother encode + puncture (ref: conv.rs:190-201)."""
    b = jnp.asarray(info_bits)
    lead = b.shape[:-1]
    tb = tail_bits(code)
    padded = jnp.concatenate([b, jnp.zeros(lead + (tb,), b.dtype)], axis=-1)
    coded = conv_encode(padded, code)
    if rate == "1/2":
        return coded
    keep = _puncture_mask(rate, padded.shape[-1])
    return coded[..., np.nonzero(keep)[0]]


def depuncture_llrs(coded_llrs, info_bits: int, rate: str, code: str = "k5"):
    """Reinsert LLR-0 erasures at punctured positions → (..., 2·n_steps)."""
    l = jnp.asarray(coded_llrs, dtype=jnp.float32)
    n_steps = info_bits + tail_bits(code)
    if rate == "1/2":
        out = jnp.zeros(l.shape[:-1] + (2 * n_steps,), jnp.float32)
        n = min(l.shape[-1], 2 * n_steps)
        return out.at[..., :n].set(l[..., :n])
    keep_idx = np.nonzero(_puncture_mask(rate, n_steps))[0]
    out = jnp.zeros(l.shape[:-1] + (2 * n_steps,), jnp.float32)
    n = min(l.shape[-1], len(keep_idx))
    return out.at[..., keep_idx[:n]].set(l[..., :n])


@cjit
def viterbi_decode_soft(coded_llrs, info_bits: int, rate: str = "1/2",
                        code: str = "k5"):
    """Soft Viterbi over a zero-tail-terminated punctured stream
    (ref: conv.rs:262-348). Returns (..., info_bits) uint8.

    This is the jnp scan form (arbitrary leading batch axes). Long streams
    should use viterbi_decode_soft_chunked, which dispatches to the Pallas
    whole-trellis-in-VMEM kernel on TPU; for short trellises the scan is
    already MXU/VPU-bound and the kernel shows no advantage (the kernel's
    iota-masked column selects are O(T²), fine at the fixed chunk span but
    not for arbitrary T)."""
    return _viterbi_decode_soft_jnp(jnp.asarray(coded_llrs), info_bits,
                                    rate, code)


def _viterbi_decode_soft_jnp(coded_llrs, info_bits: int, rate: str = "1/2",
                             code: str = "k5"):
    K, S, top, _, _, prev, sign0, sign1 = _tables(code)
    full = depuncture_llrs(coded_llrs, info_bits, rate, code)
    lead = full.shape[:-1]
    n_steps = info_bits + tail_bits(code)
    l0 = full[..., 0::2]  # (..., n_steps)
    l1 = full[..., 1::2]
    prev_j = jnp.asarray(prev)       # (S, 2)
    s0 = jnp.asarray(sign0)
    s1 = jnp.asarray(sign1)
    neg_inf = jnp.float32(-1e30)

    pm0 = jnp.full(lead + (S,), neg_inf).at[..., 0].set(0.0)

    def acs(pm, ls):
        la, lb = ls
        cand = pm[..., prev_j] + s0 * la[..., None, None] + s1 * lb[..., None, None]
        dec = jnp.argmax(cand, axis=-1)          # (..., S)
        new_pm = jnp.max(cand, axis=-1)
        return new_pm, dec.astype(jnp.uint8)

    lt0 = jnp.moveaxis(l0, -1, 0)
    lt1 = jnp.moveaxis(l1, -1, 0)
    _, decs = jax.lax.scan(lambda pm, ls: acs(pm, ls), pm0, (lt0, lt1))
    # decs: (n_steps, ..., S)

    def traceback(state, dec_t):
        bit = (state >> top) & 1
        z = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0].astype(jnp.int32)
        nxt = prev_j[state, z]
        return nxt, bit

    state0 = jnp.zeros(lead, jnp.int32)
    _, bits_rev = jax.lax.scan(traceback, state0, decs[::-1])
    bits = jnp.moveaxis(bits_rev[::-1], 0, -1)
    return bits[..., :info_bits].astype(jnp.uint8)


_CHUNK_STEPS = 1024     # trellis steps per parallel chunk
_CHUNK_OVERLAP = 96     # ≥ 5·(K−1) convergence margin each side


@cjit
def viterbi_decode_soft_chunked(coded_llrs, info_bits: int, rate: str = "1/2",
                                code: str = "dvb_k7"):
    """Overlap-chunked soft Viterbi for LONG streams (the TPU-native form).

    A 90k-step trellis is inherently sequential; chopping it into
    ``_CHUNK_STEPS``-step chunks with ``_CHUNK_OVERLAP`` warm-up/cool-down
    margins turns the decode into ONE batched scan over ~1.2k steps — the
    standard fixed-lag approximation (margin ≫ 5·K ⇒ outputs match the full
    Viterbi except in pathological near-tie cases; the outer RS/CRC
    adjudicates regardless). First chunk pins state 0; others start uniform.
    """
    K, S, top, _, _, prev, sign0, sign1 = _tables(code)
    full = depuncture_llrs(coded_llrs, info_bits, rate, code)
    n_steps = info_bits + tail_bits(code)
    l0 = full[..., 0::2]
    l1 = full[..., 1::2]
    assert l0.ndim in (1, 2), "chunked path takes streams, optionally batched"
    batched = l0.ndim == 2
    if not batched:
        l0, l1 = l0[None], l1[None]
    nb = l0.shape[0]

    C, V = _CHUNK_STEPS, _CHUNK_OVERLAP
    nchunk = -(-n_steps // C)
    total = C * nchunk
    # pad tail with zero LLRs (erasures)
    l0p = jnp.pad(l0, ((0, 0), (V, total - n_steps + V)))
    l1p = jnp.pad(l1, ((0, 0), (V, total - n_steps + V)))
    span = C + 2 * V
    starts = np.arange(nchunk) * C
    idx = starts[:, None] + np.arange(span)[None, :]
    c0 = l0p[:, idx]                    # (nb, nchunk, span)
    c1 = l1p[:, idx]

    if jax.default_backend() == "tpu":
        # hot path: whole-trellis-in-VMEM Pallas kernel over the chunk lanes
        from ..ops.viterbi import viterbi_chunks_pallas
        pm0 = np.zeros((nb, nchunk, S), np.float32)
        pm0[:, 0] = -1e30
        pm0[:, 0, 0] = 0.0              # chunk 0 pinned at state 0
        bits = viterbi_chunks_pallas(c0.reshape(nb * nchunk, span),
                                     c1.reshape(nb * nchunk, span),
                                     pm0.reshape(nb * nchunk, S), code)
        mid = bits.reshape(nb, nchunk, span)[:, :, V:V + C].reshape(nb, -1)
        out = mid[:, :info_bits].astype(jnp.uint8)
        return out if batched else out[0]

    prev_j = jnp.asarray(prev)
    s0 = jnp.asarray(sign0)
    s1 = jnp.asarray(sign1)
    neg_inf = jnp.float32(-1e30)
    # chunk 0 starts pinned at state 0; others uniform
    pm0 = jnp.zeros((nb, nchunk, S), jnp.float32)
    pm0 = pm0.at[:, 0].set(jnp.full((S,), neg_inf).at[0].set(0.0))

    def acs(pm, ls):
        la, lb = ls
        cand = pm[..., prev_j] + s0 * la[..., None, None] + s1 * lb[..., None, None]
        dec = jnp.argmax(cand, axis=-1)
        new_pm = jnp.max(cand, axis=-1)
        new_pm = new_pm - jnp.max(new_pm, axis=-1, keepdims=True)
        return new_pm, dec.astype(jnp.uint8)

    lt0 = jnp.moveaxis(c0, -1, 0)       # (span, nb, nchunk)
    lt1 = jnp.moveaxis(c1, -1, 0)
    pm, decs = jax.lax.scan(acs, pm0, (lt0, lt1))   # decs: (span, nb, nchunk, S)

    def traceback(state, dec_t):
        bit = (state >> top) & 1
        z = jnp.take_along_axis(dec_t, state[..., None], axis=-1)[..., 0].astype(jnp.int32)
        nxt = prev_j[state, z]
        return nxt, bit

    state0 = jnp.argmax(pm, axis=-1).astype(jnp.int32)   # per chunk
    _, bits_rev = jax.lax.scan(traceback, state0, decs[::-1])
    bits = jnp.moveaxis(bits_rev[::-1], 0, -1)           # (nb, nchunk, span)
    mid = bits[:, :, V:V + C].reshape(nb, -1)            # drop the margins
    out = mid[:, :info_bits].astype(jnp.uint8)
    return out if batched else out[0]
