"""Pallas TPU Viterbi kernel: batched soft ACS + traceback for the punctured
convolutional codes (ref behavior: fec/conv.rs:262-348; jnp reference:
orion_sdr_tpu.fec.conv.viterbi_decode_soft).

Design: path metrics live in VMEM for the whole trellis — one kernel
invocation runs all T ACS steps AND the traceback, so the decision tensor
never round-trips to HBM. Layout (v2): STATES ride the sublane axis (padded
only to the 32-sublane int8 tile, not to 128 lanes) and the CODEWORD BATCH
rides the lane axis — 128 codewords per kernel instance. The LLR planes are
time-leading (T, B), so each trellis step reads its column with a dynamic
*leading* index (allowed by Mosaic) instead of an O(T) iota mask — the v1
layout's per-step masking made the kernel O(T²) overall and capped batch at
32 sublanes. The predecessor gather is a (S, S) one-hot matmul per branch
(MXU), the ACS select is pure VPU, and the traceback walks the trellis with
one-hot state algebra (no per-lane dynamic gathers, which TPUs lack).

VMEM budget: the int8 decision plane is (T, S_pad, 128) = T·S_pad·128 B
(K=7: 8 KB/step), so ~1.2k-step trellises fit comfortably; the wrapper falls
back to the jnp scan beyond the budget.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fec.conv import (_tables, depuncture_llrs, tail_bits,
                        _viterbi_decode_soft_jnp as _viterbi_jnp)

_B_LANES = 128   # codewords per kernel instance (lane axis)
_NEG = -1.0e30
_VMEM_BUDGET = 13 << 20   # decision plane + LLR/bit planes must fit VMEM


def _max_vmem_steps(s_pad: int) -> int:
    # per trellis step: s_pad·128 B decisions (int8) + 3 f32 (T,128) planes
    return _VMEM_BUDGET // (_B_LANES * (s_pad + 12))


@lru_cache(maxsize=None)
def _kernel_tables(code: str):
    """State-major tables for the RADIX-2 kernel (two trellis steps per
    iteration — same MXU work as radix-1, half the sequential latency
    chain). For composite branch (z1, z2) through intermediate state
    ms = prev(ns, z2), ps = prev(ms, z1):

      c_{z1z2}[ns] = (Q_{z1z2} @ pm)[ns] + a1·l0(t) + b1·l1(t)
                     + a2·l0(t+1) + b2·l1(t+1)

    with Q_{z1z2} = P_{z2}·P_{z1} and sign columns gathered through the
    intermediate state. The two-level max (over z1 at fixed z2, then z2)
    reproduces radix-1's per-step `c1 > c0` tie-breaks exactly.

    States pad to ``s_pad = max(S, 32)`` sublanes (int8 tile floor)."""
    K, S, top, _, _, prev, sign0, sign1 = _tables(code)
    s_pad = max(S, 32)
    p0 = np.zeros((s_pad, s_pad), np.float32)
    p1 = np.zeros((s_pad, s_pad), np.float32)
    for ns in range(S):
        p0[ns, prev[ns, 0]] = 1.0
        p1[ns, prev[ns, 1]] = 1.0
    pad_bias = np.where(np.arange(s_pad) < S, 0.0, _NEG
                        ).astype(np.float32)[:, None]          # (S_pad, 1)

    def col(v):
        return np.concatenate(
            [v, np.zeros(s_pad - S)]).astype(np.float32)[:, None]

    P = [p0, p1]
    q = {}
    a1 = {}
    b1 = {}
    a2 = {}
    b2 = {}
    for z2 in range(2):
        a2[z2] = col(sign0[:, z2])
        b2[z2] = col(sign1[:, z2])
        for z1 in range(2):
            q[(z1, z2)] = (P[z2] @ P[z1]).astype(np.float32)
            # sign of step t's branch at the intermediate state ms=prev(ns,z2)
            a1[(z1, z2)] = col(sign0[prev[:, z2], z1])
            b1[(z1, z2)] = col(sign1[prev[:, z2], z1])
    msb = col((np.arange(S) >> top) & 1)
    return K, S, s_pad, p0, p1, q, a1, b1, a2, b2, pad_bias, msb


def _make_kernel(zero_start: bool):
    """Radix-2 ACS + traceback kernel body. ``zero_start``: pm pinned at
    state 0 and traceback starts at state 0 (zero-tail termination).
    Otherwise initial metrics come in per lane and the traceback starts from
    each lane's argmax state (chunked fixed-lag decode, no termination at
    chunk boundaries). T (trellis steps) must be even."""

    def kernel(*refs):
        if zero_start:
            (l0_ref, l1_ref, p0_ref, p1_ref,
             q00_ref, q10_ref, q01_ref, q11_ref,
             a100_ref, a110_ref, a101_ref, a111_ref,
             b100_ref, b110_ref, b101_ref, b111_ref,
             a20_ref, a21_ref, b20_ref, b21_ref,
             bias_ref, msb_ref,
             bits_ref, dec2_ref, dec1_ref, pm_ref, oh_ref) = refs
        else:
            (l0_ref, l1_ref, pm0_ref, p0_ref, p1_ref,
             q00_ref, q10_ref, q01_ref, q11_ref,
             a100_ref, a110_ref, a101_ref, a111_ref,
             b100_ref, b110_ref, b101_ref, b111_ref,
             a20_ref, a21_ref, b20_ref, b21_ref,
             bias_ref, msb_ref,
             bits_ref, dec2_ref, dec1_ref, pm_ref, oh_ref) = refs
        T = l0_ref.shape[0]
        T2 = T // 2
        p0 = p0_ref[:]
        p1 = p1_ref[:]
        bias = bias_ref[:]                          # (S_pad, 1)
        s_pad = pm_ref.shape[0]
        state = jax.lax.broadcasted_iota(jnp.int32, (s_pad, _B_LANES), 0)

        if zero_start:
            pm_ref[:] = jnp.where(state == 0, 0.0, _NEG)
        else:
            pm_ref[:] = pm0_ref[:] + bias

        def fwd(t, _):
            pm = pm_ref[:]
            la1 = l0_ref[pl.ds(2 * t, 1), :]        # (1, B)
            lb1 = l1_ref[pl.ds(2 * t, 1), :]
            la2 = l0_ref[pl.ds(2 * t + 1, 1), :]
            lb2 = l1_ref[pl.ds(2 * t + 1, 1), :]
            e20 = a20_ref[:] * la2 + b20_ref[:] * lb2 + bias
            e21 = a21_ref[:] * la2 + b21_ref[:] * lb2 + bias
            c00 = jnp.dot(q00_ref[:], pm, preferred_element_type=jnp.float32) \
                + a100_ref[:] * la1 + b100_ref[:] * lb1 + e20
            c10 = jnp.dot(q10_ref[:], pm, preferred_element_type=jnp.float32) \
                + a110_ref[:] * la1 + b110_ref[:] * lb1 + e20
            c01 = jnp.dot(q01_ref[:], pm, preferred_element_type=jnp.float32) \
                + a101_ref[:] * la1 + b101_ref[:] * lb1 + e21
            c11 = jnp.dot(q11_ref[:], pm, preferred_element_type=jnp.float32) \
                + a111_ref[:] * la1 + b111_ref[:] * lb1 + e21
            # two-level max: z1 at fixed z2 first, then z2 — reproduces the
            # radix-1 per-step (c1 > c0) tie-breaks exactly. Selects are
            # float arithmetic (Mosaic can't truncate i8→i1 for bool where).
            d1_0 = (c10 > c00).astype(jnp.float32)
            d1_1 = (c11 > c01).astype(jnp.float32)
            m0 = jnp.maximum(c00, c10)
            m1 = jnp.maximum(c01, c11)
            dec2 = (m1 > m0).astype(jnp.float32)
            z1_sel = d1_0 + dec2 * (d1_1 - d1_0)
            dec2_ref[t] = dec2.astype(jnp.int8)
            dec1_ref[t] = z1_sel.astype(jnp.int8)
            new_pm = jnp.maximum(m0, m1)
            # renormalize every composite step: unbounded metric drift breaks
            # the MXU's f32 exactness past a few hundred steps (measured)
            pm_ref[:] = new_pm - jnp.max(new_pm, axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, T2, fwd, 0)

        if zero_start:
            oh_ref[:] = jnp.where(state == 0, 1.0, 0.0)
        else:
            # per-lane argmax start (lowest index on ties = jnp.argmax)
            pm = pm_ref[:]
            m = jnp.max(pm, axis=0, keepdims=True)
            idx_val = jnp.where(pm == m, state.astype(jnp.float32),
                                jnp.float32(1e9))
            mn = jnp.min(idx_val, axis=0, keepdims=True)
            oh_ref[:] = (idx_val == mn).astype(jnp.float32)

        msb = msb_ref[:]

        def bwd(i, _):
            t = T2 - 1 - i
            oh = oh_ref[:]
            bits_ref[pl.ds(2 * t + 1, 1), :] = jnp.sum(oh * msb, axis=0,
                                                       keepdims=True)
            z2 = jnp.sum(oh * dec2_ref[t].astype(jnp.float32), axis=0,
                         keepdims=True)             # (1, B)
            z1 = jnp.sum(oh * dec1_ref[t].astype(jnp.float32), axis=0,
                         keepdims=True)
            ms_oh = jnp.dot(p0.T, oh * (1.0 - z2),
                            preferred_element_type=jnp.float32) \
                + jnp.dot(p1.T, oh * z2, preferred_element_type=jnp.float32)
            bits_ref[pl.ds(2 * t, 1), :] = jnp.sum(ms_oh * msb, axis=0,
                                                   keepdims=True)
            oh_ref[:] = jnp.dot(p0.T, ms_oh * (1.0 - z1),
                                preferred_element_type=jnp.float32) \
                + jnp.dot(p1.T, ms_oh * z1,
                          preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, T2, bwd, 0)

    return kernel


_kernel_zero_start = _make_kernel(zero_start=True)
_kernel_chunked = _make_kernel(zero_start=False)


def _run_kernel(l0, l1, pm0, code: str, interpret: bool):
    """Shared pallas_call driver. ``l0``/``l1``: (L, T) LLR planes for L
    codeword/chunk lanes (T even); ``pm0``: (L, S) initial metrics or None
    for the zero-start (terminated) trellis. Returns (L, T) bit planes."""
    _, S, s_pad, p0, p1, q, a1, b1, a2, b2, bias, msb = _kernel_tables(code)
    l0 = jnp.asarray(l0, jnp.float32)
    l1 = jnp.asarray(l1, jnp.float32)
    L, T = l0.shape
    assert T % 2 == 0, "radix-2 kernel needs an even trellis length"
    l_pad = -(-L // _B_LANES) * _B_LANES
    if l_pad != L:
        pad = jnp.zeros((l_pad - L, T), jnp.float32)
        l0 = jnp.concatenate([l0, pad])
        l1 = jnp.concatenate([l1, pad])
    # time-leading planes: each trellis step is a dynamic leading-index read
    l0t = l0.T
    l1t = l1.T
    args = [l0t, l1t]
    in_specs = [
        pl.BlockSpec((T, _B_LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, _B_LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    if pm0 is not None:
        pm0 = jnp.asarray(pm0, jnp.float32)
        pm0 = jnp.pad(pm0, ((0, l_pad - L), (0, s_pad - pm0.shape[1])))
        args.append(pm0.T)                           # (S_pad, L_pad)
        in_specs.append(pl.BlockSpec((s_pad, _B_LANES), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
    tables = [p0, p1,
              q[(0, 0)], q[(1, 0)], q[(0, 1)], q[(1, 1)],
              a1[(0, 0)], a1[(1, 0)], a1[(0, 1)], a1[(1, 1)],
              b1[(0, 0)], b1[(1, 0)], b1[(0, 1)], b1[(1, 1)],
              a2[0], a2[1], b2[0], b2[1],
              bias, msb]
    args += [jnp.asarray(t) for t in tables]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tables)

    bits = pl.pallas_call(
        _kernel_zero_start if pm0 is None else _kernel_chunked,
        grid=(l_pad // _B_LANES,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, _B_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, l_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T // 2, s_pad, _B_LANES), jnp.int8),  # z2 decisions
            pltpu.VMEM((T // 2, s_pad, _B_LANES), jnp.int8),  # z1 decisions
            pltpu.VMEM((s_pad, _B_LANES), jnp.float32),   # pm
            pltpu.VMEM((s_pad, _B_LANES), jnp.float32),   # traceback one-hot
        ],
        interpret=interpret,
    )(*args)
    return bits.T[:L]


def _chunks_jnp(c0, c1, pm0, code: str):
    """jnp reference for the chunked decode (argmax-start traceback) —
    the odd-span fallback; mirrors fec.conv.viterbi_decode_soft_chunked's
    per-chunk math exactly."""
    _, S, top, _, _, prev, sign0, sign1 = _tables(code)
    prev_j = jnp.asarray(prev)
    s0 = jnp.asarray(sign0)
    s1 = jnp.asarray(sign1)
    c0 = jnp.asarray(c0, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    pm = jnp.asarray(pm0, jnp.float32)

    def acs(pm, ls):
        la, lb = ls
        cand = pm[..., prev_j] + s0 * la[..., None, None] \
            + s1 * lb[..., None, None]
        dec = jnp.argmax(cand, axis=-1)
        new_pm = jnp.max(cand, axis=-1)
        new_pm = new_pm - jnp.max(new_pm, axis=-1, keepdims=True)
        return new_pm, dec.astype(jnp.uint8)

    pm, decs = jax.lax.scan(acs, pm,
                            (jnp.moveaxis(c0, -1, 0),
                             jnp.moveaxis(c1, -1, 0)))

    def traceback(state, dec_t):
        bit = (state >> top) & 1
        z = jnp.take_along_axis(dec_t, state[..., None],
                                axis=-1)[..., 0].astype(jnp.int32)
        return prev_j[state, z], bit

    state0 = jnp.argmax(pm, axis=-1).astype(jnp.int32)
    _, bits_rev = jax.lax.scan(traceback, state0, decs[::-1])
    return jnp.moveaxis(bits_rev[::-1], 0, -1).astype(jnp.float32)


def viterbi_chunks_pallas(c0, c1, pm0, code: str, interpret=None):
    """Run the chunked ACS+traceback over pre-chunked LLR lanes.

    ``c0``/``c1``: (L, span) per-step LLR pairs for L = batch·n_chunks lanes;
    ``pm0``: (L, S) initial metrics per lane (unpadded state count). Returns
    (L, span) decoded bit planes (margins included — caller drops them).
    Odd spans take the jnp fallback (the radix-2 kernel needs even T)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if np.shape(c0)[-1] % 2:
        return _chunks_jnp(c0, c1, pm0, code)
    return _run_kernel(c0, c1, pm0, code, interpret)


def viterbi_decode_soft_pallas(coded_llrs, info_bits: int, rate: str = "1/2",
                               code: str = "k5", interpret=None):
    """Drop-in for fec.conv.viterbi_decode_soft on (B, n_coded) batches.

    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere.
    Falls back to the jnp scan when the trellis exceeds the VMEM budget.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    l = jnp.asarray(coded_llrs, jnp.float32)
    squeeze = l.ndim == 1
    if squeeze:
        l = l[None, :]
    assert l.ndim == 2, "pallas path takes (B, n_coded)"
    n_steps = info_bits + tail_bits(code)
    s_pad = _kernel_tables(code)[2]
    if n_steps > _max_vmem_steps(s_pad) or n_steps % 2:
        # over the VMEM budget, or odd trellis (radix-2 kernel needs even)
        out = _viterbi_jnp(l, info_bits, rate, code)
        return out[0] if squeeze else out

    full = depuncture_llrs(l, info_bits, rate, code)
    bits = _run_kernel(full[..., 0::2], full[..., 1::2], None, code,
                       interpret)
    out = bits[:, :info_bits].astype(jnp.uint8)
    return out[0] if squeeze else out
