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
    """State-major tables: one-hot predecessor matrices P_z (so
    pm_prev_z = P_z @ pm for (S, B) metrics), per-state branch-sign columns,
    the state pad bias column, and the traceback MSB column.

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
    col = lambda v: np.concatenate(
        [v, np.zeros(s_pad - S)]).astype(np.float32)[:, None]
    s00, s10 = col(sign0[:, 0]), col(sign1[:, 0])
    s01, s11 = col(sign0[:, 1]), col(sign1[:, 1])
    msb = col((np.arange(S) >> top) & 1)
    return K, S, s_pad, p0, p1, pad_bias, s00, s10, s01, s11, msb


def _make_kernel(zero_start: bool):
    """ACS + traceback kernel body. ``zero_start``: pm pinned at state 0 and
    traceback starts at state 0 (zero-tail termination). Otherwise initial
    metrics come in per lane and the traceback starts from each lane's argmax
    state (chunked fixed-lag decode, no termination at chunk boundaries)."""

    def kernel(*refs):
        if zero_start:
            (l0_ref, l1_ref, p0_ref, p1_ref, bias_ref,
             s00_ref, s10_ref, s01_ref, s11_ref, msb_ref,
             bits_ref, dec_ref, pm_ref, oh_ref) = refs
        else:
            (l0_ref, l1_ref, pm0_ref, p0_ref, p1_ref, bias_ref,
             s00_ref, s10_ref, s01_ref, s11_ref, msb_ref,
             bits_ref, dec_ref, pm_ref, oh_ref) = refs
        T = l0_ref.shape[0]
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
            la = l0_ref[pl.ds(t, 1), :]             # (1, B)
            lb = l1_ref[pl.ds(t, 1), :]
            c0 = jnp.dot(p0, pm, preferred_element_type=jnp.float32) \
                + s00_ref[:] * la + s10_ref[:] * lb + bias
            c1 = jnp.dot(p1, pm, preferred_element_type=jnp.float32) \
                + s01_ref[:] * la + s11_ref[:] * lb + bias
            dec_ref[t] = (c1 > c0).astype(jnp.int8)
            new_pm = jnp.maximum(c0, c1)
            # renormalize every step: unbounded metric drift breaks the MXU's
            # f32-via-bf16-passes exactness past a few hundred steps (measured
            # on v5e: correct at 206 steps, corrupt from ~600 without this)
            pm_ref[:] = new_pm - jnp.max(new_pm, axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, T, fwd, 0)

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
            t = T - 1 - i
            oh = oh_ref[:]
            bits_ref[pl.ds(t, 1), :] = jnp.sum(oh * msb, axis=0,
                                               keepdims=True)
            z = jnp.sum(oh * dec_ref[t].astype(jnp.float32), axis=0,
                        keepdims=True)              # (1, B)
            prev_oh = jnp.dot(p0.T, oh * (1.0 - z),
                              preferred_element_type=jnp.float32) \
                + jnp.dot(p1.T, oh * z, preferred_element_type=jnp.float32)
            oh_ref[:] = prev_oh
            return 0

        jax.lax.fori_loop(0, T, bwd, 0)

    return kernel


_kernel_zero_start = _make_kernel(zero_start=True)
_kernel_chunked = _make_kernel(zero_start=False)


def _run_kernel(l0, l1, pm0, code: str, interpret: bool):
    """Shared pallas_call driver. ``l0``/``l1``: (L, T) LLR planes for L
    codeword/chunk lanes; ``pm0``: (L, S) initial metrics or None for the
    zero-start (terminated) trellis. Returns (L, T) decoded bit planes."""
    _, S, s_pad, p0, p1, bias, s00, s10, s01, s11, msb = _kernel_tables(code)
    l0 = jnp.asarray(l0, jnp.float32)
    l1 = jnp.asarray(l1, jnp.float32)
    L, T = l0.shape
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
    args += [jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(bias),
             jnp.asarray(s00), jnp.asarray(s10), jnp.asarray(s01),
             jnp.asarray(s11), jnp.asarray(msb)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8

    bits = pl.pallas_call(
        _kernel_zero_start if pm0 is None else _kernel_chunked,
        grid=(l_pad // _B_LANES,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, _B_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, l_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, s_pad, _B_LANES), jnp.int8),   # decisions
            pltpu.VMEM((s_pad, _B_LANES), jnp.float32),   # pm
            pltpu.VMEM((s_pad, _B_LANES), jnp.float32),   # traceback one-hot
        ],
        interpret=interpret,
    )(*args)
    return bits.T[:L]


def viterbi_chunks_pallas(c0, c1, pm0, code: str, interpret=None):
    """Run the chunked ACS+traceback over pre-chunked LLR lanes.

    ``c0``/``c1``: (L, span) per-step LLR pairs for L = batch·n_chunks lanes;
    ``pm0``: (L, S) initial metrics per lane (unpadded state count). Returns
    (L, span) decoded bit planes (margins included — caller drops them)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
    if n_steps > _max_vmem_steps(s_pad):
        out = _viterbi_jnp(l, info_bits, rate, code)
        return out[0] if squeeze else out

    full = depuncture_llrs(l, info_bits, rate, code)
    bits = _run_kernel(full[..., 0::2], full[..., 1::2], None, code,
                       interpret)
    out = bits[:, :info_bits].astype(jnp.uint8)
    return out[0] if squeeze else out
