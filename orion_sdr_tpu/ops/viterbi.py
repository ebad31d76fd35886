"""Pallas TPU Viterbi kernel: batched soft ACS + traceback for the punctured
convolutional codes (ref behavior: fec/conv.rs:262-348; jnp reference:
orion_sdr_tpu.fec.conv.viterbi_decode_soft).

Design: path metrics live in VMEM for the whole trellis — one kernel invocation
runs all T ACS steps AND the traceback, so the (T, S) decision tensor never
round-trips to HBM (the jnp scan materializes it per step). States sit on the
lane axis; the predecessor gather is a tiny one-hot matmul (MXU), the ACS
select is pure VPU, and the traceback walks the trellis with one-hot state
algebra (no per-lane dynamic gathers, which TPUs lack).

Batch rides the sublane axis: 32 codewords per kernel instance (grid steps
are sequential on TPU, so batch must widen the tile, not the grid). VMEM
budget: the int8 decision plane is (T, 32, 128) ≈ T·4 KB, so trellises to
~2.5k steps fit; the wrapper falls back to the jnp scan beyond that.
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

_B_TILE = 32   # codewords per kernel instance (sublane axis)
_NEG = -1.0e30
_MAX_VMEM_STEPS = 2500


@lru_cache(maxsize=None)
def _kernel_tables(code: str, s_pad: int):
    """One-hot predecessor matrices Q_z (pm_prev_z = pm @ Q_z), branch-sign
    rows, the lane-pad bias, and the traceback MSB row."""
    K, S, top, _, _, prev, sign0, sign1 = _tables(code)
    q0 = np.zeros((s_pad, s_pad), np.float32)
    q1 = np.zeros((s_pad, s_pad), np.float32)
    for ns in range(S):
        q0[prev[ns, 0], ns] = 1.0
        q1[prev[ns, 1], ns] = 1.0
    pad_bias = np.where(np.arange(s_pad) < S, 0.0, _NEG).astype(np.float32)
    s00 = np.concatenate([sign0[:, 0], np.zeros(s_pad - S)]).astype(np.float32)
    s10 = np.concatenate([sign1[:, 0], np.zeros(s_pad - S)]).astype(np.float32)
    s01 = np.concatenate([sign0[:, 1], np.zeros(s_pad - S)]).astype(np.float32)
    s11 = np.concatenate([sign1[:, 1], np.zeros(s_pad - S)]).astype(np.float32)
    msb = np.concatenate([(np.arange(S) >> top) & 1,
                          np.zeros(s_pad - S)]).astype(np.float32)
    return K, S, q0, q1, pad_bias, s00, s10, s01, s11, msb


def _acs_traceback_kernel(l0_ref, l1_ref, q0_ref, q1_ref, bias_ref,
                          s00_ref, s10_ref, s01_ref, s11_ref, msb_ref,
                          bits_ref, dec_ref, pm_ref, oh_ref, bits_acc):
    T = l0_ref.shape[1]
    q0 = q0_ref[:]
    q1 = q1_ref[:]
    bias = bias_ref[:]                      # (1, S_pad)

    # pm0: state 0 = 0, others -inf (zero-state start, zero-tail termination)
    s_pad = pm_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_B_TILE, s_pad), 1)
    pm_ref[:] = jnp.where(lane == 0, 0.0, _NEG)

    # Mosaic forbids dynamic lane-axis indexing, so column t of the (B, T)
    # LLR planes is selected with an iota mask — O(T) VPU work per step,
    # negligible next to the per-step MXU gathers.
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (_B_TILE, T), 1)
    l0 = l0_ref[:]
    l1 = l1_ref[:]

    def col(x, t):
        return jnp.sum(jnp.where(t_iota == t, x, 0.0), axis=1, keepdims=True)

    def fwd(t, _):
        pm = pm_ref[:]
        la = col(l0, t)                     # (B, 1)
        lb = col(l1, t)
        c0 = jnp.dot(pm, q0, preferred_element_type=jnp.float32) \
            + s00_ref[:] * la + s10_ref[:] * lb + bias
        c1 = jnp.dot(pm, q1, preferred_element_type=jnp.float32) \
            + s01_ref[:] * la + s11_ref[:] * lb + bias
        dec_ref[t] = (c1 > c0).astype(jnp.int8)   # dynamic LEADING index ok
        new_pm = jnp.maximum(c0, c1)
        # renormalize every step: unbounded metric drift breaks the MXU's
        # f32-via-bf16-passes exactness past a few hundred steps (measured
        # on v5e: correct at 206 steps, corrupt from ~600 without this)
        pm_ref[:] = new_pm - jnp.max(new_pm, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, T, fwd, 0)

    # traceback from state 0 with one-hot state algebra
    oh_ref[:] = jnp.where(lane == 0, 1.0, 0.0)
    msb = msb_ref[:]
    bits_acc[:] = jnp.zeros((_B_TILE, T), jnp.float32)

    def bwd(i, _):
        t = T - 1 - i
        oh = oh_ref[:]
        bit = jnp.sum(oh * msb, axis=1, keepdims=True)       # (B, 1)
        bits_acc[:] = bits_acc[:] + bit * (t_iota == t)
        z = jnp.sum(oh * dec_ref[t].astype(jnp.float32), axis=1,
                    keepdims=True)                           # (B, 1)
        prev_oh = jnp.dot(oh * (1.0 - z), q0.T,
                          preferred_element_type=jnp.float32) \
            + jnp.dot(oh * z, q1.T, preferred_element_type=jnp.float32)
        oh_ref[:] = prev_oh
        return 0

    jax.lax.fori_loop(0, T, bwd, 0)
    bits_ref[:] = bits_acc[:]


def _acs_traceback_chunked_kernel(l0_ref, l1_ref, pm0_ref, q0_ref, q1_ref,
                                  bias_ref, s00_ref, s10_ref, s01_ref,
                                  s11_ref, msb_ref, bits_ref, dec_ref, pm_ref,
                                  oh_ref, bits_acc):
    """Chunked variant: rows are chunk-lanes. Differs from the plain kernel
    in three ways — initial metrics come in per row (chunk 0 pinned at state
    0, others uniform), metrics renormalize every step (long chunks), and the
    traceback starts from each row's argmax state (no termination at a chunk
    boundary)."""
    T = l0_ref.shape[1]
    q0 = q0_ref[:]
    q1 = q1_ref[:]
    bias = bias_ref[:]                      # (1, S_pad)

    s_pad = pm_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_B_TILE, s_pad), 1)
    pm_ref[:] = pm0_ref[:] + bias

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (_B_TILE, T), 1)
    l0 = l0_ref[:]
    l1 = l1_ref[:]

    def col(x, t):
        return jnp.sum(jnp.where(t_iota == t, x, 0.0), axis=1, keepdims=True)

    def fwd(t, _):
        pm = pm_ref[:]
        la = col(l0, t)
        lb = col(l1, t)
        c0 = jnp.dot(pm, q0, preferred_element_type=jnp.float32) \
            + s00_ref[:] * la + s10_ref[:] * lb + bias
        c1 = jnp.dot(pm, q1, preferred_element_type=jnp.float32) \
            + s01_ref[:] * la + s11_ref[:] * lb + bias
        dec_ref[t] = (c1 > c0).astype(jnp.int8)
        new_pm = jnp.maximum(c0, c1)
        # renormalize: long chunks, no termination to bound the drift
        new_pm = new_pm - jnp.max(new_pm, axis=1, keepdims=True)
        pm_ref[:] = new_pm
        return 0

    jax.lax.fori_loop(0, T, fwd, 0)

    # traceback from each row's best final state (lowest index on ties,
    # matching jnp.argmax) via pure lane-wise one-hot algebra
    pm = pm_ref[:]
    m = jnp.max(pm, axis=1, keepdims=True)
    lane_f = lane.astype(jnp.float32)
    idx_val = jnp.where(pm == m, lane_f, jnp.float32(1e9))
    mn = jnp.min(idx_val, axis=1, keepdims=True)
    oh_ref[:] = (idx_val == mn).astype(jnp.float32)
    msb = msb_ref[:]
    bits_acc[:] = jnp.zeros((_B_TILE, T), jnp.float32)

    def bwd(i, _):
        t = T - 1 - i
        oh = oh_ref[:]
        bit = jnp.sum(oh * msb, axis=1, keepdims=True)
        bits_acc[:] = bits_acc[:] + bit * (t_iota == t)
        z = jnp.sum(oh * dec_ref[t].astype(jnp.float32), axis=1, keepdims=True)
        prev_oh = jnp.dot(oh * (1.0 - z), q0.T,
                          preferred_element_type=jnp.float32) \
            + jnp.dot(oh * z, q1.T, preferred_element_type=jnp.float32)
        oh_ref[:] = prev_oh
        return 0

    jax.lax.fori_loop(0, T, bwd, 0)
    bits_ref[:] = bits_acc[:]


def viterbi_chunks_pallas(c0, c1, pm0, code: str, interpret=None):
    """Run the chunked ACS+traceback over pre-chunked LLR lanes.

    ``c0``/``c1``: (L, span) per-step LLR pairs for L = batch·n_chunks lanes;
    ``pm0``: (L, S) initial metrics per lane (unpadded state count). Returns
    (L, span) decoded bit planes (margins included — caller drops them)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s_pad = 128
    tabs = _kernel_tables(code, s_pad)
    _, S, q0, q1, bias, s00, s10, s01, s11, msb = tabs
    c0 = jnp.asarray(c0, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    span = c0.shape[1]
    L = c0.shape[0]
    pm0 = jnp.asarray(pm0, jnp.float32)
    pm0 = jnp.pad(pm0, ((0, 0), (0, s_pad - pm0.shape[1])),
                  constant_values=_NEG)
    l_pad = -(-L // _B_TILE) * _B_TILE
    if l_pad != L:
        c0 = jnp.concatenate([c0, jnp.zeros((l_pad - L, span), jnp.float32)])
        c1 = jnp.concatenate([c1, jnp.zeros((l_pad - L, span), jnp.float32)])
        pm0 = jnp.concatenate(
            [pm0, jnp.zeros((l_pad - L, s_pad), jnp.float32)])

    grid = (l_pad // _B_TILE,)
    row = lambda v: jnp.asarray(v)[None, :]
    bits = pl.pallas_call(
        _acs_traceback_chunked_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B_TILE, span), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B_TILE, span), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B_TILE, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((_B_TILE, span), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l_pad, span), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span, _B_TILE, s_pad), jnp.int8),
            pltpu.VMEM((_B_TILE, s_pad), jnp.float32),
            pltpu.VMEM((_B_TILE, s_pad), jnp.float32),
            pltpu.VMEM((_B_TILE, span), jnp.float32),
        ],
        interpret=interpret,
    )(c0, c1, pm0, jnp.asarray(q0), jnp.asarray(q1), row(bias),
      row(s00), row(s10), row(s01), row(s11), row(msb))
    return bits[:L]


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
    if n_steps > _MAX_VMEM_STEPS:
        out = _viterbi_jnp(l, info_bits, rate, code)
        return out[0] if squeeze else out

    K, S, *_ = _kernel_tables(code, 128)
    s_pad = 128
    tabs = _kernel_tables(code, s_pad)
    _, _, q0, q1, bias, s00, s10, s01, s11, msb = tabs

    full = depuncture_llrs(l, info_bits, rate, code)
    l0 = full[..., 0::2]
    l1 = full[..., 1::2]
    B = l0.shape[0]
    b_pad = -(-B // _B_TILE) * _B_TILE
    if b_pad != B:
        pad = jnp.zeros((b_pad - B, n_steps), jnp.float32)
        l0 = jnp.concatenate([l0, pad])
        l1 = jnp.concatenate([l1, pad])

    grid = (b_pad // _B_TILE,)
    row = lambda v: jnp.asarray(v)[None, :]
    bits = pl.pallas_call(
        _acs_traceback_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B_TILE, n_steps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B_TILE, n_steps), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((_B_TILE, n_steps), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, n_steps), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_steps, _B_TILE, s_pad), jnp.int8),     # decisions
            pltpu.VMEM((_B_TILE, s_pad), jnp.float32),           # pm
            pltpu.VMEM((_B_TILE, s_pad), jnp.float32),           # onehot
            pltpu.VMEM((_B_TILE, n_steps), jnp.float32),         # bits acc
        ],
        interpret=interpret,
    )(l0, l1, jnp.asarray(q0), jnp.asarray(q1), row(bias),
      row(s00), row(s10), row(s01), row(s11), row(msb))

    out = bits[:B, :info_bits].astype(jnp.uint8)
    return out[0] if squeeze else out
