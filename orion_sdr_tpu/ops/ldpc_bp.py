"""Pallas TPU LDPC belief-propagation kernel (jnp reference:
fec/ldpc.py::bp_decode; ref behavior: ldpc_codes.rs:357-536).

The XLA BP loop re-reads and re-writes every (B, E) edge tensor from HBM each
iteration (~50 MB of traffic per iteration at B=1024) because a while_loop
cannot keep carries in VMEM across steps. This kernel runs ALL iterations
with the edge messages, bit totals, and best-snapshot resident in VMEM —
HBM sees one read of the LLRs and one write of the result.

Layout per grid step: a tile of ``_B_TILE`` codewords on the sublane axis;
edges (m·max_deg, padded to a lane multiple) on the lane axis. The Tanner
graph structure enters as three constant matrices:

* ``SB (Ep, Np)`` — one-hot edge→bit scatter; its transpose-contraction is
  the bit→edge gather (one dot_general each way, MXU work).
* ``MC (Ep, mp)`` — one-hot edge→check sum; transpose-contraction gathers
  per-check values back to edges.
* ``H (Np, mp)`` — dense parity matrix: the per-iteration syndrome is one
  small bit-domain matmul instead of a gather-to-edges round trip.

The check-node leave-one-out product runs in the log domain so it is pure
lane-wise VPU work plus the two MC contractions: per check,
``Π_{e'≠e} t_{e'} = sign · exp(Σ log|t| − log|t_e|)`` with the sign from a
parity count — no per-check reshapes, which Mosaic's lane tiling cannot do.

All contractions run bf16×bf16→f32 (full MXU rate; f32 matmul is multi-pass
on TPU): the one-hot gathers are single-term so bf16 only rounds the value,
and the sign/syndrome parity counts sum 0/1 integers ≤ max_deg — exact in
bf16. Pairs of contractions over the same operator are sublane-stacked into
one matmul (a/s through MC, total/hard through SB).

Early exit: the fori/while loop carries an "any row unsatisfied" flag per
tile, so a converged tile stops iterating (the host-side two-stage strategy
in fec/ldpc.py composes on top for cross-tile skew). A row whose best
syndrome weight has not improved for ``_STALL_ITERS`` consecutive
iterations stops holding its tile open (uncorrectable rows otherwise pin
the whole tile at max_iter: measured convergence at the operating point is
median 2 / p99 8 iterations, so 12 non-improving iterations means the row
is stuck). Stalled rows keep updating while other rows run — only the
tile's exit time changes, never a converged row's output.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B_TILE = 128
_MAX_EDGES = 4096     # VMEM budget guard for SB/MC constants
_STALL_ITERS = 12.0   # row stops holding the tile open after this many
                      # consecutive non-improving iterations


def _pad_to(x: int, mult: int = 128) -> int:
    return -(-x // mult) * mult


@lru_cache(maxsize=None)
def _bp_tables(graph_key: str):
    """Constant operators + masks for one graph, lane-padded.

    Only mask-true edge slots get one-hot rows — padded slots are all-zero
    in SB and MC (their messages are neutralized by ``edge_valid`` inside
    the kernel), so no dummy-bit column is needed and the bit axis is
    ``pad(n)`` instead of ``pad(n+1)``. H (Np, mp) is the dense parity
    matrix for the bit-domain syndrome matmul (row sums ≤ max_deg — exact
    in bf16)."""
    from ..fec.ldpc import _GRAPH_BY_KEY
    g = _GRAPH_BY_KEY[graph_key]
    E = g.m * g.max_deg
    Ep = _pad_to(E)
    Np = _pad_to(g.n)
    mp = _pad_to(g.m)
    flat_bits = g.check_bits.reshape(-1)
    flat_mask = g.check_mask.reshape(-1)
    SB = np.zeros((Ep, Np), np.float32)
    MC = np.zeros((Ep, mp), np.float32)
    H = np.zeros((Np, mp), np.float32)
    for e in range(E):
        if flat_mask[e]:
            SB[e, flat_bits[e]] = 1.0
            MC[e, e // g.max_deg] = 1.0
            H[flat_bits[e], e // g.max_deg] = 1.0
    edge_valid = np.zeros((1, Ep), np.float32)
    edge_valid[0, :E] = flat_mask.astype(np.float32)
    col_valid = np.zeros((1, Np), np.float32)
    col_valid[0, :g.n] = 1.0
    return SB, MC, H, edge_valid, col_valid, Ep, Np, mp


def _fast_tanh(x):
    x2 = x * x
    a = x * (945.0 + x2 * (105.0 + x2))
    b = 945.0 + x2 * (420.0 + x2 * 15.0)
    return jnp.clip(a / b, -1.0, 1.0)


def _fast_atanh(x):
    x2 = x * x
    a = x * (945.0 + x2 * (-735.0 + x2 * 64.0))
    b = 945.0 + x2 * (-1050.0 + x2 * 225.0)
    return a / b


def _bp_kernel_factory(max_iter: int):
    def kernel(llr_ref, sb_ref, mc_ref, h_ref, ev_ref, cv_ref,
               best_ref, mu_ref, msg_ref):
        SB = sb_ref[:]                        # (Ep, Np) bf16 one-hot
        MC = mc_ref[:]                        # (Ep, mp) bf16 one-hot
        H = h_ref[:]                          # (Np, mp) bf16 parity matrix
        ev = ev_ref[:]                        # (1, Ep)
        cv = cv_ref[:]                        # (1, Np)
        llr = llr_ref[:]                      # (B, Np)
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        # The contractions run with bf16 inputs and f32 accumulation — full
        # MXU rate (f32 matmul is multi-pass on TPU). Exactness survives
        # where it matters: the gather directions are single-term (one-hot
        # row ⇒ output = bf16(x[bit]), a rounding, no accumulation error)
        # and the sign/syndrome counts sum 0/1 values ≤ max_deg, integers
        # that bf16 represents exactly. Log-magnitude sums pick up ~0.4%
        # relative rounding, well inside BP's tolerance (the check-node
        # tanh product is itself a rational approximation).
        def dotT(x, M):
            # contract x's lane axis with M's SECOND axis (gather direction)
            return jax.lax.dot_general(
                x.astype(bf16), M, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)

        def dot(x, M):
            return jax.lax.dot_general(
                x.astype(bf16), M, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        def mod2(x):
            return x - 2.0 * jnp.floor(x * 0.5)

        msg_ref[:] = dotT(llr, SB)
        hard0 = jnp.where((cv > 0) & (llr <= 0.0), 1.0, 0.0)
        counts0 = dot(hard0, H)
        mu0 = jnp.sum(mod2(jnp.round(counts0)), axis=1, keepdims=True)
        best_ref[:] = hard0
        # mu plane: column 0 carries min_unsat (the caller reads [:, 0]);
        # column 1 carries the per-row stall counter (internal only)
        stall_col = jax.lax.broadcasted_iota(
            jnp.int32, mu_ref.shape, 1) == 1
        mu_ref[:] = jnp.where(stall_col, 0.0,
                              jnp.broadcast_to(mu0, mu_ref.shape))

        def body(carry):
            i, _ = carry
            msg = msg_ref[:]
            t = jnp.where(ev > 0, jnp.clip(_fast_tanh(msg * 0.5),
                                           -0.9999999, 0.9999999), 1.0)
            a = jnp.log(jnp.maximum(jnp.abs(t), 1e-12))
            s = jnp.where(t < 0.0, 1.0, 0.0)
            # fuse the log-magnitude and sign-count contractions into one
            # sublane-stacked matmul pair (halves dispatch overhead)
            as_e = dotT(dot(jnp.concatenate([a, s], axis=0), MC), MC)
            A_e = as_e[:a.shape[0]]
            S_e = as_e[a.shape[0]:]
            loo = A_e - a
            sign = 1.0 - 2.0 * mod2(jnp.round(S_e - s))
            prod = sign * jnp.exp(loo)
            ext = jnp.where(ev > 0,
                            2.0 * _fast_atanh(jnp.clip(prod, -0.9999999,
                                                       0.9999999)),
                            0.0)
            total = llr + dot(ext, SB)
            hard = jnp.where((cv > 0) & (total <= 0.0), 1.0, 0.0)
            # syndrome directly in the bit domain — one small (B, Np)×H
            # matmul instead of a gather-to-edges plus edge→check reduction
            counts = dot(hard, H)
            unsat = jnp.sum(mod2(jnp.round(counts)), axis=1, keepdims=True)
            mu_plane = mu_ref[:]
            mu = mu_plane[:, :1]
            since = mu_plane[:, 1:2]
            better = unsat < mu
            best_ref[:] = jnp.where(better, hard, best_ref[:])
            new_mu = jnp.where(better, unsat, mu)
            new_since = jnp.where(better, 0.0, since + 1.0)
            stall_col = jax.lax.broadcasted_iota(
                jnp.int32, mu_plane.shape, 1) == 1
            mu_ref[:] = jnp.where(stall_col, new_since,
                                  jnp.broadcast_to(new_mu, mu_plane.shape))
            msg_ref[:] = dotT(total, SB) - ext
            holding = (new_mu > 0.0) & (new_since < _STALL_ITERS)
            return i + 1, jnp.sum(jnp.where(holding, 1.0, 0.0)) > 0.0

        def cond(carry):
            i, active = carry
            return (i < max_iter) & active

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))

    return kernel


def bp_decode_pallas(graph_key: str, llr, max_iter: int = 50,
                     interpret=None):
    """Sum-product BP on the TPU kernel. ``llr``: (B, N) float32.
    Returns (hard bits (B, N) float32 plane trimmed by caller, min_unsat
    (B,) int32). Caller slices the message bits."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    SB, MC, H, ev, cv, Ep, Np, mp = _bp_tables(graph_key)
    llr = jnp.asarray(llr, jnp.float32)
    B, N = llr.shape
    llr_p = jnp.pad(llr, ((0, 0), (0, Np - N)))
    b_pad = -(-B // _B_TILE) * _B_TILE
    if b_pad != B:
        llr_p = jnp.concatenate(
            [llr_p, jnp.zeros((b_pad - B, Np), jnp.float32)])

    grid = (b_pad // _B_TILE,)
    best, mu = pl.pallas_call(
        _bp_kernel_factory(int(max_iter)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B_TILE, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec((_B_TILE, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B_TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, Np), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((_B_TILE, Ep), jnp.float32)],
        interpret=interpret,
    )(llr_p, jnp.asarray(SB, jnp.bfloat16), jnp.asarray(MC, jnp.bfloat16),
      jnp.asarray(H, jnp.bfloat16), jnp.asarray(ev), jnp.asarray(cv))
    return best[:B], mu[:B, 0].astype(jnp.int32)


def bp_graph_fits(graph_key: str) -> bool:
    from ..fec.ldpc import _GRAPH_BY_KEY
    g = _GRAPH_BY_KEY[graph_key]
    return g.m * g.max_deg <= _MAX_EDGES
