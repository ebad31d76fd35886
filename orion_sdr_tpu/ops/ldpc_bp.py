"""Pallas TPU LDPC belief-propagation kernels (jnp reference:
fec/ldpc.py::bp_decode; ref behavior: ldpc_codes.rs:357-536, decode rules
ldpc_codes.rs:98-105).

The XLA BP loop re-reads and re-writes every (B, E) edge tensor from HBM each
iteration (~50 MB of traffic per iteration at B=1024) because a while_loop
cannot keep carries in VMEM across steps. These kernels run ALL iterations
with the edge messages, bit totals, and best-snapshot resident in VMEM —
HBM sees one read of the LLRs and one write of the result.

Two kernels, one per check-node algebra:

* **sum-product** — edges (m·max_deg, lane-padded) ride the lane axis; the
  Tanner structure enters as constant one-hot matrices ``SB (Ep, Np)``
  (edge→bit scatter / bit→edge gather) and ``MC (Ep, mp)`` (edge→check sum),
  so the leave-one-out product runs in the log domain: per check,
  ``Π_{e'≠e} t_{e'} = sign · exp(Σ log|t| − log|t_e|)`` — two MC
  contractions plus lane-wise VPU transcendentals.
* **min-sum / scaled-min-sum** (the reference's FAST rules,
  ldpc_codes.rs:98-105) — a leave-one-out **min** has no matmul form, so the
  edge layout changes: slab ``j`` of the lane axis holds every check's
  ``j``-th edge (``D`` slabs of ``mp`` lanes). The loo-min is then D-step
  prefix/suffix elementwise mins across slabs (pure VPU, no
  transcendentals), the sign is a ±1 slab product, and the bit↔edge moves
  are ONE block-stacked matmul each way through ``SBD (D·mp, Np)`` whose
  row ``j·mp + c`` is one-hot at check c's j-th bit. Tie-handling matches
  the jnp path's argmin-one-hot min1/min2 rule exactly: for the (first)
  minimum edge the loo-min is the second-smallest, for every other edge it
  is the minimum, including duplicated minima.

Both kernels share the dense ``H (Np, mp)`` parity matrix (per-iteration
syndrome = one small bit-domain matmul) and the best-snapshot / stall
bookkeeping.

All contractions run bf16×bf16→f32 (full MXU rate; f32 matmul is multi-pass
on TPU): the one-hot gathers are single-term so bf16 only rounds the value,
and the sign/syndrome parity counts sum 0/1 integers ≤ max_deg — exact in
bf16. Consequence (documented contract): TPU-kernel decode trajectories
round ~0.4% differently from the f32 XLA path, so near-threshold codewords
may decode differently per backend; on decodable inputs both converge to
the same codeword.

Early exit: the while loop carries an "any row unsatisfied" flag per tile,
so a converged tile stops iterating (the host-side two-stage strategy in
fec/ldpc.py composes on top for cross-tile skew). A row whose best syndrome
weight has not improved for ``stall_iters`` consecutive iterations stops
holding its tile open (uncorrectable rows otherwise pin the whole tile at
max_iter: measured convergence at the operating point is median 2 / p99 8
iterations). Stalled rows keep updating while other rows run — only the
tile's exit time changes, never a converged row's output. Callers running
near threshold with high max_iter can raise ``stall_iters`` (or pass
``max_iter`` to disable stalling) — see bp_decode_pallas.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B_TILE = 128
_MAX_EDGES = 4096     # VMEM budget guard for SB/MC/SBD constants
_STALL_ITERS = 12     # default: row stops holding the tile open after this
                      # many consecutive non-improving iterations
_PAD_LLR = 4.0        # padding rows get a strong all-zeros codeword so they
                      # converge at iteration 0 and never hold a tile open


def _pad_to(x: int, mult: int = 128) -> int:
    return -(-x // mult) * mult


@lru_cache(maxsize=None)
def _bp_tables(graph_key: str):
    """Constant operators + masks for one graph, lane-padded (sum-product
    layout). Only mask-true edge slots get one-hot rows — padded slots are
    all-zero in SB and MC (their messages are neutralized by ``edge_valid``
    inside the kernel), so no dummy-bit column is needed and the bit axis is
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


@lru_cache(maxsize=None)
def _ms_tables(graph_key: str):
    """Slab-layout constants for the min-sum kernel: ``SBD (D·mp, Np)`` —
    row ``j·mp + c`` one-hot at check c's j-th bit (zero when the slot is
    past check c's degree) — plus slab-layout edge validity, the shared
    dense H, and the column-validity mask."""
    from ..fec.ldpc import _GRAPH_BY_KEY
    g = _GRAPH_BY_KEY[graph_key]
    D = g.max_deg
    Np = _pad_to(g.n)
    mp = _pad_to(g.m)
    SBD = np.zeros((D * mp, Np), np.float32)
    H = np.zeros((Np, mp), np.float32)
    ev = np.zeros((1, D * mp), np.float32)
    for c in range(g.m):
        for j in range(D):
            if g.check_mask[c, j]:
                b = g.check_bits[c, j]
                SBD[j * mp + c, b] = 1.0
                H[b, c] = 1.0
                ev[0, j * mp + c] = 1.0
    col_valid = np.zeros((1, Np), np.float32)
    col_valid[0, :g.n] = 1.0
    return SBD, H, ev, col_valid, D, Np, mp


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


def _dots():
    """bf16-input f32-accumulate contraction pair (full MXU rate; see module
    docstring for the exactness argument)."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def dotT(x, M):
        # contract x's lane axis with M's SECOND axis (gather direction)
        return jax.lax.dot_general(
            x.astype(bf16), M, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def dot(x, M):
        return jax.lax.dot_general(
            x.astype(bf16), M, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    return dot, dotT


def _mod2(x):
    return x - 2.0 * jnp.floor(x * 0.5)


def _mu_init(mu_ref, best_ref, hard0, unsat0):
    """Seed the best-snapshot plane and the mu plane. mu plane layout:
    column 0 carries min_unsat (the caller reads [:, 0]); column 1 carries
    the per-row stall counter (internal only)."""
    best_ref[:] = hard0
    stall_col = jax.lax.broadcasted_iota(jnp.int32, mu_ref.shape, 1) == 1
    mu_ref[:] = jnp.where(stall_col, 0.0,
                          jnp.broadcast_to(unsat0, mu_ref.shape))


def _mu_update(mu_ref, best_ref, hard, unsat, stall_iters):
    """Best-snapshot + stall bookkeeping shared by both kernels. Returns
    the tile's 'any row still holding' flag."""
    mu_plane = mu_ref[:]
    mu = mu_plane[:, :1]
    since = mu_plane[:, 1:2]
    better = unsat < mu
    best_ref[:] = jnp.where(better, hard, best_ref[:])
    new_mu = jnp.where(better, unsat, mu)
    new_since = jnp.where(better, 0.0, since + 1.0)
    stall_col = jax.lax.broadcasted_iota(jnp.int32, mu_plane.shape, 1) == 1
    mu_ref[:] = jnp.where(stall_col, new_since,
                          jnp.broadcast_to(new_mu, mu_plane.shape))
    holding = (new_mu > 0.0) & (new_since < float(stall_iters))
    return jnp.sum(jnp.where(holding, 1.0, 0.0)) > 0.0


def _bp_kernel_factory(max_iter: int, stall_iters: int):
    """Sum-product kernel body (edge-on-lane layout)."""
    def kernel(llr_ref, sb_ref, mc_ref, h_ref, ev_ref, cv_ref,
               best_ref, mu_ref, msg_ref):
        SB = sb_ref[:]                        # (Ep, Np) bf16 one-hot
        MC = mc_ref[:]                        # (Ep, mp) bf16 one-hot
        H = h_ref[:]                          # (Np, mp) bf16 parity matrix
        ev = ev_ref[:]                        # (1, Ep)
        cv = cv_ref[:]                        # (1, Np)
        llr = llr_ref[:]                      # (B, Np)
        dot, dotT = _dots()

        msg_ref[:] = dotT(llr, SB)
        hard0 = jnp.where((cv > 0) & (llr <= 0.0), 1.0, 0.0)
        counts0 = dot(hard0, H)
        mu0 = jnp.sum(_mod2(jnp.round(counts0)), axis=1, keepdims=True)
        _mu_init(mu_ref, best_ref, hard0, mu0)

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
            sign = 1.0 - 2.0 * _mod2(jnp.round(S_e - s))
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
            unsat = jnp.sum(_mod2(jnp.round(counts)), axis=1, keepdims=True)
            active = _mu_update(mu_ref, best_ref, hard, unsat, stall_iters)
            msg_ref[:] = dotT(total, SB) - ext
            return i + 1, active

        def cond(carry):
            i, active = carry
            return (i < max_iter) & active

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))

    return kernel


def _ms_kernel_factory(max_iter: int, D: int, mp: int, scale: float,
                       stall_iters: int, rule: str = "min_sum"):
    """Slab-layout kernel body for all three decode rules. ``scale`` is the
    extrinsic scaling (1.0 = plain min-sum, α = scaled min-sum — trace-time
    constants, matching the jnp path in fec/ldpc.py::bp_decode).

    ``rule == 'sum_product'`` swaps the check-node algebra: leave-one-out
    log-magnitude SUM (total − own, no prefix/suffix pass and no MC matmul
    round-trip like the edge-layout kernel needs) with the tanh/atanh
    rational pair — measured ~2× the edge-layout sum-product kernel."""
    _BIG = 1e30

    def kernel(llr_ref, sbd_ref, h_ref, ev_ref, cv_ref,
               best_ref, mu_ref, msg_ref):
        SBD = sbd_ref[:]                      # (D·mp, Np) bf16 one-hot
        H = h_ref[:]                          # (Np, mp) bf16 parity matrix
        ev = ev_ref[:]                        # (1, D·mp)
        cv = cv_ref[:]                        # (1, Np)
        llr = llr_ref[:]                      # (B, Np)
        dot, dotT = _dots()

        msg_ref[:] = dotT(llr, SBD)           # (B, D·mp)
        hard0 = jnp.where((cv > 0) & (llr <= 0.0), 1.0, 0.0)
        counts0 = dot(hard0, H)
        mu0 = jnp.sum(_mod2(jnp.round(counts0)), axis=1, keepdims=True)
        _mu_init(mu_ref, best_ref, hard0, mu0)

        def check_ext_min(msg, valid):
            a_full = jnp.where(valid, jnp.abs(msg), _BIG)
            s_full = jnp.where(valid & (msg < 0.0), -1.0, 1.0)
            a = [a_full[:, j * mp:(j + 1) * mp] for j in range(D)]
            s = [s_full[:, j * mp:(j + 1) * mp] for j in range(D)]
            # leave-one-out min via prefix/suffix slab mins (matches the
            # jnp argmin-one-hot min1/min2 rule exactly, ties included)
            left = [None] * D
            right = [None] * D
            acc = jnp.full_like(a[0], _BIG)
            for j in range(D):
                left[j] = acc
                acc = jnp.minimum(acc, a[j])
            acc = jnp.full_like(a[0], _BIG)
            for j in range(D - 1, -1, -1):
                right[j] = acc
                acc = jnp.minimum(acc, a[j])
            total_s = s[0]
            for j in range(1, D):
                total_s = total_s * s[j]
            ext_slabs = [scale * (total_s * s[j])
                         * jnp.minimum(left[j], right[j]) for j in range(D)]
            return jnp.concatenate(ext_slabs, axis=1)

        def check_ext_sp(msg, valid):
            # invalid slots: t=1 — neutral in the products. Leave-one-out
            # PRODUCT via prefix/suffix slab products — the same shape as
            # the jnp path's _loo_prod (fec/ldpc.py:268) and min-sum's
            # prefix/suffix mins above. (The former log-domain form paid a
            # log AND an exp per edge per iteration for nothing: the
            # product of ≤D−1 tanh values cannot overflow, and underflow
            # to 0 is exactly the extrinsic the log form produced too.)
            t = jnp.where(valid, _fast_tanh(msg * 0.5), 1.0)
            ts = [t[:, j * mp:(j + 1) * mp] for j in range(D)]
            left = [None] * D
            right = [None] * D
            acc = jnp.ones_like(ts[0])
            for j in range(D):
                left[j] = acc
                acc = acc * ts[j]
            acc = jnp.ones_like(ts[0])
            for j in range(D - 1, -1, -1):
                right[j] = acc
                acc = acc * ts[j]
            ext_slabs = [2.0 * _fast_atanh(jnp.clip(
                left[j] * right[j], -0.9999999, 0.9999999))
                for j in range(D)]
            return jnp.concatenate(ext_slabs, axis=1)

        check_ext = check_ext_sp if rule == "sum_product" else check_ext_min

        def body(carry):
            i, _ = carry
            msg = msg_ref[:]
            valid = ev > 0
            ext = jnp.where(valid, check_ext(msg, valid), 0.0)
            total = llr + dot(ext, SBD)
            hard = jnp.where((cv > 0) & (total <= 0.0), 1.0, 0.0)
            counts = dot(hard, H)
            unsat = jnp.sum(_mod2(jnp.round(counts)), axis=1, keepdims=True)
            active = _mu_update(mu_ref, best_ref, hard, unsat, stall_iters)
            msg_ref[:] = dotT(total, SBD) - ext
            return i + 1, active

        def cond(carry):
            i, active = carry
            return (i < max_iter) & active

        jax.lax.while_loop(cond, body, (jnp.int32(0), True))

    return kernel


def bp_decode_pallas(graph_key: str, llr, max_iter: int = 50,
                     interpret=None, *, rule: str = "sum_product",
                     alpha: float = 0.75, stall_iters: int = _STALL_ITERS):
    """BP decode on the TPU kernels. ``llr``: (B, N) float32; ``rule`` in
    {"sum_product", "min_sum", "scaled_min_sum"} selects the kernel (the
    reference's decode-rule set, ldpc_codes.rs:98-105). Returns (hard bits
    (B, N) float32 plane, min_unsat (B,) int32) — caller slices the message
    bits.

    ``stall_iters``: consecutive non-improving iterations before a row
    releases its tile (see module docstring); pass ``max_iter`` to disable
    stalling when running near threshold with a high iteration budget."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    llr = jnp.asarray(llr, jnp.float32)
    B, N = llr.shape
    if rule == "sum_product_edge":
        # edge-on-lane layout kernel (the round-2 design) — kept for
        # regression comparison; the slab kernel measured ~2× faster
        SB, MC, H, ev, cv, Ep, Np, mp = _bp_tables(graph_key)
        consts = (jnp.asarray(SB, jnp.bfloat16), jnp.asarray(MC, jnp.bfloat16),
                  jnp.asarray(H, jnp.bfloat16), jnp.asarray(ev),
                  jnp.asarray(cv))
        kernel = _bp_kernel_factory(int(max_iter), int(stall_iters))
        scratch_lanes = Ep
    elif rule in ("sum_product", "min_sum", "scaled_min_sum"):
        SBD, H, ev, cv, D, Np, mp = _ms_tables(graph_key)
        consts = (jnp.asarray(SBD, jnp.bfloat16),
                  jnp.asarray(H, jnp.bfloat16), jnp.asarray(ev),
                  jnp.asarray(cv))
        scale = float(alpha) if rule == "scaled_min_sum" else 1.0
        kernel = _ms_kernel_factory(int(max_iter), D, mp, scale,
                                    int(stall_iters), rule)
        scratch_lanes = D * mp
    else:
        raise ValueError(f"unknown BP rule {rule!r}")

    llr_p = jnp.pad(llr, ((0, 0), (0, Np - N)),
                    constant_values=_PAD_LLR)
    b_pad = -(-B // _B_TILE) * _B_TILE
    if b_pad != B:
        # padding rows decode the all-zeros codeword instantly
        llr_p = jnp.concatenate(
            [llr_p, jnp.full((b_pad - B, Np), _PAD_LLR, jnp.float32)])

    grid = (b_pad // _B_TILE,)
    best, mu = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B_TILE, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(consts),
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
        scratch_shapes=[pltpu.VMEM((_B_TILE, scratch_lanes), jnp.float32)],
        interpret=interpret,
    )(llr_p, *consts)
    return best[:B], mu[:B, 0].astype(jnp.int32)


def bp_graph_fits(graph_key: str) -> bool:
    from ..fec.ldpc import _GRAPH_BY_KEY
    g = _GRAPH_BY_KEY[graph_key]
    return g.m * g.max_deg <= _MAX_EDGES
