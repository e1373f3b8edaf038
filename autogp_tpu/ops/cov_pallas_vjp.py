"""Backward (VJP) kernel for the fused covariance assembly.

Given the cotangent Kbar of the assembled covariance matrix, accumulates
gradients w.r.t. the transformed node parameters [M,3] and the noise
scalar. Per tile: a forward sweep stores every active node's value block
in VMEM, then a reverse post-order sweep propagates adjoints down the tree
with real scalar branching (reverse post-order visits parents before
children). Per-tile gradient scalars are written to SMEM outputs shaped
[n_tiles, M*3] and reduced outside the kernel.

Derivative formulas correspond to GP.jl:135-517.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autogp_tpu import config as C
from autogp_tpu import gp_math
from autogp_tpu.ops import cov_pallas

# lml_tape_fused backward backend: False = K^-1 via the kinv kernel
# (measured faster at [64,1024,1024]; see bwd() comment), True = in-tape
# K^-1 tiles off L^-1 column strips. Trace-time flag (A/B harness:
# scripts/bench_grad_ab.py).
INTAPE_LINV = False


def _acc(acc_ref, idx, value):
    """Accumulate a tile expression into the VMEM gradient accumulator.

    Full [T,T]->scalar reductions stall the VPU pipeline (~10 per tile
    made the backward kernel reduction-bound); instead accumulate the
    cheap sublane row-sum [T,T]->[1,T] and reduce to scalars once per
    particle at the last tile."""
    acc_ref[idx, :] = acc_ref[idx, :] + jnp.sum(value, axis=0)


class _Par:
    """Adapter: par[s, k] -> ref[0, s, k] for the shared forward sweep."""

    def __init__(self, ref):
        self.ref = ref

    def __getitem__(self, idx):
        return self.ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))]


def _fwd_values(nt_ref, par, t1, t2, val_ref, depth_cap: int):
    """Forward sweep storing each active slot's value block in val_ref[s]."""
    dt = t1 - t2
    adt = jnp.abs(dt)
    M = (1 << depth_cap) - 1
    for s in gp_math.postorder(depth_cap):
        t = nt_ref[0, s]
        l, r = 2 * s + 1, 2 * s + 2

        @pl.when(t == C.CONSTANT)
        def _():
            val_ref[s] = par[s, 0] + jnp.zeros_like(dt)

        @pl.when(t == C.WHITE_NOISE)
        def _():
            val_ref[s] = jnp.where(dt == 0, par[s, 0], 0.0)

        @pl.when(t == C.LINEAR)
        def _():
            c = par[s, 0]
            val_ref[s] = par[s, 1] + par[s, 2] * ((t1 - c) * (t2 - c))

        @pl.when(t == C.SQUARED_EXPONENTIAL)
        def _():
            l_ = par[s, 0]
            val_ref[s] = par[s, 1] * jnp.exp((-0.5 / (l_ * l_)) * (dt * dt))

        @pl.when(t == C.GAMMA_EXPONENTIAL)
        def _():
            l_ = par[s, 0]
            g = par[s, 1]
            safe = jnp.maximum(jnp.where(adt == 0, 1.0, adt / l_), 1e-30)
            powg = jnp.where(adt == 0, 0.0, jnp.exp(g * jnp.log(safe)))
            val_ref[s] = par[s, 2] * jnp.exp(-powg)

        @pl.when(t == C.PERIODIC)
        def _():
            l_ = par[s, 0]
            freq = math.pi / par[s, 1]
            sn = jnp.sin(freq * adt)
            val_ref[s] = par[s, 2] * jnp.exp((-2.0 / (l_ * l_)) * sn * sn)

        if l < M:
            @pl.when(t == C.PLUS)
            def _():
                val_ref[s] = val_ref[l] + val_ref[r]

            @pl.when(t == C.TIMES)
            def _():
                val_ref[s] = val_ref[l] * val_ref[r]

            @pl.when(t == C.CHANGEPOINT)
            def _():
                loc = par[s, 0]
                inv = 2.0 / C.CHANGEPOINT_SCALE
                s1 = jax.nn.sigmoid((loc - t1) * inv)
                s2 = jax.nn.sigmoid((loc - t2) * inv)
                val_ref[s] = (s1 * val_ref[l] * s2
                              + (1.0 - s1) * val_ref[r] * (1.0 - s2))


def _bwd_kernel(nt_ref, par_ref, tsc_ref, tsr_ref, mkc_ref, mkr_ref,
                kbar_ref, pbar_ref, val_ref, adj_ref, acc_ref, *,
                depth_cap: int, tile_i: int, tile_j: int, masked: bool,
                single_j: bool):
    # Row inputs (ts/mask) are passed un-blocked so tile_j can be < 128
    # (a (1, tile) block is only legal when tile is a multiple of 128).
    j_off = pl.program_id(1) * tile_j
    t1 = tsc_ref[:, 0:1]
    t2 = cov_pallas.row_slice(tsr_ref, j_off, tile_j, single_j)
    dt = t1 - t2
    adt = jnp.abs(dt)
    M = (1 << depth_cap) - 1

    _fwd_values(nt_ref, _Par(par_ref), t1, t2, val_ref, depth_cap)

    kbar = kbar_ref[:, :]
    if masked:
        m2 = mkc_ref[:, 0:1] * cov_pallas.row_slice(mkr_ref, j_off, tile_j, single_j)
        kbar = kbar * m2

    i = pl.program_id(0)
    j = pl.program_id(1)
    row = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
           + i * tile_i)
    col = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
           + j * tile_j)
    diag = (row == col).astype(kbar.dtype)

    # The TPU grid is sequential, so SMEM scratch accumulates across the
    # (i, j) tiles of one particle; under vmap the particle axis is the
    # outermost grid dim, and the (0,0) tile resets the accumulators.
    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:, :] = jnp.zeros(acc_ref.shape, kbar.dtype)

    _acc(acc_ref, acc_ref.shape[0] - 1, kbar * diag)

    adj_ref[0] = kbar

    for s in reversed(gp_math.postorder(depth_cap)):
        t = nt_ref[0, s]
        l, r = 2 * s + 1, 2 * s + 2

        if l < M:
            @pl.when(t == C.PLUS)
            def _():
                adj_ref[l] = adj_ref[s]
                adj_ref[r] = adj_ref[s]

            @pl.when(t == C.TIMES)
            def _():
                adj_ref[l] = adj_ref[s] * val_ref[r]
                adj_ref[r] = adj_ref[s] * val_ref[l]

            @pl.when(t == C.CHANGEPOINT)
            def _():
                loc = par_ref[0, s, 0]
                inv = 2.0 / C.CHANGEPOINT_SCALE
                s1 = jax.nn.sigmoid((loc - t1) * inv)
                s2 = jax.nn.sigmoid((loc - t2) * inv)
                a = adj_ref[s]
                ds1 = s1 * (1.0 - s1) * inv
                ds2 = s2 * (1.0 - s2) * inv
                dloc = (ds1 * (s2 * val_ref[l] - (1.0 - s2) * val_ref[r])
                        + ds2 * (s1 * val_ref[l] - (1.0 - s1) * val_ref[r]))
                _acc(acc_ref, s * C.MAX_PARAMS, (a * dloc))
                adj_ref[l] = a * s1 * s2
                adj_ref[r] = a * (1.0 - s1) * (1.0 - s2)

        @pl.when(t == C.CONSTANT)
        def _():
            _acc(acc_ref, s * C.MAX_PARAMS, (adj_ref[s]))

        @pl.when(t == C.WHITE_NOISE)
        def _():
            _acc(acc_ref, s * C.MAX_PARAMS, (
                adj_ref[s] * jnp.where(dt == 0, 1.0, 0.0)))

        @pl.when(t == C.LINEAR)
        def _():
            c = par_ref[0, s, 0]
            a_ = par_ref[0, s, 2]
            adj = adj_ref[s]
            _acc(acc_ref, s * C.MAX_PARAMS, (
                adj * (-a_) * (t1 + t2 - 2.0 * c)))
            _acc(acc_ref, s * C.MAX_PARAMS + 1, (adj))
            _acc(acc_ref, s * C.MAX_PARAMS + 2, (
                adj * (t1 - c) * (t2 - c)))

        # Leaf gradients reuse the stored forward value: for the
        # exponential-family leaves val = amp * e, so e = val/amp avoids
        # recomputing the transcendental (the dominant backward cost).
        @pl.when(t == C.SQUARED_EXPONENTIAL)
        def _():
            l_ = par_ref[0, s, 0]
            amp = par_ref[0, s, 1]
            val = val_ref[s]
            adj = adj_ref[s]
            _acc(acc_ref, s * C.MAX_PARAMS, (
                adj * val * (dt * dt) / (l_ * l_ * l_)))
            _acc(acc_ref, s * C.MAX_PARAMS + 1, (adj * val / amp))

        @pl.when(t == C.GAMMA_EXPONENTIAL)
        def _():
            l_ = par_ref[0, s, 0]
            g = par_ref[0, s, 1]
            amp = par_ref[0, s, 2]
            val = val_ref[s]
            # u = (|dt|/l)^g == -log(val/amp); one log instead of exp+log.
            e_safe = jnp.maximum(val / amp, 1e-38)
            u = jnp.where(adt == 0, 0.0, -jnp.log(e_safe))
            safe = jnp.maximum(jnp.where(adt == 0, 1.0, adt / l_), 1e-30)
            logs = jnp.where(adt == 0, 0.0, jnp.log(safe))
            adj = adj_ref[s]
            _acc(acc_ref, s * C.MAX_PARAMS, (
                adj * val * g * u / l_))
            _acc(acc_ref, s * C.MAX_PARAMS + 1, (
                adj * val * (-u) * logs))
            _acc(acc_ref, s * C.MAX_PARAMS + 2, (adj * val / amp))

        @pl.when(t == C.PERIODIC)
        def _():
            l_ = par_ref[0, s, 0]
            p_ = par_ref[0, s, 1]
            amp = par_ref[0, s, 2]
            val = val_ref[s]
            # sn^2 = -(l^2/2) * log(val/amp); sn*cs = sin(2 freq adt)/2:
            # one log + one sin instead of sin + cos + exp.
            e_safe = jnp.maximum(val / amp, 1e-38)
            sn2 = (-0.5 * l_ * l_) * jnp.log(e_safe)
            freq = math.pi / p_
            sncs = 0.5 * jnp.sin(2.0 * freq * adt)
            adj = adj_ref[s]
            _acc(acc_ref, s * C.MAX_PARAMS, (
                adj * val * (4.0 * sn2) / (l_ * l_ * l_)))
            _acc(acc_ref, s * C.MAX_PARAMS + 1, (
                adj * val * (4.0 / (l_ * l_)) * sncs
                * (math.pi * adt / (p_ * p_))))
            _acc(acc_ref, s * C.MAX_PARAMS + 2, (adj * val / amp))

    # Emit the accumulated gradients once, at the particle's last tile.
    @pl.when((i == pl.num_programs(0) - 1) & (j == pl.num_programs(1) - 1))
    def _():
        for k in range(acc_ref.shape[0]):
            pbar_ref[0, k] = jnp.sum(acc_ref[k, :])


# ---------------------------------------------------------------------------
# Tape-driven backward kernel (dynamic loop over active instructions only;
# see cov_pallas.build_tape). ~4x fewer predicated regions per tile than
# the per-slot sweep for typical trees.
# ---------------------------------------------------------------------------

def _acc_dyn(acc_ref, idx, value):
    """_acc with a traced accumulator-row index."""
    acc_ref[idx, :] = acc_ref[idx, :] + jnp.sum(value, axis=0)


def _bwd_kernel_tape(tslot_ref, ttype_ref, tlpos_ref, trpos_ref, tlen_ref,
                     par_ref, tsc_ref, tsr_ref, mkc_ref, mkr_ref, kbar_ref,
                     *rest, tile_i: int, tile_j: int, masked: bool,
                     n_acc: int, single_j: bool, fused: bool = False,
                     sym: bool = False, linv: bool = False):
    """`sym=True` (requires a symmetric cotangent, as in lml_tape_fused's
    0.5*g*(beta beta^T - K^-1)): every dK_ij/dtheta is symmetric in
    (i, j) — all leaf formulas are functions of (t1*t2, |t1-t2|) and the
    operators preserve the symmetry (GP.jl:135-517) — so the full-matrix
    gradient sum equals the lower-triangle sum with off-diagonal terms
    doubled. Tiles entirely above the diagonal skip both sweeps
    (~37% of tiles at 128x256/N=1024); diagonal-crossing tiles apply the
    elementwise weight 2*(row>col) + (row==col).

    `linv=True` (requires fused): kbar_ref holds the COLUMN STRIP
    L^-1[:, i-tile] and vb_ref the strip L^-1[:, j-tile]; the K^-1 tile is
    formed right here with one MXU contraction over the full column
    length — exact because L^-1's strict upper triangle is zero
    (kinv_pallas.linv_beta) — so K^-1 never exists in HBM and the kinv
    MXU work overlaps this kernel's VPU tree sweeps."""
    if fused and linv:
        bc_ref, br_ref, g_ref, vb_ref, pbar_ref, val_ref, adj_ref, \
            acc_ref = rest
    elif fused:
        # kbar_ref actually holds K^-1; the cotangent tile
        # Kbar = 0.5*g*(beta beta^T - K^-1) is formed in VMEM here — the
        # [N,N] Kbar array never exists in HBM (one round trip saved).
        bc_ref, br_ref, g_ref, pbar_ref, val_ref, adj_ref, acc_ref = rest
    else:
        pbar_ref, val_ref, adj_ref, acc_ref = rest
    j_off = pl.program_id(1) * tile_j
    t1 = tsc_ref[:, 0:1]
    t2 = cov_pallas.row_slice(tsr_ref, j_off, tile_j, single_j)
    dt = t1 - t2
    adt = jnp.abs(dt)
    A = tlen_ref[0, 0]

    # --- forward sweep: values per tape position -----------------------------
    def fbody(i, _):
        t = ttype_ref[0, i]
        s = tslot_ref[0, i]
        l = tlpos_ref[0, i]
        r = trpos_ref[0, i]

        @pl.when(t == C.CONSTANT)
        def _():
            val_ref[i] = par_ref[0, s, 0] + jnp.zeros_like(dt)

        @pl.when(t == C.WHITE_NOISE)
        def _():
            val_ref[i] = jnp.where(dt == 0, par_ref[0, s, 0], 0.0)

        @pl.when(t == C.LINEAR)
        def _():
            c = par_ref[0, s, 0]
            val_ref[i] = par_ref[0, s, 1] + par_ref[0, s, 2] * (
                (t1 - c) * (t2 - c))

        @pl.when(t == C.SQUARED_EXPONENTIAL)
        def _():
            l_ = par_ref[0, s, 0]
            val_ref[i] = par_ref[0, s, 1] * jnp.exp(
                (-0.5 / (l_ * l_)) * (dt * dt))

        @pl.when(t == C.GAMMA_EXPONENTIAL)
        def _():
            l_ = par_ref[0, s, 0]
            g = par_ref[0, s, 1]
            safe = jnp.maximum(jnp.where(adt == 0, 1.0, adt / l_), 1e-30)
            powg = jnp.where(adt == 0, 0.0, jnp.exp(g * jnp.log(safe)))
            val_ref[i] = par_ref[0, s, 2] * jnp.exp(-powg)

        @pl.when(t == C.PERIODIC)
        def _():
            l_ = par_ref[0, s, 0]
            freq = math.pi / par_ref[0, s, 1]
            sn = jnp.sin(freq * adt)
            val_ref[i] = par_ref[0, s, 2] * jnp.exp(
                (-2.0 / (l_ * l_)) * sn * sn)

        @pl.when(t == C.PLUS)
        def _():
            val_ref[i] = val_ref[l] + val_ref[r]

        @pl.when(t == C.TIMES)
        def _():
            val_ref[i] = val_ref[l] * val_ref[r]

        @pl.when(t == C.CHANGEPOINT)
        def _():
            loc = par_ref[0, s, 0]
            inv = 2.0 / C.CHANGEPOINT_SCALE
            s1 = jax.nn.sigmoid((loc - t1) * inv)
            s2 = jax.nn.sigmoid((loc - t2) * inv)
            val_ref[i] = (s1 * val_ref[l] * s2
                          + (1.0 - s1) * val_ref[r] * (1.0 - s2))

        return 0

    i_t = pl.program_id(0)
    j_t = pl.program_id(1)

    @pl.when((i_t == 0) & (j_t == 0))
    def _():
        acc_ref[:, :] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def work():
        # In linv mode the K^-1 tile's MXU contraction is issued BEFORE
        # the VPU-bound forward value sweep: its result is not consumed
        # until after the sweep, so the scheduler can overlap the MXU
        # passes with the tree evaluation.
        if fused and linv:
            from autogp_tpu.ops import kinv_pallas
            Va = kbar_ref[:, :]                        # [N, tile_i]
            Vb = vb_ref[:, :]                          # [N, tile_j]
            if Va.dtype == jnp.float32:
                kbar = kinv_pallas.dot3(Va, Vb, ((0,), (0,)))
            else:  # f64 interpret tests: keep full-precision passes
                kbar = jax.lax.dot_general(
                    Va, Vb, ((((0,), (0,))), ((), ())),
                    preferred_element_type=Va.dtype,
                    precision=jax.lax.Precision.HIGHEST)

        jax.lax.fori_loop(0, A, fbody, 0)

        if not (fused and linv):
            kbar = kbar_ref[:, :]
        if fused:
            b1 = bc_ref[:, 0:1]
            b2 = cov_pallas.row_slice(br_ref, j_off, tile_j, single_j)
            kbar = (0.5 * g_ref[0, 0]) * (b1 * b2 - kbar)
        if masked:
            m2 = mkc_ref[:, 0:1] * cov_pallas.row_slice(mkr_ref, j_off,
                                                        tile_j, single_j)
            kbar = kbar * m2

        row = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
               + i_t * tile_i)
        col = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
               + j_t * tile_j)
        diag = (row == col).astype(kbar.dtype)
        if sym:
            # lower-triangle sweep: double strictly-lower terms (their
            # mirror tile is skipped), keep the diagonal at weight 1.
            kbar = kbar * (2.0 - (row <= col).astype(kbar.dtype)
                           - (row < col).astype(kbar.dtype))

        _acc(acc_ref, n_acc - 1, kbar * diag)

        adj_ref[A - 1] = kbar
        jax.lax.fori_loop(0, A, bbody, 0)

    # --- reverse sweep: adjoints + gradient accumulation ---------------------
    def bbody(k, _):
        i = A - 1 - k
        t = ttype_ref[0, i]
        s = tslot_ref[0, i]
        l = tlpos_ref[0, i]
        r = trpos_ref[0, i]

        @pl.when(t == C.PLUS)
        def _():
            adj_ref[l] = adj_ref[i]
            adj_ref[r] = adj_ref[i]

        @pl.when(t == C.TIMES)
        def _():
            adj_ref[l] = adj_ref[i] * val_ref[r]
            adj_ref[r] = adj_ref[i] * val_ref[l]

        @pl.when(t == C.CHANGEPOINT)
        def _():
            loc = par_ref[0, s, 0]
            inv = 2.0 / C.CHANGEPOINT_SCALE
            s1 = jax.nn.sigmoid((loc - t1) * inv)
            s2 = jax.nn.sigmoid((loc - t2) * inv)
            a = adj_ref[i]
            ds1 = s1 * (1.0 - s1) * inv
            ds2 = s2 * (1.0 - s2) * inv
            dloc = (ds1 * (s2 * val_ref[l] - (1.0 - s2) * val_ref[r])
                    + ds2 * (s1 * val_ref[l] - (1.0 - s1) * val_ref[r]))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS, (a * dloc))
            adj_ref[l] = a * s1 * s2
            adj_ref[r] = a * (1.0 - s1) * (1.0 - s2)

        @pl.when(t == C.CONSTANT)
        def _():
            _acc_dyn(acc_ref, s * C.MAX_PARAMS, (adj_ref[i]))

        @pl.when(t == C.WHITE_NOISE)
        def _():
            _acc_dyn(acc_ref, s * C.MAX_PARAMS, (
                adj_ref[i] * jnp.where(dt == 0, 1.0, 0.0)))

        @pl.when(t == C.LINEAR)
        def _():
            c = par_ref[0, s, 0]
            a_ = par_ref[0, s, 2]
            adj = adj_ref[i]
            _acc_dyn(acc_ref, s * C.MAX_PARAMS, (
                adj * (-a_) * (t1 + t2 - 2.0 * c)))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS + 1, (adj))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS + 2, (
                adj * (t1 - c) * (t2 - c)))

        @pl.when(t == C.SQUARED_EXPONENTIAL)
        def _():
            l_ = par_ref[0, s, 0]
            amp = par_ref[0, s, 1]
            val = val_ref[i]
            adj = adj_ref[i]
            _acc_dyn(acc_ref, s * C.MAX_PARAMS, (
                adj * val * (dt * dt) / (l_ * l_ * l_)))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS + 1, (adj * val / amp))

        @pl.when(t == C.GAMMA_EXPONENTIAL)
        def _():
            l_ = par_ref[0, s, 0]
            g = par_ref[0, s, 1]
            amp = par_ref[0, s, 2]
            val = val_ref[i]
            e_safe = jnp.maximum(val / amp, 1e-38)
            u = jnp.where(adt == 0, 0.0, -jnp.log(e_safe))
            safe = jnp.maximum(jnp.where(adt == 0, 1.0, adt / l_), 1e-30)
            logs = jnp.where(adt == 0, 0.0, jnp.log(safe))
            adj = adj_ref[i]
            _acc_dyn(acc_ref, s * C.MAX_PARAMS, (
                adj * val * g * u / l_))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS + 1, (
                adj * val * (-u) * logs))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS + 2, (adj * val / amp))

        @pl.when(t == C.PERIODIC)
        def _():
            l_ = par_ref[0, s, 0]
            p_ = par_ref[0, s, 1]
            amp = par_ref[0, s, 2]
            val = val_ref[i]
            e_safe = jnp.maximum(val / amp, 1e-38)
            sn2 = (-0.5 * l_ * l_) * jnp.log(e_safe)
            freq = math.pi / p_
            sncs = 0.5 * jnp.sin(2.0 * freq * adt)
            adj = adj_ref[i]
            _acc_dyn(acc_ref, s * C.MAX_PARAMS, (
                adj * val * (4.0 * sn2) / (l_ * l_ * l_)))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS + 1, (
                adj * val * (4.0 / (l_ * l_)) * sncs
                * (math.pi * adt / (p_ * p_))))
            _acc_dyn(acc_ref, s * C.MAX_PARAMS + 2, (adj * val / amp))

        return 0

    if sym:
        # Tiles entirely above the diagonal contribute nothing: skip both
        # sweeps (the mirror tile below carries their weight).
        @pl.when(j_off < (i_t + 1) * tile_i)
        def _():
            work()
    else:
        work()

    @pl.when((i_t == pl.num_programs(0) - 1)
             & (j_t == pl.num_programs(1) - 1))
    def _():
        for k in range(n_acc):
            pbar_ref[0, k] = jnp.sum(acc_ref[k, :])


def _cov_grads_tape(node_type, params_t, kmat, ts, mask, depth_cap: int,
                    masked: bool, tile: int = None, tile_i: int = None,
                    interpret: bool = False, beta=None, gscale=None,
                    sym: bool = False, linv: bool = False,
                    a_cap: int = None):
    """Tape-driven gradient launch; returns (params_bar [M,3], noise_bar).

    `kmat` is flag-dependent (the three meanings share one input slot):
      - default: the cotangent Kbar itself;
      - `beta`/`gscale` given: K^-1, and the cotangent
        Kbar = 0.5*gscale*(beta beta^T - K^-1) is formed tile-by-tile
        inside the kernel (lml_tape_fused's backward) instead of being
        materialized;
      - `linv=True` (requires beta/gscale AND sym): L^-1 (full [N,N],
        zero strict upper — kinv_pallas.linv_beta) and each K^-1 tile is
        formed in-kernel from two pipelined column strips of it (see
        _bwd_kernel_tape); K^-1 never exists in HBM. The in-tape tile is
        only exercised under the symmetric lower-triangle sweep.

    `sym=True` additionally restricts the sweep to the lower triangle
    with doubled off-diagonal weights (requires a symmetric cotangent;
    see _bwd_kernel_tape) — with lower_only K^-1 the upper-triangle
    blocks are then never read.

    Default tiles 128x256 measured best at N=1024/P=64/M=31 on v5e
    (4.66 ms vs 6.19 for 64x256, 6.41 for 128x128, 6.17 for 32x512):
    the tape kernel tolerates the 8.1MB value/adjoint scratch, and the
    2x-larger tiles halve the per-tile tape-loop overhead."""
    M = node_type.shape[0]
    N = ts.shape[0]
    if tile is None:
        tile = 256 if N % 256 == 0 else cov_pallas._pick_tile(N)
    if tile_i is None:
        tile_i = tile
        while 2 * M * tile_i * tile * 4 > 8.5 * 2 ** 20 and tile_i > 8:
            tile_i //= 2
    dt = params_t.dtype
    nI = N // tile
    nIi = N // tile_i
    n_acc = M * C.MAX_PARAMS + 1
    tslot, ttype, tlpos, trpos, tlen = cov_pallas.build_tape(node_type,
                                                             depth_cap)
    fused = beta is not None
    assert not (linv and not fused)
    assert not linv or sym, "in-tape K^-1 tiles are only exercised under sym"
    # Tape-storage cap: the val/adjoint scratch buffers are sized by the
    # LONGEST tape the launch must handle, not the full heap. A smaller
    # cap frees VMEM for larger tiles (fewer per-tile fixed costs).
    # Callers must guarantee every particle's tape length <= a_cap.
    a_cap = M if a_cap is None else min(a_cap, M)
    kernel = functools.partial(_bwd_kernel_tape, tile_i=tile_i,
                               tile_j=tile, masked=masked, n_acc=n_acc,
                               single_j=(N == tile), fused=fused, sym=sym,
                               linv=linv)
    smem_i = lambda: pl.BlockSpec((1, M), lambda i, j: (0, 0),
                                  memory_space=pltpu.SMEM)
    in_specs = [
        smem_i(), smem_i(), smem_i(), smem_i(),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, M, C.MAX_PARAMS), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        # For sym sweeps, clamp the kmat (K^-1 / L^-1-strip) block index
        # of skipped fully-upper tiles to the row's last valid j: the
        # block index is then unchanged from the previous grid step, so
        # Mosaic skips the re-fetch instead of streaming blocks that are
        # never read.
        pl.BlockSpec((N, tile_i), lambda i, j: (0, i),
                     memory_space=pltpu.VMEM)
        if linv else
        pl.BlockSpec(
            (tile_i, tile),
            (lambda i, j: (i, jnp.minimum(
                j, (i * tile_i + tile_i - 1) // tile)))
            if sym else (lambda i, j: (i, j)),
            memory_space=pltpu.VMEM),
    ]
    inputs = [tslot.reshape(1, M), ttype.reshape(1, M), tlpos.reshape(1, M),
              trpos.reshape(1, M), tlen.astype(jnp.int32).reshape(1, 1),
              params_t[None].astype(dt),
              ts.reshape(N, 1).astype(dt), ts.reshape(1, N).astype(dt),
              mask.reshape(N, 1).astype(dt), mask.reshape(1, N).astype(dt),
              kmat.astype(dt)]
    if fused:
        in_specs += [
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        inputs += [beta.reshape(N, 1).astype(dt),
                   beta.reshape(1, N).astype(dt),
                   jnp.asarray(gscale, dt).reshape(1, 1)]
    if linv:
        # The j-tile strip of L^-1 (the same array as the kmat slot's
        # i-strip); skipped fully-upper tiles clamp j as above.
        in_specs += [pl.BlockSpec(
            (N, tile),
            (lambda i, j: (0, jnp.minimum(
                j, (i * tile_i + tile_i - 1) // tile)))
            if sym else (lambda i, j: (0, j)),
            memory_space=pltpu.VMEM)]
        inputs += [kmat.astype(dt)]
    gout = pl.pallas_call(
        kernel,
        grid=(nIi, nI),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_acc), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_acc), dt),
        scratch_shapes=[
            pltpu.VMEM((a_cap, tile_i, tile), dt),
            pltpu.VMEM((a_cap, tile_i, tile), dt),
            pltpu.VMEM((n_acc, tile), dt),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(*inputs)
    pbar = gout[0, :M * C.MAX_PARAMS].reshape(M, C.MAX_PARAMS)
    return pbar, gout[0, M * C.MAX_PARAMS]


def _cov_grads(node_type, params_t, kbar, ts, mask, depth_cap: int,
               masked: bool, tile: int = None, tile_i: int = None,
               interpret: bool = False):
    """Launch the gradient kernel; returns (params_bar [M,3], noise_bar).

    Tiles are rectangular (tile_i x tile): the lane dimension must be a
    multiple of 128 (or N), while the sublane dimension can shrink to keep
    the two [M, tile_i, tile] value/adjoint buffers small."""
    M = node_type.shape[0]
    N = ts.shape[0]
    if tile is None:
        tile = cov_pallas._pick_tile(N)
    if tile_i is None:
        tile_i = tile
        # Two [M, tile_i, tile] scratch buffers must stay ~2MB total:
        # measured on v5e (N=1024, M=31): tile_i 128 -> 116ms (VMEM
        # pressure), 64 -> 31ms, 32 -> 56ms (per-tile overhead).
        while 2 * M * tile_i * tile * 4 > 2.2 * 2 ** 20 and tile_i > 8:
            tile_i //= 2
    dt = params_t.dtype
    nI = N // tile
    nIi = N // tile_i
    n_acc = M * C.MAX_PARAMS + 1   # param grads + noise grad
    kernel = functools.partial(_bwd_kernel, depth_cap=depth_cap,
                               tile_i=tile_i, tile_j=tile, masked=masked,
                               single_j=(N == tile))
    gout = pl.pallas_call(
        kernel,
        grid=(nIi, nI),
        in_specs=[
            pl.BlockSpec((1, M), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, C.MAX_PARAMS), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_acc), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_acc), dt),
        scratch_shapes=[
            pltpu.VMEM((M, tile_i, tile), dt),
            pltpu.VMEM((M, tile_i, tile), dt),
            pltpu.VMEM((n_acc, tile), dt),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(node_type.astype(jnp.int32).reshape(1, M),
      params_t[None].astype(dt),
      ts.reshape(N, 1).astype(dt), ts.reshape(1, N).astype(dt),
      mask.reshape(N, 1).astype(dt), mask.reshape(1, N).astype(dt),
      kbar.astype(dt))
    pbar = gout[0, :M * C.MAX_PARAMS].reshape(M, C.MAX_PARAMS)
    return pbar, gout[0, M * C.MAX_PARAMS]


def cov_matrix_diff(node_type, params_t, noise, ts, mask, depth_cap: int,
                    masked: bool = True, interpret: bool = False,
                    tape: bool = True):
    """Differentiable fused assembly: forward = cov_pallas.cov_matrix,
    backward = the Pallas gradient kernel. Differentiable in
    (params_t, noise); node_type/ts/mask are treated as constants.
    `tape=True` (default) uses the compacted-instruction-tape kernels
    (dynamic loop over active nodes only); False the per-slot sweep.
    """
    fwd_fn = cov_pallas.cov_matrix_tape if tape else cov_pallas.cov_matrix
    bwd_fn = _cov_grads_tape if tape else _cov_grads

    @jax.custom_vjp
    def f(par, nz):
        return fwd_fn(node_type, par, nz, ts, mask, depth_cap,
                      masked=masked, interpret=interpret)

    def fwd(par, nz):
        return f(par, nz), (par,)

    def bwd(res, kbar):
        (par,) = res
        pbar, nbar = bwd_fn(node_type, par, kbar, ts, mask, depth_cap,
                            masked, interpret=interpret)
        return pbar, nbar

    f.defvjp(fwd, bwd)
    return f(params_t, noise)


# Fast-path tape cap for the symmetric fused backward: val/adjoint
# scratch [cap, 256, 256] x2 fits VMEM at 256x256 tiles (9.96 MB),
# halving the per-tile fixed costs vs the full-heap 128x256 config
# (measured 3.32 -> 2.84 ms at [64,1024,1024], scripts/bench_tape_tiles).
# 99.4% of depth-5 prior draws have tape length <= 15; batches whose MAX
# tape exceeds the cap take the full-heap branch via lax.cond.
TAPE_CAP = 19

_sym_grads_cache = {}


def _tape_grads_sym_fn(depth_cap: int, interpret: bool):
    """custom_vmap: batched symmetric fused tape gradient with tile-shape
    dispatch on the batch's maximum tape length (see TAPE_CAP)."""
    key = (depth_cap, interpret)
    if key in _sym_grads_cache:
        return _sym_grads_cache[key]

    @jax.custom_batching.custom_vmap
    def f(nt, par, kmat, beta, g, ts, mask):
        return _cov_grads_tape(nt, par, kmat, ts, mask, depth_cap,
                               masked=True, interpret=interpret,
                               beta=beta, gscale=g, sym=True)

    @f.def_vmap
    def _rule(axis_size, in_batched, nt, par, kmat, beta, g, ts, mask):
        from autogp_tpu import backend
        bt = [nt, par, kmat, beta, g, ts, mask]
        for i, (a, b) in enumerate(zip(bt, in_batched)):
            if not b:
                bt[i] = jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
        nt, par, kmat, beta, g, ts, mask = bt
        # ts/mask are shared across the batch in every caller; the
        # per-particle kernel wants them unbatched.
        ts0, mask0 = ts[0], mask[0]

        def run(args, tile=None, tile_i=None, a_cap=None):
            nt, par, kmat, beta, g = args

            def one(n, p, kv, b, gg):
                return _cov_grads_tape(n, p, kv, ts0, mask0, depth_cap,
                                       masked=True, interpret=interpret,
                                       beta=b, gscale=gg, sym=True,
                                       tile=tile, tile_i=tile_i,
                                       a_cap=a_cap)
            return jax.vmap(one)(nt, par, kmat, beta, g)

        N = ts0.shape[0]
        M = nt.shape[-1]
        args = (nt, par, kmat, beta, g)
        eligible = (N % 256 == 0 and not interpret
                    and backend.use_pallas() and kmat.ndim == 3)
        if eligible and M <= TAPE_CAP:
            # Small heap (depth cap <= 4): the full-heap scratch already
            # fits beside 256x256 tiles — no dispatch needed.
            return run(args, tile=256, tile_i=256, a_cap=M), (True, True)
        if not eligible:
            return run(args), (True, True)
        tlen = jax.vmap(
            lambda n: cov_pallas.build_tape(n, depth_cap)[4])(nt)
        out = jax.lax.cond(
            jnp.max(tlen) <= TAPE_CAP,
            functools.partial(run, tile=256, tile_i=256, a_cap=TAPE_CAP),
            run,
            args)
        return out, (True, True)

    _sym_grads_cache[key] = f
    return f


def lml_tape_fused(node_type, params_t, noise, ts, xs, mask, depth_cap: int,
                   interpret: bool = False):
    """LML with the assembly and MVN-logpdf VJPs fused into ONE rule.

    Value-identical to cov_matrix_tape + mvn_logpdf_masked_cvjp(pregram)
    (Model.jl:136 semantics), but the backward pass hands (K^-1, beta, g)
    straight to the tape gradient kernel, which forms the cotangent
    Kbar = 0.5*g*(beta beta^T - K^-1) tile-by-tile in VMEM — the [N,N]
    Kbar array never exists in HBM, saving a full write+read round trip
    per gradient (~0.7 ms at [64,1024,1024] f32 on v5e).

    Differentiable in (params_t, noise) only. Requires the blocked-inverse
    path (power-of-two N >= 64); callers gate on gp_math._use_blocked_inv.
    """

    @jax.custom_vjp
    def f(par, nz):
        # lower_only: K feeds only the lower-reading blocked Cholesky —
        # the assembly kernel skips the tree evaluation of every tile
        # above the diagonal.
        K = cov_pallas.cov_matrix_tape(node_type, par, nz, ts, mask,
                                       depth_cap, interpret=interpret,
                                       lower_only=True)
        return gp_math.mvn_logpdf_masked_cvjp(K, xs, mask, True)

    from autogp_tpu import backend
    N = ts.shape[0]
    # Strips-form factor (diag + block-column strips, no [N,N] assembly)
    # whenever the blocked layout applies; the INTAPE_LINV backend still
    # needs the assembled L for its substitution kernel.
    use_strips = (N % 128 == 0 and not INTAPE_LINV)

    def fwd(par, nz):
        # Same fused factor+solve as the primal: the value under grad is
        # bit-identical to model.lml (the wd/strips variants run the
        # identical driver, additionally keeping the per-panel diagonal-
        # block inverses computed anyway for the backward's kinv kernel).
        from autogp_tpu.ops import chol_pallas
        K = cov_pallas.cov_matrix_tape(node_type, par, nz, ts, mask,
                                       depth_cap, interpret=interpret,
                                       lower_only=True)
        if use_strips:
            d, alpha, wd, *strips = chol_pallas.chol_solve_strips_psd(
                K, xs * mask)
            res = (par, alpha, wd, tuple(strips))
        else:
            L, alpha, wd = chol_pallas.chol_solve_wd_psd(K, xs * mask)
            d = gp_math.diag_fast(L)
            res = (par, alpha, wd, L)
        n = jnp.sum(mask)
        logdet = 2.0 * jnp.sum(jnp.log(d) * mask)
        out = -0.5 * (n * gp_math.LOG2PI + logdet + jnp.sum(alpha * alpha))
        return out, res

    def bwd(res, g):
        par, alpha, wd, factor = res
        # Two fused backends (A/B-able via INTAPE_LINV, default chosen by
        # measurement — scripts/bench_grad_ab.py):
        #   False: K^-1 formed lower-only in the VMEM-resident kinv
        #     kernel (ops/kinv_pallas.py, bf16x3 contractions), the tape
        #     kernel streams its tiles. Measured 11.5 ms grad batch
        #     [64,1024,1024] v5e (r4) vs 14.0 ms for the linv mode: the
        #     per-tile strip re-streaming of L^-1 (two [N, tile] strips
        #     per lower tile ~ 20 MB/particle) costs more than the one
        #     4 MB K^-1 HBM round trip it avoids.
        #   True: L^-1 only; each K^-1 tile formed INSIDE the tape
        #     kernel from two column strips (linv=True).
        from autogp_tpu.ops import kinv_pallas
        if INTAPE_LINV:
            V, beta, _ = kinv_pallas.linv_beta(factor, alpha)
            pbar, nbar = _cov_grads_tape(node_type, par, V, ts, mask,
                                         depth_cap, masked=True,
                                         interpret=interpret, beta=beta,
                                         gscale=g, sym=True, linv=True)
        elif use_strips:
            Kinv, beta, _ = kinv_pallas.kinv_beta_strips(alpha, wd,
                                                         *factor)
            pbar, nbar = _tape_grads_sym_fn(depth_cap, interpret)(
                node_type, par, Kinv, beta, jnp.asarray(g), ts, mask)
        else:
            Kinv, beta, _ = kinv_pallas.kinv_beta_wd(factor, alpha, wd)
            pbar, nbar = _tape_grads_sym_fn(depth_cap, interpret)(
                node_type, par, Kinv, beta, jnp.asarray(g), ts, mask)
        return pbar, nbar

    f.defvjp(fwd, bwd)
    return f(params_t, noise)
