"""Fused covariance-matrix assembly as a Pallas TPU kernel.

The XLA path (gp_math.eval_cov) evaluates every leaf formula at every heap
slot under vmap (lax select-all-branches), costing ~10-30 elementwise N^2
passes per slot. Here node types and parameters live in SMEM, so the
kernel takes REAL scalar branches per slot: inactive slots cost nothing,
and each active node costs exactly one tile-level formula or combine.
The whole tree evaluation runs on a post-order value stack in VMEM with a
dynamic stack pointer in SMEM.

Layout: grid (P, N/TI, N/TJ); each program assembles one [TI, TJ] tile of
one particle's covariance matrix, reading the time tiles from VMEM and the
tree (int8-scale metadata) from SMEM.

Formulas mirror GP.jl:135-517 (see autogp_tpu/gp_math.py).
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


def row_slice(ref, jo, tile_j: int, single_j: bool):
    """Lane-slice [0:1, jo:jo+tile_j] of a (1, N) row ref.

    Mosaic requires dynamic lane starts to be provably 128-aligned; for
    tile_j < 128 it cannot prove program_id * tile_j is, and compilation
    fails on real TPU. Every bucket below 128 has exactly ONE j-tile
    (buckets are powers of two), so the static full slice covers it.
    """
    if single_j:
        return ref[0:1, 0:tile_j]
    return ref[0:1, pl.ds(jo, tile_j)]


def _tree_eval_tile(nt_ref, par_ref, t1, t2, stack_ref, sp_ref,
                    depth_cap: int):
    """Evaluate the encoded tree on a [TI, TJ] tile via the post-order
    stack. nt_ref/par_ref are SMEM refs ([1,M], [1,M,3]); t1 [TI,1], t2 [1,TJ].
    Leaves the result in stack_ref[0]."""
    dt = t1 - t2
    adt = jnp.abs(dt)

    sp_ref[0] = 0

    for s in gp_math.postorder(depth_cap):
        t = nt_ref[0, s]

        # --- leaves: push one tile ---------------------------------------
        @pl.when(t == C.CONSTANT)
        def _():
            sp = sp_ref[0]
            stack_ref[sp] = par_ref[0, s, 0] + jnp.zeros_like(dt)
            sp_ref[0] = sp + 1

        @pl.when(t == C.WHITE_NOISE)
        def _():
            sp = sp_ref[0]
            stack_ref[sp] = jnp.where(dt == 0, par_ref[0, s, 0], 0.0)
            sp_ref[0] = sp + 1

        @pl.when(t == C.LINEAR)
        def _():
            sp = sp_ref[0]
            c = par_ref[0, s, 0]
            stack_ref[sp] = par_ref[0, s, 1] + par_ref[0, s, 2] * (
                (t1 - c) * (t2 - c))
            sp_ref[0] = sp + 1

        @pl.when(t == C.SQUARED_EXPONENTIAL)
        def _():
            sp = sp_ref[0]
            l = par_ref[0, s, 0]
            stack_ref[sp] = par_ref[0, s, 1] * jnp.exp(
                (-0.5 / (l * l)) * (dt * dt))
            sp_ref[0] = sp + 1

        @pl.when(t == C.GAMMA_EXPONENTIAL)
        def _():
            sp = sp_ref[0]
            l = par_ref[0, s, 0]
            g = par_ref[0, s, 1]
            safe = jnp.maximum(jnp.where(adt == 0, 1.0, adt / l), 1e-30)
            powg = jnp.where(adt == 0, 0.0,
                             jnp.exp(g * jnp.log(safe)))
            stack_ref[sp] = par_ref[0, s, 2] * jnp.exp(-powg)
            sp_ref[0] = sp + 1

        @pl.when(t == C.PERIODIC)
        def _():
            sp = sp_ref[0]
            l = par_ref[0, s, 0]
            freq = math.pi / par_ref[0, s, 1]
            sn = jnp.sin(freq * adt)
            stack_ref[sp] = par_ref[0, s, 2] * jnp.exp(
                (-2.0 / (l * l)) * sn * sn)
            sp_ref[0] = sp + 1

        # --- operators: pop two, push one --------------------------------
        @pl.when(t == C.PLUS)
        def _():
            sp = sp_ref[0]
            stack_ref[sp - 2] = stack_ref[sp - 2] + stack_ref[sp - 1]
            sp_ref[0] = sp - 1

        @pl.when(t == C.TIMES)
        def _():
            sp = sp_ref[0]
            stack_ref[sp - 2] = stack_ref[sp - 2] * stack_ref[sp - 1]
            sp_ref[0] = sp - 1

        @pl.when(t == C.CHANGEPOINT)
        def _():
            sp = sp_ref[0]
            loc = par_ref[0, s, 0]
            inv = 2.0 / C.CHANGEPOINT_SCALE
            s1 = jax.nn.sigmoid((loc - t1) * inv)
            s2 = jax.nn.sigmoid((loc - t2) * inv)
            left = stack_ref[sp - 2]
            right = stack_ref[sp - 1]
            stack_ref[sp - 2] = (s1 * left * s2
                                 + (1.0 - s1) * right * (1.0 - s2))
            sp_ref[0] = sp - 1


# ---------------------------------------------------------------------------
# Compacted instruction tape
# ---------------------------------------------------------------------------
#
# The per-slot kernels above issue ~9 predicated regions for every one of
# the M = 2^D - 1 heap slots per tile, but typical trees have only ~5-9
# active nodes — the kernels are branch-overhead bound, not math bound.
# The tape variants compact the active slots into a post-order instruction
# list (XLA-side, per particle) and run a *dynamic-length* fori_loop over
# just those instructions inside the kernel.

def build_tape(node_type, depth_cap: int):
    """Post-order instruction tape of the active slots.

    Returns (tape_slot [M] int32, tape_type [M] int32, tape_lpos [M],
    tape_rpos [M], length [] int32). Entries >= length are no-ops
    (type 0). lpos/rpos are the *tape positions* of a slot's children
    (-1 for leaves), used by the backward kernel. vmap/jit friendly.
    """
    M = (1 << depth_cap) - 1
    po = jnp.asarray(np.asarray(gp_math.postorder(depth_cap),
                                dtype=np.int32))
    act = node_type[po] > 0
    pos = jnp.cumsum(act.astype(jnp.int32)) - 1
    length = jnp.sum(act.astype(jnp.int32))
    dest = jnp.where(act, pos, M)
    tape_slot = jnp.zeros((M,), jnp.int32).at[dest].set(po, mode="drop")
    valid = jnp.arange(M, dtype=jnp.int32) < length
    tape_type = jnp.where(valid, node_type[tape_slot].astype(jnp.int32), 0)
    # tape position of each slot (undefined for inactive slots).
    pos_of_slot = jnp.zeros((M,), jnp.int32).at[po].set(pos)
    lslot = np.minimum(2 * np.arange(M) + 1, M - 1)
    rslot = np.minimum(2 * np.arange(M) + 2, M - 1)
    has_child = np.asarray(2 * np.arange(M) + 1 < M)
    lpos_by_slot = jnp.where(jnp.asarray(has_child),
                             pos_of_slot[jnp.asarray(lslot)], -1)
    rpos_by_slot = jnp.where(jnp.asarray(has_child),
                             pos_of_slot[jnp.asarray(rslot)], -1)
    tape_lpos = jnp.where(valid, lpos_by_slot[tape_slot], -1)
    tape_rpos = jnp.where(valid, rpos_by_slot[tape_slot], -1)
    return tape_slot, tape_type, tape_lpos, tape_rpos, length


def _tree_eval_tape(tslot_ref, ttype_ref, tlen_ref, par_ref, t1, t2,
                    stack_ref):
    """Tape-driven tile evaluation: dynamic fori_loop over the active
    instructions only. Leaves push one tile; operators pop two, push one.
    Result lands in stack_ref[0]."""
    dt = t1 - t2
    adt = jnp.abs(dt)

    def body(i, sp):
        t = ttype_ref[0, i]
        s = tslot_ref[0, i]

        @pl.when(t == C.CONSTANT)
        def _():
            stack_ref[sp] = par_ref[0, s, 0] + jnp.zeros_like(dt)

        @pl.when(t == C.WHITE_NOISE)
        def _():
            stack_ref[sp] = jnp.where(dt == 0, par_ref[0, s, 0], 0.0)

        @pl.when(t == C.LINEAR)
        def _():
            c = par_ref[0, s, 0]
            stack_ref[sp] = par_ref[0, s, 1] + par_ref[0, s, 2] * (
                (t1 - c) * (t2 - c))

        @pl.when(t == C.SQUARED_EXPONENTIAL)
        def _():
            l = par_ref[0, s, 0]
            stack_ref[sp] = par_ref[0, s, 1] * jnp.exp(
                (-0.5 / (l * l)) * (dt * dt))

        @pl.when(t == C.GAMMA_EXPONENTIAL)
        def _():
            l = par_ref[0, s, 0]
            g = par_ref[0, s, 1]
            safe = jnp.maximum(jnp.where(adt == 0, 1.0, adt / l), 1e-30)
            powg = jnp.where(adt == 0, 0.0, jnp.exp(g * jnp.log(safe)))
            stack_ref[sp] = par_ref[0, s, 2] * jnp.exp(-powg)

        @pl.when(t == C.PERIODIC)
        def _():
            l = par_ref[0, s, 0]
            freq = math.pi / par_ref[0, s, 1]
            sn = jnp.sin(freq * adt)
            stack_ref[sp] = par_ref[0, s, 2] * jnp.exp(
                (-2.0 / (l * l)) * sn * sn)

        @pl.when(t == C.PLUS)
        def _():
            stack_ref[sp - 2] = stack_ref[sp - 2] + stack_ref[sp - 1]

        @pl.when(t == C.TIMES)
        def _():
            stack_ref[sp - 2] = stack_ref[sp - 2] * stack_ref[sp - 1]

        @pl.when(t == C.CHANGEPOINT)
        def _():
            loc = par_ref[0, s, 0]
            inv = 2.0 / C.CHANGEPOINT_SCALE
            s1 = jax.nn.sigmoid((loc - t1) * inv)
            s2 = jax.nn.sigmoid((loc - t2) * inv)
            left = stack_ref[sp - 2]
            right = stack_ref[sp - 1]
            stack_ref[sp - 2] = (s1 * left * s2
                                 + (1.0 - s1) * right * (1.0 - s2))

        is_op = (t >= C.PLUS) & (t <= C.CHANGEPOINT)
        return sp + jnp.where(is_op, -1, 1)

    jax.lax.fori_loop(0, tlen_ref[0, 0], body, 0)


def _cov_kernel_tape_1p(tslot_ref, ttype_ref, tlen_ref, par_ref, noise_ref,
                        tsc_ref, tsr_ref, mkc_ref, mkr_ref, out_ref,
                        stack_ref, *, tile_i: int, tile_j: int,
                        masked: bool, single_j: bool,
                        lower_only: bool = False):
    """Tape-driven single-particle assembly (grid (I, J); vmap batches).

    `lower_only`: tiles entirely above the diagonal skip the tree
    evaluation and emit zeros — legal whenever the consumer reads only
    the lower triangle (the blocked Cholesky does, chol_pallas.py:19).
    Saves the VPU transcendental work of ~N(N-tile)/2 elements (the
    assembly kernel is compute-bound, not write-bound)."""
    jo = pl.program_id(1) * tile_j
    i = pl.program_id(0)
    j = pl.program_id(1)

    def body():
        t1 = tsc_ref[:, 0:1]
        t2 = row_slice(tsr_ref, jo, tile_j, single_j)
        _tree_eval_tape(tslot_ref, ttype_ref, tlen_ref, par_ref, t1, t2,
                        stack_ref)
        K = stack_ref[0]
        row = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
               + i * tile_i)
        col = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
               + j * tile_j)
        diag = (row == col).astype(K.dtype)
        K = K + noise_ref[0, 0] * diag
        if masked:
            m2 = mkc_ref[:, 0:1] * row_slice(mkr_ref, jo, tile_j, single_j)
            K = jnp.where(m2 > 0, K, diag)
        out_ref[:, :] = K

    if not lower_only:
        body()
    else:
        fully_upper = jo >= (i + 1) * tile_i

        @pl.when(fully_upper)
        def _():
            out_ref[:, :] = jnp.zeros((tile_i, tile_j), out_ref.dtype)

        @pl.when(jnp.logical_not(fully_upper))
        def _():
            body()


def cov_matrix_tape(node_type, params_t, noise, ts, mask, depth_cap: int,
                    masked: bool = True, tile: int = None,
                    interpret: bool = False, lower_only: bool = False):
    """Single-particle fused assembly via the compacted instruction tape.

    `lower_only=True` emits zeros above the diagonal (callers that feed
    the result ONLY to the lower-reading blocked Cholesky)."""
    M = node_type.shape[0]
    N = ts.shape[0]
    if tile is not None:
        ti = tj = tile
    else:
        ti, tj = _pick_tiles(N)
    dt = params_t.dtype
    tslot, ttype, _, _, tlen = build_tape(node_type, depth_cap)
    kernel = functools.partial(_cov_kernel_tape_1p, tile_i=ti, tile_j=tj,
                               masked=masked, single_j=(N == tj),
                               lower_only=lower_only)
    return pl.pallas_call(
        kernel,
        grid=(N // ti, N // tj),
        in_specs=[
            pl.BlockSpec((1, M), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, C.MAX_PARAMS), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, tj), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), dt),
        scratch_shapes=[
            pltpu.VMEM((depth_cap, ti, tj), dt),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=N * N * 12 * depth_cap,
            bytes_accessed=N * N * np.dtype(dt).itemsize,
            transcendentals=N * N * 2 * depth_cap,
        ),
    )(tslot.reshape(1, M), ttype.reshape(1, M),
      tlen.astype(jnp.int32).reshape(1, 1),
      params_t.astype(dt).reshape(1, M, C.MAX_PARAMS),
      jnp.asarray(noise, dt).reshape(1, 1), ts.reshape(N, 1).astype(dt),
      ts.reshape(1, N).astype(dt), mask.reshape(N, 1).astype(dt),
      mask.reshape(1, N).astype(dt))


@functools.partial(
    jax.jit,
    static_argnames=("depth_cap", "masked", "tile", "interpret"))
def cov_matrix_batched(node_type, params_t, noise, ts, mask,
                       depth_cap: int, masked: bool = True,
                       tile: int = None, interpret: bool = False):
    """[P,N,N] covariance matrices for a batch of tensor traces.

    vmap over the single-particle kernel: the batching rule adds the
    particle axis as a leading grid dimension of one fused kernel.
    """
    return jax.vmap(
        lambda nt, pt, nz: cov_matrix(nt, pt, nz, ts, mask, depth_cap,
                                      masked=masked, tile=tile,
                                      interpret=interpret)
    )(node_type, params_t, noise)


# Convenience single-particle wrapper used by tests.
def cov_matrix_single(node_type, params_t, noise, ts, mask,
                      depth_cap: int, masked: bool = True,
                      tile: int = None, interpret: bool = False):
    return cov_matrix(node_type, params_t, noise, ts, mask, depth_cap,
                      masked=masked, tile=tile, interpret=interpret)


def _cov_kernel_1p(nt_ref, par_ref, noise_ref, tsc_ref, tsr_ref, mkc_ref,
                   mkr_ref, out_ref, stack_ref, sp_ref, *, depth_cap: int,
                   tile_i: int, tile_j: int, masked: bool,
                   single_j: bool):
    """Single-particle variant with grid (I, J); batched via vmap (the
    pallas_call batching rule turns the vmapped axis into a grid dim).

    Metadata inputs carry a leading singleton dim — (1,M), (1,M,3),
    (1,1) — so that under vmap the blocks stay equal to the trailing
    array dims (the Mosaic block-shape rule for SMEM operands). The row
    inputs (ts/mask) are passed un-blocked and sliced in-kernel so tile
    shapes are unconstrained by the (1, tile) block rule."""
    jo = pl.program_id(1) * tile_j
    t1 = tsc_ref[:, 0:1]
    t2 = row_slice(tsr_ref, jo, tile_j, single_j)
    _tree_eval_tile(nt_ref, par_ref, t1, t2, stack_ref,
                    sp_ref, depth_cap)
    K = stack_ref[0]
    i = pl.program_id(0)
    j = pl.program_id(1)
    row = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 0)
           + i * tile_i)
    col = (jax.lax.broadcasted_iota(jnp.int32, (tile_i, tile_j), 1)
           + j * tile_j)
    diag = (row == col).astype(K.dtype)
    K = K + noise_ref[0, 0] * diag
    if masked:
        m2 = mkc_ref[:, 0:1] * row_slice(mkr_ref, jo, tile_j, single_j)
        K = jnp.where(m2 > 0, K, diag)
    out_ref[:, :] = K


def _pick_tile(N: int) -> int:
    for t in (128, 64, 32, 16, 8):
        if N % t == 0:
            return t
    raise ValueError(f"N={N} not divisible by a supported tile size")


def _pick_tiles(N: int):
    """(tile_i, tile_j) for the forward kernel. Measured at N=1024 P=64 on
    v5e: 128x256 -> 7.8ms, 128x128 -> 12.2ms, 256x256 -> 48.6ms."""
    ti = _pick_tile(N)
    tj = 256 if N % 256 == 0 else ti
    return ti, tj


def cov_matrix(node_type, params_t, noise, ts, mask, depth_cap: int,
               masked: bool = True, tile: int = None,
               interpret: bool = False):
    """Single-particle fused assembly: K = eval_cov + noise*I (masked).

    vmap-compatible: under jax.vmap the particle axis becomes an extra
    grid dimension of the same kernel.
    """
    import functools as _ft
    M = node_type.shape[0]
    N = ts.shape[0]
    if tile is not None:
        ti = tj = tile
    else:
        ti, tj = _pick_tiles(N)
    dt = params_t.dtype
    kernel = _ft.partial(_cov_kernel_1p, depth_cap=depth_cap, tile_i=ti,
                         tile_j=tj, masked=masked, single_j=(N == tj))
    return pl.pallas_call(
        kernel,
        grid=(N // ti, N // tj),
        in_specs=[
            pl.BlockSpec((1, M), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, M, C.MAX_PARAMS), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, tj), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N), dt),
        scratch_shapes=[
            pltpu.VMEM((depth_cap, ti, tj), dt),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=N * N * 12 * depth_cap,
            bytes_accessed=N * N * np.dtype(dt).itemsize,
            transcendentals=N * N * 2 * depth_cap,
        ),
    )(node_type.astype(jnp.int32).reshape(1, M),
      params_t.astype(dt).reshape(1, M, C.MAX_PARAMS),
      jnp.asarray(noise, dt).reshape(1, 1), ts.reshape(N, 1).astype(dt),
      ts.reshape(1, N).astype(dt), mask.reshape(N, 1).astype(dt),
      mask.reshape(1, N).astype(dt))
