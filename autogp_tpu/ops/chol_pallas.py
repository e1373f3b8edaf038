"""Batched blocked Cholesky factorization for TPU (Pallas + XLA hybrid).

XLA's batched `jnp.linalg.cholesky` runs at ~1.2 TFLOP/s on v5e for the
[P=64, 1024, 1024] SMC workload (sequential panel loop, poor fusion).
This implementation splits the work by its nature:

  - the inherently sequential panel factorization runs in a Pallas kernel
    that batches a chunk of particles in VMEM, with the panel held
    TRANSPOSED ([pp, B, m]: columns in sublanes) so the per-column pivot /
    scale / rank-1 steps are dynamic-sublane operations (dynamic lane
    indexing is not a thing on TPU);
  - the panel is itself blocked (W-wide sub-panels): the scalar recurrence
    only touches a [pp, W, m] strip per step, and sub-panel cross terms
    ride the in-kernel MXU (`dot_general`);
  - the O(N^3) trailing update A22 -= L21 L21^T is a plain XLA batched
    matmul between panel launches (full MXU).

Only the lower triangle of the input is read; the output is lower
triangular. Matrices must be SPD (the GP covariances always are: jitter
>= MODEL_JITTER on the diagonal, masked_gram pads with identity).

Used by gp_math.mvn_logpdf_masked / _cvjp via a `custom_vmap` wrapper so
per-particle call sites keep their `jax.vmap` while the kernel factors
the whole particle batch at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128   # panel width (lane-aligned)
# Sub-panel width of the sequential recurrence. Swept on v5e at
# [64,128,128] diagonal panels: 8 -> 0.19 ms, 16 -> 0.24, 32 -> 0.22,
# 64 -> 0.37 (full N=1024 chol: 4.98 / 5.09 / 5.49 / 6.26 ms) — narrow
# strips win because the per-column rank-1 update touches [pp, W, B]
# and the cross-term MXU dots amortize the extra sub-panel count.
SUBW = 8


def _panel_kernel(in_ref, hbm_out_ref, out_ref, sem_in, sem_out, *,
                  B: int, W: int, m: int, pp: int):
    """Factor a [pp, B, m] TRANSPOSED panel in place (columns = sublanes).

    Column c's diagonal element sits at lane c (the panel starts at the
    diagonal block). After this kernel, rows 0..B-1 of out_ref hold the
    factored panel columns; lanes < c of column c are zeroed.

    Both HBM endpoints stay un-blocked (ANY) with manual DMA through ONE
    VMEM scratch: VMEM-blocked in/out would be pipeline-double-buffered
    (4 windows) and overflow VMEM. A single resident window lets pp=16
    particles share each sequential column recurrence (the per-step
    loop latency, not bandwidth, dominates this kernel).
    """
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(in_ref.at[pl.ds(i * pp, pp)], out_ref,
                                sem_in)
    dma.start()
    dma.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
    laneB = jax.lax.broadcasted_iota(jnp.int32, (1, 1, B), 2)
    SB = B // W

    for sb in range(SB):
        off = sb * W

        if sb > 0:
            # left-looking cross-term update: pull in all previously
            # factored sub-panels with ONE K=off MXU dot.
            # X[:, i, r] -= sum_{j<off} L[i, j] L[r, j], i in [off, off+W).
            Lprev = out_ref[:, 0:off, :]                      # [pp,off,m]
            T = Lprev[:, :, off:off + W]                      # [pp,off,W]
            upd = jax.lax.dot_general(
                T, Lprev, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=Lprev.dtype,
                precision=jax.lax.Precision.HIGHEST)
            out_ref[:, off:off + W, :] = \
                out_ref[:, off:off + W, :] - upd

        # Static Python unroll (W is a compile-time constant): every slice
        # below is static, eliminating the fori_loop's per-iteration
        # dynamic-slice/branch overhead on the latency-bound recurrence.
        for j in range(W):
            gj = off + j
            col = out_ref[:, gj:gj + 1, :]                    # [pp,1,m]
            # the diagonal element sits in the first B lanes; reduce there.
            pivot = jnp.sum(jnp.where(laneB == gj, col[:, :, :B], 0.0),
                            axis=2, keepdims=True)            # [pp,1,1]
            col = jnp.where(lane >= gj, col / jnp.sqrt(pivot), 0.0)
            out_ref[:, gj:gj + 1, :] = col
            # rank-1 update of the remaining columns in this sub-panel:
            # X[:, i, :] -= L[i, gj] * col  for i in (gj, off+W).
            # (a rank-2 variant with a K=2 MXU dot measured 1.8x SLOWER —
            # tiny-contraction dots are latency-bound on the MXU.)
            if j + 1 < W:
                cS = jnp.swapaxes(col[:, :, gj + 1:off + W], 1, 2)
                blk = out_ref[:, gj + 1:off + W, :]           # [pp,W-j-1,m]
                out_ref[:, gj + 1:off + W, :] = blk - cS * col

    dma_out = pltpu.make_async_copy(out_ref,
                                    hbm_out_ref.at[pl.ds(i * pp, pp)],
                                    sem_out)
    dma_out.start()
    dma_out.wait()


def _pick_pp(P: int, B: int, m: int, budget_bytes=4 * 2 ** 20 + 2 ** 19
             ) -> int:
    """Particles per program: ONE resident [pp, B, m] scratch window plus
    ~its size again of in-kernel temporaries.

    Must return a divisor of P: the launch uses grid=(P // pp,), so a
    non-divisor would silently leave the trailing P mod pp particles'
    output rows uninitialized (garbage factors, wrong LMLs)."""
    pp = P
    while pp > 1 and pp * B * m * 4 > budget_bytes:
        pp //= 2
    while P % pp != 0:  # largest divisor of P at or under the budget pick
        pp -= 1
    return pp


def _panel_factor(panel_t, interpret: bool = False, subw: int = None):
    """Factor a batch of transposed panels [P, B, m] -> [P, B, m]."""
    P, B, m = panel_t.shape
    pp = _pick_pp(P, B, m)
    assert P % pp == 0, (P, pp)
    # With the bigger particle window, shrink the sub-panel strip so the
    # per-step [pp, W, m] temporaries fit beside the 8MB scratch.
    w_default = SUBW
    kernel = functools.partial(_panel_kernel, B=B,
                               W=min(subw or w_default, B), m=m, pp=pp)
    return pl.pallas_call(
        kernel,
        grid=(P // pp,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((P, B, m), panel_t.dtype),
        scratch_shapes=[pltpu.VMEM((pp, B, m), panel_t.dtype),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=15 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=P * B * B * m, bytes_accessed=2 * P * B * m * 4,
            transcendentals=P * B),
    )(panel_t)


def _trailing_lower(A, L21, block, precision):
    """A22 - L21 L21^T computed for the LOWER block triangle only.

    Every consumer of the trailing matrix reads only its lower triangle:
    the panel factor kernel masks lanes above each column's diagonal, and
    A21/L21 are strictly-lower strips. Skipping the upper blocks halves
    both the MXU MACs and the einsum read traffic of the dominant
    O(N^3/3) update; upper blocks are zero-filled (cheap stores, and the
    zero upper keeps downstream junk-safety trivial)."""
    P = L21.shape[0]
    Anew_rows = []
    mrem = A.shape[1] - block
    nb2 = mrem // block
    if nb2 * block != mrem or nb2 <= 1:
        upd = jnp.einsum("pib,pjb->pij", L21, L21,
                         preferred_element_type=A.dtype,
                         precision=precision)
        return A[:, block:, block:] - upd
    for i in range(nb2):
        r0, r1 = i * block, (i + 1) * block
        upd = jnp.einsum("pib,pjb->pij", L21[:, r0:r1, :],
                         L21[:, :r1, :],
                         preferred_element_type=A.dtype,
                         precision=precision)
        row = A[:, block + r0:block + r1, block:block + r1] - upd
        if r1 < mrem:
            row = jnp.concatenate(
                [row, jnp.zeros((P, block, mrem - r1), A.dtype)], axis=2)
        Anew_rows.append(row)
    return jnp.concatenate(Anew_rows, axis=1)


def _factor_driver(K, x=None, want_wd: bool = False, block: int = BLOCK,
                   interpret: bool = False, subw: int = None,
                   want_l: bool = True, want_strips: bool = False):
    """Right-looking blocked factorization.

    Returns (L, alpha or None, Wd or None) where alpha = L^-1 x and
    Wd[P, nb, B, B] stacks the per-panel diagonal-block inverses Lkk^-1
    (reused by ops/kinv_pallas.py — recomputing them there cost a
    measured 0.88 ms at [64,1024,1024]).

    Only the [B, B] diagonal block runs the sequential Pallas column
    recurrence; the off-diagonal strip L21 = A21 L11^-T rides the
    blocked triangular inverse of the factored diagonal, and the
    trailing update A22 -= L21 L21^T (lower blocks only) — both plain
    batched MXU matmuls at HIGHEST. (A LEFT-looking variant that avoids
    re-materializing the trailing A was measured SLOWER on v5e —
    4.92 vs 4.50 ms chol batch, value e2e 6.95 vs 5.95 ms: the
    dynamic_update_slice factor assembly and strided prefix reads cost
    more than the trailing-A round trips they replace.)"""
    from autogp_tpu import gp_math
    P, N, _ = K.shape
    assert N % block == 0, (N, block)
    nb = N // block
    HI = jax.lax.Precision.HIGHEST
    A = K
    xcur = x
    cols = []
    alphas = []
    wds = []
    diags = []
    strips = []
    for k in range(nb):
        r0 = k * block
        diag_t = jnp.swapaxes(A[:, :block, :block], 1, 2)  # [P, B, B]
        Lkk_t = _panel_factor(diag_t, interpret=interpret, subw=subw)
        Lkk = jnp.swapaxes(Lkk_t, 1, 2)                    # [P, B, B]
        need_inv = want_wd or x is not None or k + 1 < nb
        if need_inv:
            Linv = gp_math.tri_inv_blocked(Lkk)            # [P, B, B]
            if want_wd:
                wds.append(Linv)
        if not want_l:
            diags.append(jnp.diagonal(Lkk, axis1=1, axis2=2))
        if x is not None:
            a_k = jnp.einsum("pij,pj->pi", Linv, xcur[:, :block],
                             preferred_element_type=K.dtype, precision=HI)
            alphas.append(a_k)
        if k + 1 < nb:
            A21 = A[:, block:, :block]                     # [P, m-B, B]
            L21 = jnp.einsum("pij,pkj->pik", A21, Linv,
                             preferred_element_type=K.dtype, precision=HI)
            A = _trailing_lower(A, L21, block, HI)
            if x is not None:
                xcur = xcur[:, block:] - jnp.einsum(
                    "pij,pj->pi", L21, a_k,
                    preferred_element_type=K.dtype, precision=HI)
            Lp = (jnp.concatenate([Lkk, L21], axis=1)
                  if (want_l or want_strips) else None)
        else:
            Lp = Lkk if (want_l or want_strips) else None
        if want_strips:
            strips.append(Lp)
        if want_l:
            cols.append(jnp.concatenate(
                [jnp.zeros((P, r0, block), K.dtype), Lp], axis=1))
    # want_l=False: the first return is the factor DIAGONAL [P, N] —
    # bitwise the same values diag_fast would read off the assembled L,
    # without paying the per-panel zero-concat + final axis-2 concat
    # (~12 MB/particle of pure copies at [64,1024,1024]).
    L = (jnp.concatenate(cols, axis=2) if want_l
         else jnp.concatenate(diags, axis=1))
    alpha = None if x is None else jnp.concatenate(alphas, axis=1)
    wd = jnp.stack(wds, axis=1) if want_wd else None
    return L, alpha, wd, tuple(strips)


def _factor_driver_o2(K, x=None, want_wd: bool = False,
                      block: int = BLOCK, interpret: bool = False,
                      subw: int = None, want_l: bool = True,
                      want_strips: bool = False):
    """Two-level variant of _factor_driver: panels stay B=128 (the Pallas
    recurrence sweet spot) but the trailing update runs once per OUTER
    2B-block as a single rank-2B MXU dot — the shrinking trailing matrix
    re-materializes half as many times (the dominant data-movement cost
    of the one-level driver: ~9.2 MB/particle of A round trips at
    [64,1024,1024] -> ~4.6 MB). Identical math; trailing accumulation
    regrouped (two rank-B subtractions fold into one rank-2B dot).

    Requires nb even. Same return convention as _factor_driver."""
    from autogp_tpu import gp_math
    P, N, _ = K.shape
    nb = N // block
    assert nb % 2 == 0 and N % block == 0, (N, block)
    HI = jax.lax.Precision.HIGHEST
    B = block
    A = K
    xcur = x
    cols = []
    alphas = []
    wds = []
    diags = []
    strips = []

    def emit(Lkk, Lbelow, r0):
        """Collect per-panel outputs (strip/col/diag) for a panel whose
        below-diagonal rows are Lbelow ([P, N-r0-B, B] or None)."""
        if not want_l:
            diags.append(jnp.diagonal(Lkk, axis1=1, axis2=2))
        Lp = (Lkk if Lbelow is None or Lbelow.shape[1] == 0
              else jnp.concatenate([Lkk, Lbelow], axis=1))
        if want_strips:
            strips.append(Lp)
        if want_l:
            cols.append(jnp.concatenate(
                [jnp.zeros((P, r0, B), K.dtype), Lp], axis=1))

    for ok in range(nb // 2):
        r0 = 2 * ok * B
        m = N - r0                       # current trailing size
        # --- inner panel 0 --------------------------------------------
        Lkk0 = jnp.swapaxes(_panel_factor(
            jnp.swapaxes(A[:, :B, :B], 1, 2), interpret=interpret,
            subw=subw), 1, 2)
        W0 = gp_math.tri_inv_blocked(Lkk0)
        if want_wd:
            wds.append(W0)
        L21a = jnp.einsum("pij,pkj->pik", A[:, B:, :B], W0,
                          preferred_element_type=K.dtype, precision=HI)
        T1 = L21a[:, :B, :]              # L[r0+B:r0+2B, r0:r0+B]
        low = L21a[:, B:, :]             # L[r0+2B:, r0:r0+B]
        # --- inner panel 1 (targeted column update only) --------------
        A11 = A[:, B:2 * B, B:2 * B] - jnp.einsum(
            "pib,pjb->pij", T1, T1, preferred_element_type=K.dtype,
            precision=HI)
        Lkk1 = jnp.swapaxes(_panel_factor(
            jnp.swapaxes(A11, 1, 2), interpret=interpret, subw=subw),
            1, 2)
        W1 = gp_math.tri_inv_blocked(Lkk1)
        if want_wd:
            wds.append(W1)
        if m > 2 * B:
            C1 = A[:, 2 * B:, B:2 * B] - jnp.einsum(
                "pib,pjb->pij", low, T1, preferred_element_type=K.dtype,
                precision=HI)
            L21b = jnp.einsum("pij,pkj->pik", C1, W1,
                              preferred_element_type=K.dtype,
                              precision=HI)
        else:
            L21b = jnp.zeros((P, 0, B), K.dtype)
        # --- solve ----------------------------------------------------
        if x is not None:
            a0 = jnp.einsum("pij,pj->pi", W0, xcur[:, :B],
                            preferred_element_type=K.dtype, precision=HI)
            alphas.append(a0)
            rhs1 = xcur[:, B:2 * B] - jnp.einsum(
                "pij,pj->pi", T1, a0, preferred_element_type=K.dtype,
                precision=HI)
            a1 = jnp.einsum("pij,pj->pi", W1, rhs1,
                            preferred_element_type=K.dtype, precision=HI)
            alphas.append(a1)
            if m > 2 * B:
                xcur = (xcur[:, 2 * B:]
                        - jnp.einsum("pij,pj->pi", low, a0,
                                     preferred_element_type=K.dtype,
                                     precision=HI)
                        - jnp.einsum("pij,pj->pi", L21b, a1,
                                     preferred_element_type=K.dtype,
                                     precision=HI))
        # --- emit panel outputs --------------------------------------
        emit(Lkk0, L21a, r0)
        emit(Lkk1, L21b, r0 + B)
        # --- ONE rank-2B trailing update -----------------------------
        if m > 2 * B:
            Lw = jnp.concatenate([low, L21b], axis=2)   # [P, m-2B, 2B]
            A = _trailing_lower(A, Lw, 2 * B, HI)
    L = (jnp.concatenate(cols, axis=2) if want_l
         else jnp.concatenate(diags, axis=1))
    alpha = None if x is None else jnp.concatenate(alphas, axis=1)
    wd = jnp.stack(wds, axis=1) if want_wd else None
    return L, alpha, wd, tuple(strips)


def _driver(K, **kw):
    """Dispatch: two-level trailing when the shape allows (nb even,
    >= 4 panels — below that there is no trailing traffic to save)."""
    nb = K.shape[-1] // kw.get("block", BLOCK)
    if nb % 2 == 0 and nb >= 4:
        return _factor_driver_o2(K, **kw)
    return _factor_driver(K, **kw)


def cholesky_batched(K, block: int = BLOCK, interpret: bool = False,
                     subw: int = None):
    """Lower-Cholesky of a batch [P, N, N] of SPD matrices.

    N must be a multiple of `block`. Reads only the lower triangle.
    See _factor_driver for the factorization structure."""
    L, _, _, _ = _driver(K, block=block, interpret=interpret, subw=subw)
    return L


def cholesky_solve_batched(K, x, block: int = BLOCK,
                           interpret: bool = False, subw: int = None):
    """(L, alpha = L^-1 x) for a batch [P, N, N] of SPD matrices.

    The RHS rides the panel loop: each panel's blocked triangular
    inverse (already computed for the off-diagonal strip) also advances
    the forward substitution — the standalone solve_lower_blocked costs
    ~1.9 ms at [64,1024,1024] (it re-inverts the diagonal blocks);
    fused it is two small matvecs per panel (~0.1 ms)."""
    L, alpha, _, _ = _driver(K, x=x, block=block, interpret=interpret,
                             subw=subw)
    return L, alpha


def cholesky_solve_wd_batched(K, x, block: int = BLOCK,
                              interpret: bool = False, subw: int = None):
    """(L, alpha, Wd): cholesky_solve_batched plus the per-panel
    diagonal-block inverses, for reuse by kinv_pallas (lml_tape_fused's
    backward)."""
    L, alpha, wd, _ = _driver(K, x=x, want_wd=True, block=block,
                              interpret=interpret, subw=subw)
    return L, alpha, wd


def cholesky_solve_diag_batched(K, x, block: int = BLOCK,
                                interpret: bool = False, subw: int = None):
    """(diag(L) [P, N], alpha = L^-1 x): the value-only LML pair.

    Skips assembling the [P, N, N] factor entirely — the pure value path
    (mvn_logpdf primal) reads only the diagonal and the solve."""
    d, alpha, _, _ = _driver(K, x=x, want_l=False, block=block,
                             interpret=interpret, subw=subw)
    return d, alpha


def cholesky_solve_strips_batched(K, x, block: int = BLOCK,
                                  interpret: bool = False,
                                  subw: int = None):
    """(diag(L) [P,N], alpha, Wd, strip_0, ..., strip_{nb-1}).

    The gradient-path factorization: the factor is returned as its nb
    BLOCK-COLUMN STRIPS (strip_k = L[r0:N, r0:r0+B], shape
    [P, N-k*B, B]) instead of an assembled [P, N, N] array — the only
    consumer (ops/kinv_pallas substitution) reads exactly these strips,
    so the per-panel zero-concat and final axis-2 concat never happen
    and the kernel streams half the bytes (the zero upper triangle
    never exists)."""
    d, alpha, wd, strips = _driver(
        K, x=x, want_wd=True, want_l=False, want_strips=True,
        block=block, interpret=interpret, subw=subw)
    return (d, alpha, wd) + strips


def strips_to_l(strips):
    """Assemble a full lower factor [.., N, N] from block-column strips
    (fallback paths only — the Pallas path never materializes this)."""
    parts = []
    B = strips[0].shape[-1]
    N = strips[0].shape[-2]
    for k, sk in enumerate(strips):
        r0 = k * B
        pad = jnp.zeros(sk.shape[:-2] + (r0, B), sk.dtype)
        parts.append(jnp.concatenate([pad, sk], axis=-2))
    return jnp.concatenate(parts, axis=-1)


def _chol_solve_strips_plain(K, x):
    L, alpha = _chol_solve_plain(K, x)
    wd = _wd_fallback(L)
    N = L.shape[-1]
    strips = tuple(L[..., k * BLOCK:, k * BLOCK:(k + 1) * BLOCK]
                   for k in range(max(1, N // BLOCK)))
    return (jnp.diagonal(L, axis1=-2, axis2=-1), alpha, wd) + strips


@jax.custom_batching.custom_vmap
def chol_solve_strips_psd(K, x):
    """Strips-form factor+solve (see cholesky_solve_strips_batched).
    NOT reverse-mode differentiable — custom_vjp rules only."""
    return _chol_solve_strips_plain(K, x)


@chol_solve_strips_psd.def_vmap
def _chol_solve_strips_psd_vmap(axis_size, in_batched, K, x):
    from autogp_tpu import backend
    k_batched, x_batched = in_batched
    if not (k_batched and x_batched):
        K = K if k_batched else jnp.broadcast_to(K, (axis_size,) + K.shape)
        x = x if x_batched else jnp.broadcast_to(x, (axis_size,) + x.shape)
    if K.ndim == 3 and supported(K.shape[-1], K.dtype) \
            and backend.use_pallas():
        out = cholesky_solve_strips_batched(K, x)
    else:
        out = jax.vmap(_chol_solve_strips_plain)(K, x)
    return out, tuple(True for _ in out)


def supported(N: int, dtype) -> bool:
    return N % BLOCK == 0 and dtype == jnp.float32


def _chol_lower(K):
    """XLA Cholesky reading ONLY the lower triangle (symmetrize_input off).

    Bit-identical to jnp.linalg.cholesky for exactly-symmetric inputs
    ((x + x)/2 == x in IEEE), and REQUIRED for the lower_only assembly
    path (cov_pallas.cov_matrix_tape(lower_only=True) zero-fills the
    upper triangle; symmetrizing would halve the off-diagonals)."""
    return jax.lax.linalg.cholesky(K, symmetrize_input=False)


@jax.custom_batching.custom_vmap
def chol_psd(K):
    """Per-particle entry: plain XLA Cholesky when unbatched, the batched
    Pallas factorization under vmap (where the particle batch is visible
    as one array). Callers guard shape/dtype via `supported`. All paths
    read only the lower triangle."""
    return _chol_lower(K)


@chol_psd.def_vmap
def _chol_psd_vmap(axis_size, in_batched, K):
    from autogp_tpu import backend
    (k_batched,) = in_batched
    if not k_batched:
        return _chol_lower(K), False
    if K.ndim == 3 and supported(K.shape[-1], K.dtype) \
            and backend.use_pallas():
        return cholesky_batched(K), True
    return _chol_lower(K), True


def _chol_solve_plain(K, x):
    L = _chol_lower(K)
    return L, jax.scipy.linalg.solve_triangular(L, x, lower=True)


@jax.custom_batching.custom_vmap
def chol_solve_psd(K, x):
    """(L, L^-1 x): the fused factor+solve under vmap on TPU (the panel
    loop's blocked inverses advance the substitution for free), plain
    Cholesky + triangular solve otherwise. NOT reverse-mode
    differentiable (custom_vmap) — use inside custom_vjp rules only."""
    return _chol_solve_plain(K, x)


@chol_solve_psd.def_vmap
def _chol_solve_psd_vmap(axis_size, in_batched, K, x):
    from autogp_tpu import backend
    k_batched, x_batched = in_batched
    if not (k_batched and x_batched):
        K = K if k_batched else jnp.broadcast_to(K, (axis_size,) + K.shape)
        x = x if x_batched else jnp.broadcast_to(x, (axis_size,) + x.shape)
    if K.ndim == 3 and supported(K.shape[-1], K.dtype) \
            and backend.use_pallas():
        return cholesky_solve_batched(K, x), (True, True)
    L = _chol_lower(K)
    alpha = jax.vmap(lambda l, v: jax.scipy.linalg.solve_triangular(
        l, v, lower=True))(L, x)
    return (L, alpha), (True, True)


def _chol_solve_diag_plain(K, x):
    L, alpha = _chol_solve_plain(K, x)
    return jnp.diagonal(L, axis1=-2, axis2=-1), alpha


@jax.custom_batching.custom_vmap
def chol_solve_diag_psd(K, x):
    """(diag(L), alpha = L^-1 x) — the value-only entry: under vmap on
    TPU the batched driver never assembles the [N, N] factor (measured
    ~0.5 ms/batch of pure copies at [64,1024,1024]); diag values are
    bitwise identical to diag_fast(chol_solve_psd(K, x)[0]). NOT
    reverse-mode differentiable (custom_vmap) — primal/custom_vjp-rule
    use only."""
    return _chol_solve_diag_plain(K, x)


@chol_solve_diag_psd.def_vmap
def _chol_solve_diag_psd_vmap(axis_size, in_batched, K, x):
    from autogp_tpu import backend
    k_batched, x_batched = in_batched
    if not (k_batched and x_batched):
        K = K if k_batched else jnp.broadcast_to(K, (axis_size,) + K.shape)
        x = x if x_batched else jnp.broadcast_to(x, (axis_size,) + x.shape)
    if K.ndim == 3 and supported(K.shape[-1], K.dtype) \
            and backend.use_pallas():
        return cholesky_solve_diag_batched(K, x), (True, True)
    L = _chol_lower(K)
    alpha = jax.vmap(lambda l, v: jax.scipy.linalg.solve_triangular(
        l, v, lower=True))(L, x)
    return (jnp.diagonal(L, axis1=-2, axis2=-1), alpha), (True, True)


def _wd_fallback(L):
    """Per-panel diagonal-block inverses off an existing factor (the
    non-Pallas path of chol_solve_wd_psd; value-identical role to the
    in-loop Linv collection, small [nb, B, B] work).

    Must handle UNBATCHED [N, N] input: custom_vmap traces the primal
    with per-particle tracers before its vmap rule replaces it."""
    from autogp_tpu import gp_math
    N = L.shape[-1]
    if N % BLOCK != 0:
        # Callers gate the wd consumer (kinv_beta_wd) on `supported`;
        # keep a defined value for odd shapes.
        nb = max(1, N // BLOCK)
        return jnp.zeros(L.shape[:-2] + (nb, BLOCK, BLOCK), L.dtype)
    nb = N // BLOCK
    blocks = jnp.stack([L[..., k * BLOCK:(k + 1) * BLOCK,
                          k * BLOCK:(k + 1) * BLOCK]
                        for k in range(nb)], axis=-3)
    return gp_math.tri_inv_blocked(blocks)


def _chol_solve_wd_plain(K, x):
    L, alpha = _chol_solve_plain(K, x)
    return L, alpha, _wd_fallback(L)


@jax.custom_batching.custom_vmap
def chol_solve_wd_psd(K, x):
    """(L, alpha = L^-1 x, Wd[nb, B, B] diagonal-block inverses).

    Like chol_solve_psd, additionally returning the per-panel Lkk^-1
    the factorization already computes — kinv_pallas reuses them
    instead of re-running a 0.88 ms batched tri-inverse (lml_tape_fused
    backward). NOT reverse-mode differentiable (custom_vmap) — use
    inside custom_vjp rules only."""
    return _chol_solve_wd_plain(K, x)


@chol_solve_wd_psd.def_vmap
def _chol_solve_wd_psd_vmap(axis_size, in_batched, K, x):
    from autogp_tpu import backend
    k_batched, x_batched = in_batched
    if not (k_batched and x_batched):
        K = K if k_batched else jnp.broadcast_to(K, (axis_size,) + K.shape)
        x = x if x_batched else jnp.broadcast_to(x, (axis_size,) + x.shape)
    if K.ndim == 3 and supported(K.shape[-1], K.dtype) \
            and backend.use_pallas():
        return cholesky_solve_wd_batched(K, x), (True, True, True)
    L = _chol_lower(K)
    alpha = jax.vmap(lambda l, v: jax.scipy.linalg.solve_triangular(
        l, v, lower=True))(L, x)
    return (L, alpha, jax.vmap(_wd_fallback)(L)), (True, True, True)
