"""Fused per-particle K^-1 / beta / ||L^-1||_F^2 from a Cholesky factor.

The LML gradient's closed-form cotangent (gp_math._mvn_logpdf_masked_bwd,
cov_pallas_vjp.lml_tape_fused) needs K^-1 = L^-T L^-1, beta = K^-1 x, and
the noise gradient additionally tr(K^-1) = ||L^-1||_F^2. The XLA chain
(gp_math.tri_inv_blocked -> kinv_from_linv -> beta matmul) is bandwidth
bound: every combine level of the recursive triangular inverse writes a
full-matrix-sized intermediate to HBM (~6.2 ms total at [64,1024,1024]
f32 on v5e).

Here ONE Pallas kernel holds a whole particle's factor in VMEM (a
[1024,1024] f32 matrix is 4 MB — it fits) and runs:

  1. right-looking block forward substitution for Linv:
     Linv[k,j] = -Wd[k] * sum_{j<=m<k} L[k,m] Linv[m,j], Linv[j,j] = Wd[j]
     with the [B,B] diagonal-block inverses Wd precomputed OUTSIDE in one
     small batched tri-inverse. Each of the nb sequential steps is one
     wide [B,B]x[B,kB] finalize dot plus one [N-kB,B]x[B,kB] propagate
     dot — no multi-level HBM intermediates, no narrow-dot chains;
  2. beta[j-block] = Linv[jB:,jcol]^T alpha[jB:] and the Frobenius
     reduction, read straight off the VMEM-resident Linv;
  3. (want_kinv) K^-1 lower block-rows Kinv[bi,:bi+1] =
     Linv[biB:,bicol]^T Linv[biB:,:(bi+1)B], one wide dot per block-row.

The particle axis is the grid: L streams in and K^-1 streams out through
Mosaic's pipelined block buffers, so the HBM traffic (4 MB in + 4 MB out
per particle) overlaps the ~45 us of per-particle MXU work (a manual
single-buffered DMA variant measured +2 ms of un-overlapped transfer on
the 64-particle batch).

K^-1 is emitted LOWER-ONLY (strictly-upper blocks zero, diagonal blocks
dense-symmetric, matching gp_math.kinv_from_linv(lower_only=True)): the
only consumer is the symmetric backward tape sweep, which never reads
above the diagonal.

In-kernel contractions run at the GRAD_PRECISION class (gp_math.py:36-53:
this path feeds only gradient cotangents, never an LML value). Mosaic
rejects Precision.HIGH, so the 3-pass bf16 decomposition XLA uses for
HIGH is emulated manually (`_dot3`: a_hi b_hi + a_hi b_lo + a_lo b_hi,
f32 accumulation) — half the MXU passes of HIGHEST, and precision-
CONSISTENT with the `_chain_one` XLA fallback, which has always run at
GRAD_PRECISION. Measured on v5e [64,1024,1024]: grad-LML batch 12.98 ms
at HIGHEST -> 11.50 ms at bf16x3; worst-case K^-1 error on an ill-
conditioned gram stays in the documented GRAD_PRECISION class
(tests/test_tpu_kernels.py::test_kinv_beta_fused_vs_chain_and_f64 pins
both modes, test_grad_precision_bwd_chain_error_bound pins the class).
`fast=False` restores HIGHEST for value-adjacent uses.

Reference workload: HMC leapfrog gradients,
/root/reference/src/inference_smc_anneal_data.jl:63-68.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
# Pipelined in/out block buffers (2 x 4 MB each) + the Linv window + the
# unrolled-dot stack high-water must fit in VMEM; N=1024 measures ~35 MB,
# well under the v5e budget (the 22-MB manual-DMA variant ran fine).
MAX_N = 1024


def supported(N: int, dtype) -> bool:
    return N % BLOCK == 0 and N <= MAX_N and dtype == jnp.float32


def _kernel(wd_ref, al_ref, l_ref, *rest, nb: int, want_kinv: bool,
            precision, want_sub: bool = True, want_stats: bool = True,
            fast: bool = True, want_v: bool = False,
            strips: bool = False):
    if strips:
        # l_ref is strip_0; rest starts with strips 1..nb-1 (strip_k =
        # L[kB:N, kB:(k+1)B], block [1, N-kB, B]) — the factor arrives as
        # block-column strips straight from the factorization, never
        # assembled into an [N, N] array (chol_solve_strips_psd).
        srefs = (l_ref,) + rest[:nb - 1]
        rest = rest[nb - 1:]
    if want_kinv:
        kinv_ref, beta_ref, fro_ref, V = rest
    elif want_v:
        # Linv itself is the output (the substitution runs directly in the
        # pipelined out block — no scratch window at all); strictly-upper
        # blocks are zero-filled below so consumers may contract full
        # columns (cov_pallas_vjp's in-tape K^-1 tiles rely on it).
        v_ref, beta_ref, fro_ref = rest
        V = v_ref.at[0]
    else:
        beta_ref, fro_ref, V = rest
    B = BLOCK
    N = nb * B
    dt = v_ref.dtype if want_v else V.dtype

    def dot_hi(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=dt,
                                   precision=precision)

    def dot(a, b, dims):
        # GRAD_PRECISION-class contraction (see dot3); fast=False keeps
        # the full-precision passes for value-adjacent uses.
        if not fast:
            return dot_hi(a, b, dims)
        return dot3(a, b, dims)

    # --- Linv into V (right-looking block forward substitution) ---------
    # Row-block k's running sums S_kj = sum_{j<=m<k} L[k,m] Linv[m,j]
    # accumulate in V's own row-block; each step finalizes one row-block
    # with a single wide dot and propagates it to all deeper rows with a
    # single [N-r1,B]x[B,(k+1)B] dot.
    for k in range(nb if want_sub else 0):
        r0, r1 = k * B, (k + 1) * B
        if k > 0:
            V[r0:r1, 0:r0] = -dot(wd_ref[0, k], V[r0:r1, 0:r0],
                                  ((1,), (0,)))
        V[r0:r1, r0:r1] = wd_ref[0, k]
        if k + 1 < nb:
            lstrip = (srefs[k][0, B:, :] if strips
                      else l_ref[0, r1:N, r0:r1])
            upd = dot(lstrip, V[r0:r1, 0:r1], ((1,), (0,)))
            # columns < k accumulate; column k's first contribution
            # overwrites the stale scratch.
            if k > 0:
                V[r1:N, 0:r0] = V[r1:N, 0:r0] + upd[:, 0:r0]
            V[r1:N, r0:r1] = upd[:, r0:r1]

    # Strictly-upper blocks: zero-filled when V is an output (the out
    # buffer is uninitialized pipeline scratch; junk there would poison
    # the consumer's full-column contractions). The in-block uppers are
    # already exact zeros (wd comes from tri_inv_blocked).
    if want_v:
        for k in range(nb - 1):
            r0, r1 = k * B, (k + 1) * B
            V[r0:r1, r1:N] = jnp.zeros((B, N - r1), dt)

    # --- beta = Linv^T alpha and the Frobenius reduction -----------------
    # Rows above the diagonal of each column-block are stale scratch from
    # the previous particle; every read below starts at the block's
    # diagonal row, so they never leak.
    if want_stats:
        fro = jnp.zeros((), dt)
        for j in range(nb):
            c0, c1 = j * B, (j + 1) * B
            Vj = V[c0:N, c0:c1]
            # matvec: negligible MXU cost, keep the full-precision passes
            beta_ref[0, 0:1, c0:c1] = dot_hi(al_ref[0, c0:N, :], Vj,
                                             ((0,), (0,)))
            fro = fro + jnp.sum(Vj * Vj)
        fro_ref[0, 0, 0] = fro
    else:  # profiling variant: keep outputs defined
        beta_ref[0, 0:1, 0:B] = V[0:1, 0:B]
        fro_ref[0, 0, 0] = V[0, 0]

    # --- K^-1 lower block-rows -------------------------------------------
    # Row-block bi contracts rows >= bi*B (Linv is lower triangular);
    # strictly-upper output blocks are zero-filled (the out buffer is
    # uninitialized pipeline scratch).
    # (A variant that pre-split V once into persistent bf16 hi/lo VMEM
    # scratch to de-duplicate the per-block-row splits measured WORSE
    # end-to-end: grad-LML 12.23 vs 11.50 ms — the +4 MB scratch costs
    # more pipeline overlap than the split reuse saves.)
    if want_kinv:
        for bi in range(nb):
            r0 = bi * B
            kinv_ref[0, r0:r0 + B, 0:r0 + B] = dot(
                V[r0:N, r0:r0 + B], V[r0:N, 0:r0 + B], ((0,), (0,)))
            if r0 + B < N:
                kinv_ref[0, r0:r0 + B, r0 + B:N] = jnp.zeros(
                    (B, N - r0 - B), dt)


def _launch(L, alpha, want_kinv: bool, interpret: bool = False,
            want_sub: bool = True, want_stats: bool = True,
            fast: bool = True, want_v: bool = False, wd=None):
    # Mutually exclusive by construction: the kernel unpacks `rest` as
    # 4 refs for want_kinv (with a scratch V) but 3 for want_v (V IS the
    # output) — both at once would fail with an opaque unpack error deep
    # in tracing.
    assert not (want_kinv and want_v), "want_kinv and want_v are exclusive"
    from autogp_tpu import gp_math
    P, N, _ = L.shape
    nb = N // BLOCK
    dt = L.dtype
    if wd is not None:
        # Reuse the factorization's own per-panel Lkk^-1
        # (chol_pallas.chol_solve_wd_psd): skips a measured 0.88 ms
        # batched tri-inverse at [64,1024,1024]. Computed at HIGHEST
        # there (value path) vs GRAD_PRECISION here — strictly finer.
        Wd = wd
    else:
        # Diagonal-block inverses: one small batched tri-inverse (the
        # only sequential-substitution work left on the XLA side).
        blocks = gp_math._diag_blocks(L, BLOCK)             # [P, nb, B, B]
        Wd = gp_math.tri_inv_blocked(blocks,
                                     precision=gp_math.GRAD_PRECISION)
    kernel = functools.partial(_kernel, nb=nb, want_kinv=want_kinv,
                               precision=jax.lax.Precision.HIGHEST,
                               want_sub=want_sub, want_stats=want_stats,
                               fast=fast, want_v=want_v)
    in_specs = [
        pl.BlockSpec((1, nb, BLOCK, BLOCK), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((P, 1, N), dt),
                 jax.ShapeDtypeStruct((P, 1, 1), dt)]
    out_specs = [pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)]
    if want_kinv or want_v:
        out_shape = [jax.ShapeDtypeStruct((P, N, N), dt)] + out_shape
        out_specs = [pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)] + out_specs
    outs = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[] if want_v else [pltpu.VMEM((N, N), dt)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=P * N * N * N * (2 if want_kinv else 1) // 3,
            bytes_accessed=P * N * N * 4 * (2 if want_kinv else 1),
            transcendentals=0),
    )(Wd, alpha[:, :, None], L)
    if want_kinv or want_v:
        mat, beta, fro = outs
        return mat, beta[:, 0, :], fro[:, 0, 0]
    beta, fro = outs
    return beta[:, 0, :], fro[:, 0, 0]


def _launch_strips(alpha, wd, strips, interpret: bool = False,
                   fast: bool = True):
    """kinv_beta (want_kinv) fed by block-column strips of L instead of
    the assembled factor: the strictly-upper zeros never stream, and the
    factorization never pays the [N, N] assembly concats."""
    P, N = alpha.shape
    nb = N // BLOCK
    assert len(strips) == nb, (len(strips), nb)
    dt = alpha.dtype
    kernel = functools.partial(_kernel, nb=nb, want_kinv=True,
                               precision=jax.lax.Precision.HIGHEST,
                               fast=fast, strips=True)
    in_specs = [
        pl.BlockSpec((1, nb, BLOCK, BLOCK), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, N - k * BLOCK, BLOCK), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for k in range(nb)
    ]
    out_shape = [jax.ShapeDtypeStruct((P, N, N), dt),
                 jax.ShapeDtypeStruct((P, 1, N), dt),
                 jax.ShapeDtypeStruct((P, 1, 1), dt)]
    out_specs = [pl.BlockSpec((1, N, N), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                              memory_space=pltpu.SMEM)]
    kinv, beta, fro = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((N, N), dt)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=P * N * N * N * 2 // 3,
            bytes_accessed=P * N * N * 4 * 3 // 2,
            transcendentals=0),
    )(wd, alpha[:, :, None], *strips)
    return kinv, beta[:, 0, :], fro[:, 0, 0]


def _chain_one_strips(alpha, wd, *strips):
    from autogp_tpu.ops import chol_pallas
    L = chol_pallas.strips_to_l(strips)
    return _chain_one(L, alpha)


@jax.custom_batching.custom_vmap
def kinv_beta_strips(alpha, wd, *strips):
    """(K^-1 lower-only, beta, ||L^-1||_F^2) off the strips-form factor
    (chol_pallas.chol_solve_strips_psd). Fallback reassembles L."""
    return _chain_one_strips(alpha, wd, *strips)


@kinv_beta_strips.def_vmap
def _kinv_beta_strips_vmap(axis_size, in_batched, alpha, wd, *strips):
    from autogp_tpu import backend
    args = [alpha, wd] + list(strips)
    for i, (a, b) in enumerate(zip(args, in_batched)):
        if not b:
            args[i] = jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
    alpha, wd, strips = args[0], args[1], tuple(args[2:])
    N = alpha.shape[-1]
    if alpha.ndim == 2 and supported(N, alpha.dtype) \
            and backend.use_pallas() and wd.shape[-1] == BLOCK:
        return _launch_strips(alpha, wd, strips), (True, True, True)
    return jax.vmap(_chain_one_strips)(alpha, wd, *strips), \
        (True, True, True)


def dot3(a, b, dims):
    """GRAD_PRECISION-class in-kernel contraction: the manual 3-pass bf16
    decomposition of XLA's Precision.HIGH (which Mosaic rejects) —
    a_hi b_hi + a_hi b_lo + a_lo b_hi with f32 accumulation; the dropped
    a_lo b_lo term is below f32 rounding. Shared by this kernel and the
    in-tape K^-1 tile formation (cov_pallas_vjp)."""
    dt = a.dtype
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(dt)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(dt)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, (dims, ((), ())),
                                   preferred_element_type=dt)

    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _chain_one(L, alpha):
    """Unbatched fallback: the XLA blocked-inverse chain (identical to the
    pre-fusion backward; also the CPU/interpret path)."""
    from autogp_tpu import gp_math
    Linv = gp_math.tri_inv_blocked(L, precision=gp_math.GRAD_PRECISION)
    beta = jnp.matmul(Linv.T, alpha, precision=gp_math.GRAD_PRECISION)
    Kinv = gp_math.kinv_from_linv(Linv, precision=gp_math.GRAD_PRECISION,
                                  lower_only=True)
    return Kinv, beta, jnp.sum(Linv * Linv)


def _stats_one(L, alpha):
    from autogp_tpu import gp_math
    Linv = gp_math.tri_inv_blocked(L, precision=gp_math.GRAD_PRECISION)
    beta = jnp.matmul(Linv.T, alpha, precision=gp_math.GRAD_PRECISION)
    return beta, jnp.sum(Linv * Linv)


@jax.custom_batching.custom_vmap
def kinv_beta(L, alpha):
    """(K^-1 lower-only, beta = L^-T alpha, ||L^-1||_F^2) for one factor.

    Callers pass alpha = L^-1 (xs*mask), so beta = K^-1 xs. Under vmap on
    TPU float32 (N a multiple of 128, N <= 1024) the whole batch runs the
    fused VMEM-resident kernel; otherwise the XLA blocked chain. Both
    paths run their contractions at the GRAD_PRECISION class (the kernel
    via the manual bf16x3 decomposition, the chain via Precision.HIGH) —
    gradient-cotangent use only, per gp_math.py:36-53. NOT reverse-mode
    differentiable — custom_vjp backward rules only.
    """
    return _chain_one(L, alpha)


@kinv_beta.def_vmap
def _kinv_beta_vmap(axis_size, in_batched, L, alpha):
    from autogp_tpu import backend
    lb, ab = in_batched
    if not (lb and ab):
        L = L if lb else jnp.broadcast_to(L, (axis_size,) + L.shape)
        alpha = alpha if ab else jnp.broadcast_to(
            alpha, (axis_size,) + alpha.shape)
    if L.ndim == 3 and supported(L.shape[-1], L.dtype) \
            and backend.use_pallas():
        return _launch(L, alpha, want_kinv=True), (True, True, True)
    return jax.vmap(_chain_one)(L, alpha), (True, True, True)


@jax.custom_batching.custom_vmap
def kinv_beta_wd(L, alpha, wd):
    """kinv_beta with the per-panel diagonal-block inverses supplied by
    the factorization (chol_pallas.chol_solve_wd_psd) instead of
    recomputed here. `wd` is ignored on the fallback path (the XLA
    chain re-derives everything from L)."""
    del wd
    return _chain_one(L, alpha)


@kinv_beta_wd.def_vmap
def _kinv_beta_wd_vmap(axis_size, in_batched, L, alpha, wd):
    from autogp_tpu import backend
    lb, ab, wb = in_batched
    if not (lb and ab and wb):
        L = L if lb else jnp.broadcast_to(L, (axis_size,) + L.shape)
        alpha = alpha if ab else jnp.broadcast_to(
            alpha, (axis_size,) + alpha.shape)
        wd = wd if wb else jnp.broadcast_to(wd, (axis_size,) + wd.shape)
    if L.ndim == 3 and supported(L.shape[-1], L.dtype) \
            and backend.use_pallas() and wd.shape[-1] == BLOCK:
        return _launch(L, alpha, want_kinv=True, wd=wd), (True, True, True)
    return jax.vmap(_chain_one)(L, alpha), (True, True, True)


@jax.custom_batching.custom_vmap
def linv_stats(L, alpha):
    """(beta = L^-T alpha, ||L^-1||_F^2) — the noise-gradient statistics,
    without forming K^-1 (lml_value_and_noise_grad* hot path)."""
    return _stats_one(L, alpha)


@linv_stats.def_vmap
def _linv_stats_vmap(axis_size, in_batched, L, alpha):
    from autogp_tpu import backend
    lb, ab = in_batched
    if not (lb and ab):
        L = L if lb else jnp.broadcast_to(L, (axis_size,) + L.shape)
        alpha = alpha if ab else jnp.broadcast_to(
            alpha, (axis_size,) + alpha.shape)
    if L.ndim == 3 and supported(L.shape[-1], L.dtype) \
            and backend.use_pallas():
        return _launch(L, alpha, want_kinv=False), (True, True)
    return jax.vmap(_stats_one)(L, alpha), (True, True)


@jax.custom_batching.custom_vmap
def linv_stats_wd(L, alpha, wd):
    """linv_stats with the factorization's own diagonal-block inverses
    supplied (chol_pallas.chol_solve_wd_psd) — the noise-HMC leapfrog
    calls this once per step; recomputing Wd in-kernel cost a measured
    0.88 ms/batch at [64,1024,1024]. `wd` ignored on fallbacks."""
    del wd
    return _stats_one(L, alpha)


@linv_stats_wd.def_vmap
def _linv_stats_wd_vmap(axis_size, in_batched, L, alpha, wd):
    from autogp_tpu import backend
    lb, ab, wb = in_batched
    if not (lb and ab):
        L = L if lb else jnp.broadcast_to(L, (axis_size,) + L.shape)
        alpha = alpha if ab else jnp.broadcast_to(
            alpha, (axis_size,) + alpha.shape)
    if not wb:
        wd = jnp.broadcast_to(wd, (axis_size,) + jnp.shape(wd))
    if L.ndim == 3 and supported(L.shape[-1], L.dtype) \
            and backend.use_pallas() and wd.shape[-1] == BLOCK:
        return _launch(L, alpha, want_kinv=False, wd=wd), (True, True)
    return jax.vmap(_stats_one)(L, alpha), (True, True)


def _linv_one(L, alpha):
    from autogp_tpu import gp_math
    Linv = gp_math.tri_inv_blocked(L, precision=gp_math.GRAD_PRECISION)
    beta = jnp.matmul(Linv.T, alpha, precision=gp_math.GRAD_PRECISION)
    return Linv, beta, jnp.sum(Linv * Linv)


@jax.custom_batching.custom_vmap
def linv_beta(L, alpha):
    """(L^-1 [N,N] with exact-zero strict upper, beta = L^-T alpha,
    ||L^-1||_F^2).

    The backend of lml_tape_fused's in-tape K^-1 formation: the tape
    gradient kernel contracts full columns of L^-1 to form each K^-1
    tile in VMEM (the lower-triangular zero pattern makes the full-length
    contraction exact), so K^-1 never exists in HBM and the kinv MXU
    work overlaps the tape kernel's VPU sweeps. NOT reverse-mode
    differentiable — custom_vjp backward rules only."""
    return _linv_one(L, alpha)


@linv_beta.def_vmap
def _linv_beta_vmap(axis_size, in_batched, L, alpha):
    from autogp_tpu import backend
    lb, ab = in_batched
    if not (lb and ab):
        L = L if lb else jnp.broadcast_to(L, (axis_size,) + L.shape)
        alpha = alpha if ab else jnp.broadcast_to(
            alpha, (axis_size,) + alpha.shape)
    if L.ndim == 3 and supported(L.shape[-1], L.dtype) \
            and backend.use_pallas():
        return _launch(L, alpha, want_kinv=False, want_v=True), \
            (True, True, True)
    return jax.vmap(_linv_one)(L, alpha), (True, True, True)
