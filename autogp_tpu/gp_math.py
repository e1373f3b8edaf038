"""Device-side GP math over tensor-encoded kernel trees.

The kernel expression tree lives in a fixed-shape binary heap:
  node_type: int32[M]   (M = 2^D - 1, codes in autogp_tpu.config; 0=inactive)
  params:    float[M,3] (transformed, i.e. positive-constrained, values)

Covariance assembly walks the heap in *static* post-order with a static
value stack: every slot pushes exactly one [N1,N2] block (leaves / inactive
slots from the formula table, operator slots by combining their two
children, which are by construction the top two stack entries). All stack
indices are static, so the whole evaluation is a fixed XLA program that
vmaps across particles. Formula semantics mirror GP.jl:135-503.

Reference: /root/reference/src/GP.jl.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import config as C

LOG2PI = math.log(2.0 * math.pi)

# K-sized contractions on TPU must run at HIGHEST precision: the default
# is single-pass bf16 (~7e-5 rel error), which degrades LML gradients and
# can reintroduce tiny negative eigenvalues in conditional covariances
# (CLAUDE.md invariant). No-op on CPU float64.
HI = jax.lax.Precision.HIGHEST

# Precision for contractions that feed ONLY gradient cotangents (never an
# LML value): K^-1 / beta / tri-inverse inside custom-VJP backward rules.
# On the TPU MXU, f32 dot_general is emulated in bf16 passes — measured on
# v5e at [64,1024,1024]: DEFAULT (1 pass) 0.88 ms / 5.6e-3 rel err, HIGH
# (3 passes) 2.18 ms / 5.1e-5, HIGHEST (6 passes) 4.41 ms / 2.1e-7
# (scripts/bench_precision.py). The realized error of the full backward
# CHAIN grows with cond(K) — tri_inv_blocked compounds through
# ~log2(N/16) combine levels and kinv_from_linv squares Linv — so on an
# ill-conditioned small-noise gram (cond ~1e6, N=1024) the K^-1 error is
# HIGH 9.3e-4 vs HIGHEST 5.5e-6 vs the same chain's f64 reference
# (bench_precision.bwd_chain_case, v5e; tests/test_tpu_kernels.py pins a
# hardware bound). HMC leapfrog with a deterministic approximate gradient
# is still reversible and volume-preserving, so MH acceptance with the
# exact LML stays unbiased (Neal 2011, ch.5) — gradient error only
# perturbs the acceptance RATE. LML values entering accept ratios always
# stay at HIGHEST.
GRAD_PRECISION = jax.lax.Precision.HIGH


# ---------------------------------------------------------------------------
# Static heap helpers
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def postorder(depth_cap: int) -> Tuple[int, ...]:
    """Post-order visit sequence of the full heap with 2^D - 1 slots."""
    M = (1 << depth_cap) - 1

    def rec(i):
        if i >= M:
            return []
        return rec(2 * i + 1) + rec(2 * i + 2) + [i]

    return tuple(rec(0))


@functools.lru_cache(maxsize=None)
def slot_depths(depth_cap: int) -> np.ndarray:
    """1-based depth of each slot (GP.jl:1141)."""
    M = (1 << depth_cap) - 1
    return np.array([int(np.floor(np.log2(i + 1))) + 1 for i in range(M)],
                    dtype=np.int32)


@functools.lru_cache(maxsize=None)
def ancestor_table(depth_cap: int) -> np.ndarray:
    """[M, D] table: ancestors of slot i (including i), padded with -1."""
    M = (1 << depth_cap) - 1
    out = -np.ones((M, depth_cap), dtype=np.int32)
    for i in range(M):
        j, k = i, 0
        while True:
            out[i, k] = j
            if j == 0:
                break
            j = (j - 1) // 2
            k += 1
    return out


def is_leaf_code(t):
    """True for primitive-kernel codes (1..5 and 9)."""
    return ((t >= C.CONSTANT) & (t <= C.PERIODIC)) | (t == C.WHITE_NOISE)


def is_op_code(t):
    return (t >= C.PLUS) & (t <= C.CHANGEPOINT)


# ---------------------------------------------------------------------------
# Leaf covariance formulas (GP.jl:135-346)
# ---------------------------------------------------------------------------

def _leaf_cov(t, p, t1, t2):
    """Covariance block for a leaf slot.

    t: scalar int node type; p: [3] transformed params;
    t1: [N1,1]; t2: [1,N2]. Returns [N1,N2].
    Computed as a masked sum of all six formulas: under vmap a switch would
    execute every branch anyway, and the masked form keeps XLA fusion simple.

    Every division/pow is guarded: slots of OTHER node types feed zeros
    into these formulas, and although jnp.where filters the VALUES, a NaN
    partial inside an unselected branch still poisons the gradient
    (0-cotangent x inf-partial = NaN). The guards are no-ops for valid
    (positive) parameters.
    """
    dt = t1 - t2
    adt = jnp.abs(dt)
    dt2 = dt * dt
    ones = jnp.ones(jnp.broadcast_shapes(t1.shape, t2.shape), t1.dtype)
    p0s = jnp.where(p[0] == 0, 1.0, p[0])      # lengthscales
    p1s = jnp.where(p[1] == 0, 1.0, p[1])      # period

    k_const = p[0] * ones
    k_wn = jnp.where(dt == 0, p[0], 0.0)
    k_lin = p[1] + p[2] * (t1 - p[0]) * (t2 - p[0])
    k_se = p[1] * jnp.exp(-0.5 * dt2 / (p0s * p0s))
    # GammaExponential: |dt|^gamma is non-smooth at dt=0; the double-where
    # guard keeps both the value and the gradient finite there
    # (exp(-(0/l)^g) == 1 with zero gradient).
    ratio = jnp.maximum(jnp.where(adt == 0, 1.0, adt / p0s), 1e-30)
    powg = jnp.where(adt == 0, 0.0, jnp.exp(p[1] * jnp.log(ratio)))
    k_ge = p[2] * jnp.exp(-powg)
    freq = math.pi / p1s
    s = jnp.sin(freq * adt)
    k_per = p[2] * jnp.exp((-2.0 / (p0s * p0s)) * s * s)

    return (jnp.where(t == C.CONSTANT, k_const, 0.0)
            + jnp.where(t == C.WHITE_NOISE, k_wn, 0.0)
            + jnp.where(t == C.LINEAR, k_lin, 0.0)
            + jnp.where(t == C.SQUARED_EXPONENTIAL, k_se, 0.0)
            + jnp.where(t == C.GAMMA_EXPONENTIAL, k_ge, 0.0)
            + jnp.where(t == C.PERIODIC, k_per, 0.0))


def sigma_cp(x, location, scale):
    """.5*(1 + tanh((location-x)/scale)) (GP.jl:481), written as
    sigmoid(2u) which is numerically stable for large |u| (jnp.tanh
    overflows to NaN around |u|~500 on some backends)."""
    return jax.nn.sigmoid(2.0 * (location - x) / scale)


def _combine(t, p, left, right, t1, t2):
    """Operator combination for slot type t (GP.jl:371-503)."""
    k_plus = left + right
    k_times = left * right
    s1 = sigma_cp(t1, p[0], C.CHANGEPOINT_SCALE)
    s2 = sigma_cp(t2, p[0], C.CHANGEPOINT_SCALE)
    k_cp = s1 * left * s2 + (1.0 - s1) * right * (1.0 - s2)
    return (jnp.where(t == C.PLUS, k_plus, 0.0)
            + jnp.where(t == C.TIMES, k_times, 0.0)
            + jnp.where(t == C.CHANGEPOINT, k_cp, 0.0))


def eval_cov(node_type, params, ts1, ts2, depth_cap: int):
    """Covariance matrix [N1, N2] of the encoded tree on ts1 x ts2.

    `params` must already be transformed to constrained space
    (see autogp_tpu.model.transform_params).
    """
    M = (1 << depth_cap) - 1
    t1 = ts1[:, None]
    t2 = ts2[None, :]
    bottom = M // 2  # slots >= bottom are at the deepest level: leaves only.
    stack = []
    for s in postorder(depth_cap):
        t = node_type[s]
        p = params[s]
        if s >= bottom:
            val = _leaf_cov(t, p, t1, t2)
        else:
            right = stack.pop()
            left = stack.pop()
            leaf_val = _leaf_cov(t, p, t1, t2)
            op_val = _combine(t, p, left, right, t1, t2)
            val = jnp.where(is_op_code(t), op_val, leaf_val)
        stack.append(val)
    assert len(stack) == 1
    return stack[0]


def compute_cov_matrix(node_type, params, noise, ts, depth_cap: int):
    """eval_cov + noise*I (GP.jl:666-668)."""
    K = eval_cov(node_type, params, ts, ts, depth_cap)
    K = 0.5 * (K + K.T)  # ChangePoint tanh is only approximately symmetric.
    return K + noise * jnp.eye(ts.shape[0], dtype=K.dtype)


# ---------------------------------------------------------------------------
# Masked multivariate-normal log density
# ---------------------------------------------------------------------------

def masked_gram(K, mask):
    """Replace masked-out rows/cols of K with the identity block.

    With padding at the tail, K' is block-diagonal [K_active, I], so its
    Cholesky factors and solves never mix active and padded entries.
    """
    m2 = mask[:, None] * mask[None, :]
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    return jnp.where(m2 > 0, K, eye)


def _chol(Km):
    """Cholesky dispatch: the batched Pallas factorization on TPU under
    vmap (ops/chol_pallas.py), XLA's otherwise. NOT reverse-mode
    differentiable (custom_vmap) — use only where AD never traverses it
    (inside custom_vjp rules)."""
    from autogp_tpu.ops import chol_pallas
    return chol_pallas.chol_psd(Km)


def mvn_logpdf_masked(K, x, mask):
    """log N(x_active; 0, K_active) with static shapes.

    K: [N,N] covariance *already* including observation noise on the active
    diagonal; x: [N] with zeros at padding; mask: [N] {0,1}.
    """
    Km = masked_gram(K, mask)
    L = jnp.linalg.cholesky(Km)
    n = jnp.sum(mask)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)) * mask)
    alpha = jax.scipy.linalg.solve_triangular(L, x * mask, lower=True)
    quad = jnp.sum(alpha * alpha)
    return -0.5 * (n * LOG2PI + logdet + quad)


def diag_fast(L, block: int = 128):
    """diag(L) without a strided gather.

    jnp.diagonal on a [N, N] HBM-resident matrix lowers to a stride-(N+1)
    gather (~1.6 ms at [64,1024,1024] on v5e); an eye-masked row reduce
    over static diagonal blocks is a plain vectorized read (~0.1 ms).
    """
    N = L.shape[-1]
    if N % block != 0:
        return jnp.diagonal(L, axis1=-2, axis2=-1)
    eye = jnp.eye(block, dtype=L.dtype)
    parts = [jnp.sum(L[..., k * block:(k + 1) * block,
                       k * block:(k + 1) * block] * eye, axis=-1)
             for k in range(N // block)]
    return jnp.concatenate(parts, axis=-1)


def tri_inv_blocked(L, base: int = 16, precision=HI):
    """Inverse of a lower-triangular matrix via recursive 2x2 blocking.

    inv([[A, 0], [B, C]]) = [[inv(A), 0], [-inv(C) B inv(A), inv(C)]].
    Built bottom-up: invert all [base,base] diagonal blocks by forward
    substitution (the only sequential part), then combine pairs level by
    level with batched matmuls — the N^3/3 FLOPs land on the MXU instead
    of XLA's sequential triangular-solve loop. Supports leading batch
    dims. N must be a power-of-two multiple of `base`.

    `precision` applies to the combine-level matmuls; pass GRAD_PRECISION
    when the inverse feeds only gradient cotangents.
    """
    *batch, N, _ = L.shape
    Lb = L.reshape((-1, N, N))
    P = Lb.shape[0]
    dt = L.dtype
    base = min(base, N)

    # --- base: [P, N/base, base, base] diagonal blocks ---------------------
    nb = N // base
    blocks = _diag_blocks(Lb, base)                       # [P, nb, b, b]
    inv = _tri_inv_base(blocks.reshape(P * nb, base, base),
                        precision=precision)
    inv = inv.reshape(P, nb, base, base)

    # --- combine pairs: s -> 2s ---------------------------------------------
    s = base
    while s < N:
        K2 = N // (2 * s)
        A = inv[:, 0::2]                                   # [P, K2, s, s]
        Cc = inv[:, 1::2]
        # off-diagonal [s, s] block of each 2s diagonal block of L,
        # via STATIC slices (XLA lowers these to cheap copies; the
        # previous jnp.diagonal formulation was a generic gather over
        # the full matrix at every level).
        B = jnp.stack([Lb[:, (2 * k + 1) * s:(2 * k + 2) * s,
                          2 * k * s:(2 * k + 1) * s]
                       for k in range(K2)], axis=1)        # [P, K2, s, s]
        X = -jnp.einsum("pkij,pkjl,pklm->pkim", Cc, B, A,
                        preferred_element_type=dt, precision=precision)
        top = jnp.concatenate([A, jnp.zeros_like(A)], axis=3)
        bot = jnp.concatenate([X, Cc], axis=3)
        inv = jnp.concatenate([top, bot], axis=2)          # [P, K2, 2s, 2s]
        s *= 2
    return inv.reshape(*batch, N, N)


def _diag_blocks(Lb, s):
    """[P, N/s, s, s] diagonal blocks of [P, N, N] (static slices)."""
    P, N, _ = Lb.shape
    K = N // s
    return jnp.stack([Lb[:, k * s:(k + 1) * s, k * s:(k + 1) * s]
                      for k in range(K)], axis=1)


def _tri_inv_base(A, precision=HI):
    """Unrolled forward-substitution inverse of [B, n, n] lower-tri."""
    B, n, _ = A.shape
    rows = []
    dinv = 1.0 / jnp.diagonal(A, axis1=1, axis2=2)        # [B, n]
    for i in range(n):
        if i == 0:
            row = jnp.zeros((B, n), A.dtype).at[:, 0].set(dinv[:, 0])
        else:
            W = jnp.stack(rows, axis=1)                    # [B, i, n]
            acc = jnp.einsum("bi,bin->bn", A[:, i, :i], W,
                             preferred_element_type=A.dtype,
                             precision=precision)
            row = (-acc).at[:, i].add(1.0) * dinv[:, i:i + 1]
            row = row * (jnp.arange(n) <= i)
        rows.append(row)
    return jnp.stack(rows, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mvn_logpdf_masked_cvjp(K, x, mask, pregram=False):
    """mvn_logpdf_masked with a closed-form VJP w.r.t. K.

    Reverse-mode through Cholesky + triangular solve makes XLA emit a
    chain of trsm/matmul programs; the analytic cotangent is simply
      dl/dK = 0.5 * (beta beta^T - K^-1),  beta = K^-1 x
    (masked to the active block). One cho_solve against the identity
    replaces the whole autodiff chain. Semantics identical to
    mvn_logpdf_masked (Model.jl:136 mvnormal logpdf).

    The primal and fwd rule run the SAME fused Pallas factor+solve on
    TPU (safe here: custom_vjp shields both from AD), so the value under
    jax.grad is bit-identical to the primal. The backward pass forms
    K^-1 via the blocked triangular inverse at GRAD_PRECISION (the
    cotangent never feeds an LML value).

    `pregram=True` asserts K is ALREADY the padded-identity gram (the
    Pallas assembly kernels emit it directly), skipping a redundant
    full-matrix masking pass (~1 HBM round trip of K per eval).
    """
    Km = K if pregram else masked_gram(K, mask)
    from autogp_tpu.ops import chol_pallas
    # Value-only entry: the diag variant never assembles the [N,N]
    # factor (diag values bitwise identical to diag_fast(L), so the
    # value stays bit-identical to the fwd rule below, which DOES need
    # L as a residual).
    d, alpha = chol_pallas.chol_solve_diag_psd(Km, x * mask)
    n = jnp.sum(mask)
    logdet = 2.0 * jnp.sum(jnp.log(d) * mask)
    return -0.5 * (n * LOG2PI + logdet + jnp.sum(alpha * alpha))


def _use_blocked_inv(N: int) -> bool:
    return N >= 64 and (N & (N - 1)) == 0


def solve_lower_blocked(L, x, block: int = 128):
    """L^-1 x via block forward substitution with pre-inverted diagonal
    blocks.

    XLA's triangular_solve with one RHS is a latency-bound sequential
    substitution over all N rows (~9 ms at [64,1024,1024] on v5e), and
    even [128,128] trsms stay latency-bound. Instead the nb diagonal
    blocks are inverted up-front in one BATCHED blocked tri-inverse
    (parallel MXU work), leaving only nb sequential matvecs. Falls back
    to the plain solve when N doesn't divide into blocks.
    """
    N = L.shape[0]
    if N % block != 0 or N <= block:
        return jax.scipy.linalg.solve_triangular(L, x, lower=True)
    nb = N // block
    D = jnp.stack([L[k * block:(k + 1) * block, k * block:(k + 1) * block]
                   for k in range(nb)])                   # [nb, b, b]
    Wd = tri_inv_blocked(D)
    alpha = jnp.zeros_like(x)
    for k in range(nb):
        lo, hi = k * block, (k + 1) * block
        rhs = x[lo:hi]
        if k > 0:
            rhs = rhs - jnp.matmul(L[lo:hi, :lo], alpha[:lo], precision=HI)
        alpha = alpha.at[lo:hi].set(jnp.matmul(Wd[k], rhs, precision=HI))
    return alpha


def kinv_from_linv(Linv, block: int = 128, precision=HI,
                   lower_only: bool = False):
    """K^-1 = Linv^T Linv exploiting Linv's lower-triangular structure.

    The dense einsum contracts over all N rows, but Linv[k, c] = 0 for
    k < c, so block (bi, bj) with bj <= bi only needs rows k >= bi: with
    8 blocks of 128 that is ~4x fewer MACs than the dense product
    (measured 4.2 ms -> ~1.3 ms at [64,1024,1024] f32 on v5e). The upper
    triangle is mirrored from symmetry — or zero-filled with
    `lower_only=True` for consumers that read only the lower blocks (the
    symmetric backward tape kernel). Supports a leading batch dim.
    """
    *batch, N, _ = Linv.shape
    if N % block != 0 or N == block:
        return jnp.matmul(jnp.swapaxes(Linv, -1, -2), Linv,
                          precision=precision)
    Lb = Linv.reshape((-1, N, N))
    nb = N // block
    blocks = [[None] * nb for _ in range(nb)]
    for i in range(nb):
        k0 = i * block
        # rows k >= bi cover every nonzero term for all j <= i.
        R = Lb[:, k0:, :]
        for j in range(i + 1):
            Bij = jnp.einsum(
                "pki,pkj->pij", R[:, :, i * block:(i + 1) * block],
                R[:, :, j * block:(j + 1) * block],
                preferred_element_type=Linv.dtype, precision=precision)
            blocks[i][j] = Bij
            if j < i:
                blocks[j][i] = (jnp.zeros_like(Bij) if lower_only
                                else jnp.swapaxes(Bij, -1, -2))
    out = jnp.concatenate(
        [jnp.concatenate(row, axis=-1) for row in blocks], axis=-2)
    return out.reshape(*batch, N, N)


def _mvn_logpdf_masked_fwd(K, x, mask, pregram=False):
    # Identical computation to the primal (fused Pallas factor+solve on
    # TPU): the value seen under jax.grad is bit-identical to model.lml,
    # so cached particle LMLs never drift from reweight's recomputation.
    Km = K if pregram else masked_gram(K, mask)
    from autogp_tpu.ops import chol_pallas
    L, alpha = chol_pallas.chol_solve_psd(Km, x * mask)
    n = jnp.sum(mask)
    logdet = 2.0 * jnp.sum(jnp.log(diag_fast(L)) * mask)
    out = -0.5 * (n * LOG2PI + logdet + jnp.sum(alpha * alpha))
    return out, (L, alpha, mask)


def _mvn_logpdf_masked_bwd(pregram, res, g):
    L, alpha, mask = res
    N = L.shape[0]
    if _use_blocked_inv(N):
        # Blocked triangular inverse — all MXU work, no sequential
        # triangular solves. Gradient-only: runs at GRAD_PRECISION.
        Linv = tri_inv_blocked(L, precision=GRAD_PRECISION)
        beta = jnp.matmul(Linv.T, alpha, precision=GRAD_PRECISION)
        Kinv = kinv_from_linv(Linv, precision=GRAD_PRECISION)
    else:
        beta = jax.scipy.linalg.solve_triangular(L, alpha, lower=True,
                                                 trans=1)
        eye = jnp.eye(N, dtype=L.dtype)
        Kinv = jax.scipy.linalg.cho_solve((L, True), eye)
    m2 = mask[:, None] * mask[None, :]
    Kbar = (0.5 * g) * (beta[:, None] * beta[None, :] - Kinv) * m2
    xbar = (-g) * beta
    return Kbar, xbar, jnp.zeros_like(mask)


mvn_logpdf_masked_cvjp.defvjp(_mvn_logpdf_masked_fwd,
                              _mvn_logpdf_masked_bwd)


def mvn_logpdf(mu, K, x):
    """Dense MVN logpdf (Distributions.MvNormal semantics)."""
    L = jnp.linalg.cholesky(K)
    d = x - mu
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    alpha = jax.scipy.linalg.solve_triangular(L, d, lower=True)
    return -0.5 * (x.shape[0] * LOG2PI + logdet + jnp.sum(alpha * alpha))


def lml_masked(node_type, params, noise, ts, xs, mask, depth_cap: int):
    """Log marginal likelihood of (ts, xs) under the encoded tree.

    `noise` is the transformed observation-noise variance (incl. jitter).
    Padded entries (mask==0) contribute nothing.
    """
    K = eval_cov(node_type, params, ts, ts, depth_cap)
    K = 0.5 * (K + K.T)
    K = K + noise * jnp.eye(ts.shape[0], dtype=K.dtype)
    return mvn_logpdf_masked(K, xs, mask)


# ---------------------------------------------------------------------------
# Posterior predictive (GP.jl:731-758)
# ---------------------------------------------------------------------------

def posterior_mvn_masked(node_type, params, noise, ts, xs, mask, ts_pred,
                         depth_cap: int, noise_pred=None):
    """Conditional MVN of X(ts_pred) | X(ts_active) = xs_active.

    Same value as Distributions.MvNormal(node, noise, ts, xs, ts_pred) at
    GP.jl:731-758, but computed through the JOINT Cholesky instead of the
    explicit Schur complement: with
        chol([[K11m, K12m], [K21m, K22 + noise_pred I]]) = [[L11, 0],
                                                            [L21, L22]]
    the conditional covariance is exactly L22 L22^T — PSD by construction.
    The reference's direct K22 - K21 K11^-1 K12 suffers catastrophic
    cancellation in float32 on dense prediction grids (measured
    eigenvalues down to -3.6 on an O(4) scale), NaN-ing every downstream
    factorization; the joint form is backward stable.
    """
    if noise_pred is None:
        noise_pred = noise
    n = ts.shape[0]
    p = ts_pred.shape[0]
    z = jnp.concatenate([ts, ts_pred])
    K = eval_cov(node_type, params, z, z, depth_cap)
    K = 0.5 * (K + K.T)
    noise_diag = jnp.concatenate([
        jnp.full((n,), noise, K.dtype),
        jnp.full((p,), noise_pred, K.dtype)])
    J = K + jnp.diag(noise_diag)
    # mask the training block: padded rows/cols -> identity.
    m_ext = jnp.concatenate([mask, jnp.ones((p,), mask.dtype)])
    J = masked_gram(J, m_ext)
    L = jnp.linalg.cholesky(J)
    L11 = L[:n, :n]
    L21 = L[n:, :n]
    L22 = L[n:, n:]
    alpha = jax.scipy.linalg.solve_triangular(L11, xs * mask, lower=True)
    mu = jnp.matmul(L21, alpha, precision=HI)
    cov = jnp.matmul(L22, L22.T, precision=HI)
    cov = 0.5 * (cov + cov.T)
    return mu, cov


def train_cholesky_masked(node_type, params, noise, ts, xs, mask,
                          depth_cap: int):
    """Training-block factor (L, alpha) of the joint-Cholesky posterior.

    L = chol(masked_gram(K(ts,ts) + noise I)) and alpha = L^-1 (xs*mask)
    are exactly the (L11, alpha) blocks of posterior_mvn_masked's joint
    factor — they depend only on (structure, params, noise, data), NOT on
    the prediction grid, so callers that predict repeatedly against
    unchanged data (the online driver predicts every step, api.jl:633)
    can compute them once and reuse them across predict calls.
    """
    n = ts.shape[0]
    K = eval_cov(node_type, params, ts, ts, depth_cap)
    K = 0.5 * (K + K.T)
    Km = masked_gram(K + noise * jnp.eye(n, dtype=K.dtype), mask)
    L = jnp.linalg.cholesky(Km)
    alpha = jax.scipy.linalg.solve_triangular(L, xs * mask, lower=True)
    return L, alpha


def posterior_marginals_from_factor(node_type, params, L, alpha, mask,
                                    ts, ts_pred, noise_pred,
                                    depth_cap: int):
    """Marginal posterior (mu, std) at ts_pred from a cached train factor.

    Blockwise identical to the joint Cholesky in posterior_mvn_masked:
    with V = L^-1 (K(ts,ts_pred)*mask), mu = V^T alpha and
    var = diag(K(ts_pred,ts_pred)) + noise_pred - colsum(V^2) — the
    trailing-block downdate the joint factorization performs, NOT the
    explicit-inverse Schur form (V comes from a triangular solve). Only
    marginal variances are formed, so the float32 indefiniteness that
    rules out the explicit full-covariance Schur complement (see
    posterior_mvn_masked) reduces to a clip at 0 on the diagonal.
    """
    Kpt = eval_cov(node_type, params, ts_pred, ts, depth_cap)
    Kpt = Kpt * mask[None, :]
    V = jax.scipy.linalg.solve_triangular(L, Kpt.T, lower=True)
    mu = jnp.matmul(V.T, alpha, precision=HI)
    Kpp = eval_cov(node_type, params, ts_pred, ts_pred, depth_cap)
    var = (jnp.diagonal(Kpp) + noise_pred
           - jnp.sum(V * V, axis=0))
    std = jnp.sqrt(jnp.clip(var, 0.0, None))
    return mu, std


def posterior_logpdf_masked(node_type, params, noise, ts, xs, mask,
                            ts_pred, y_pred, depth_cap: int,
                            noise_pred=None):
    """Log density of y_pred under the posterior predictive MVN.

    Same conditional as posterior_mvn_masked (joint-Cholesky form), but
    the logpdf is evaluated ON DEVICE and only the scalar crosses the
    host link — predict_proba previously shipped the full [p,p]
    covariance per particle over the relay just to take one logpdf
    (api.jl:686-699)."""
    mu, cov = posterior_mvn_masked(node_type, params, noise, ts, xs, mask,
                                   ts_pred, depth_cap,
                                   noise_pred=noise_pred)
    return mvn_logpdf(mu, cov, y_pred)


# ---------------------------------------------------------------------------
# Joint posterior over latent GP-sum components (GP.jl:904-993)
# ---------------------------------------------------------------------------

def infer_gp_sum_from_blocks(Ktt, Ktp, Kpp, noise, xs, mask,
                             noise_pred=None):
    """Joint posterior over [F_1(T*),...,F_m(T*), X(T*)] | X(T)=x.

    Ktt: [m,n,n], Ktp: [m,n,p], Kpp: [m,p,p] are the per-component
    covariance blocks (already computed from each kernel); `mask` masks the
    training block for padding. Returns (mu [(m+1)p], cov [(m+1)p,(m+1)p]).
    Mirrors GP.jl:904-993 including symmetrization and the 1e-8 jitter.
    """
    if noise_pred is None:
        noise_pred = noise
    m, n, p = Ktp.shape
    Ktt = 0.5 * (Ktt + jnp.swapaxes(Ktt, 1, 2))
    Kpp = 0.5 * (Kpp + jnp.swapaxes(Kpp, 1, 2))
    S_tt = jnp.sum(Ktt, axis=0)
    S_tp = jnp.sum(Ktp, axis=0)
    S_pp = jnp.sum(Kpp, axis=0)

    d_a = m * p + p
    # Sigma_aa: latent blocks + X(T*) row/col.
    Saa = jnp.zeros((d_a, d_a), dtype=Ktt.dtype)
    for i in range(m):
        sl = slice(i * p, (i + 1) * p)
        Saa = Saa.at[sl, sl].set(Kpp[i])
        Saa = Saa.at[sl, m * p:].set(Kpp[i])
        Saa = Saa.at[m * p:, sl].set(Kpp[i].T)
    Saa = Saa.at[m * p:, m * p:].set(S_pp + noise_pred * jnp.eye(p, dtype=Kpp.dtype))

    # Sigma_ab: cov of a-block with X(T).
    Sab = jnp.concatenate(
        [jnp.swapaxes(Ktp, 1, 2).reshape(m * p, n), S_tp.T], axis=0)
    Sab = Sab * mask[None, :]

    Sbb = S_tt + noise * jnp.eye(n, dtype=Ktt.dtype)
    Sbb = masked_gram(Sbb, mask)
    Saa = 0.5 * (Saa + Saa.T)
    # The reference adds the 1e-8 jitter AFTER the Schur complement
    # (GP.jl:993); here it goes on Saa first so the joint gram is PD —
    # the joint is otherwise exactly singular (X(T*) = sum_i F_i(T*) +
    # noise), and the joint-Cholesky form below needs chol([[Sbb, Sab^T],
    # [Sab, Saa]]). Same 1e-8-level result in float64; float32 needs a
    # jitter above its noise floor for the pivots to stay positive.
    # Unlike the explicit Saa - Sab Sbb^-1 Sab^T this cannot go
    # indefinite (see posterior_mvn_masked).
    jit = (C.SUM_GP_JITTER if Saa.dtype == jnp.float64
           else max(C.SUM_GP_JITTER, C.SUM_GP_JITTER_F32))
    Saa = Saa + jit * jnp.eye(d_a, dtype=Saa.dtype)

    J = jnp.concatenate([
        jnp.concatenate([Sbb, Sab.T], axis=1),
        jnp.concatenate([Sab, Saa], axis=1)], axis=0)
    L = jnp.linalg.cholesky(J)
    L11 = L[:n, :n]
    L21 = L[n:, :n]
    L22 = L[n:, n:]
    alpha = jax.scipy.linalg.solve_triangular(L11, xs * mask, lower=True)
    mu = jnp.matmul(L21, alpha, precision=HI)
    cov = jnp.matmul(L22, L22.T, precision=HI)
    cov = 0.5 * (cov + cov.T)
    return mu, cov


def normal_quantile(q, mu, sigma):
    """Marginal Gaussian quantiles (GP.jl:1006-1012)."""
    from scipy.stats import norm
    return norm.ppf(q, loc=mu, scale=sigma)
