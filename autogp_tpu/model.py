"""Generative model: PCFG prior over kernel trees + MVN likelihood.

Mirrors src/Model.jl of the reference:
  - whitened parameters z ~ Normal(0,1) mapped to constrained space by
    log-normal / logit-normal transforms (Model.jl:24-63);
  - recursive prior over tree structures with per-depth node distributions
    and changepoint gating (Model.jl:66-128);
  - joint density = tree prior + Normal(0,1) noise prior + MVN likelihood
    with noise = transform(z) + 1e-5 jitter (Model.jl:130-138).

Everything operates on the tensor trace (node_type[M] int32, params[M,3])
and is jit/vmap-friendly; tree sampling is a static loop over heap slots in
BFS order.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import config as C
from autogp_tpu import gp_math

LOG2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Parameter transforms (Model.jl:24-63)
# ---------------------------------------------------------------------------

def transform_log_normal(z, mu, sigma):
    return jnp.exp(mu + sigma * z)


def untransform_log_normal(x, mu, sigma):
    return (np.log(x) - mu) / sigma


def transform_logit_normal(z, scale, mu, sigma):
    return scale / (1.0 + jnp.exp(-(mu + sigma * z)))


def untransform_logit_normal(x, scale, mu, sigma):
    return (np.log(x / (scale - x)) - mu) / sigma


def transform_param(field: str, z, config: C.GPConfig):
    """Scalar transform by field name (Model.jl:35-48)."""
    if field == "gamma":
        p = config.prior["gamma"]
        return transform_logit_normal(z, p["scale"], p["mu"], p["sigma"])
    if field == "period":
        p = config.prior["period"]
        return transform_log_normal(z, p["mu"], p["sigma"])
    p = config.prior["wildcard"]
    return transform_log_normal(z, p["mu"], p["sigma"])


def untransform_param(field: str, x, config: C.GPConfig):
    """Scalar inverse transform by field name (Model.jl:50-63)."""
    if field == "gamma":
        p = config.prior["gamma"]
        return untransform_logit_normal(x, p["scale"], p["mu"], p["sigma"])
    if field == "period":
        p = config.prior["period"]
        return untransform_log_normal(x, p["mu"], p["sigma"])
    p = config.prior["wildcard"]
    return untransform_log_normal(x, p["mu"], p["sigma"])


def transform_params(node_type, params_z, ttable):
    """Vectorized whitened->constrained transform over the whole heap.

    node_type: [M]; params_z: [M,3]; ttable: [4,3] rows (mu, sigma, scale)
    indexed by transform kind. Returns [M,3] constrained params (0 at
    unused slots).
    """
    kind = jnp.asarray(C.PARAM_KIND)[node_type]          # [M,3]
    mu = ttable[kind, 0]
    sigma = ttable[kind, 1]
    scale = ttable[kind, 2]
    lin = mu + sigma * params_z
    lognorm = jnp.exp(lin)
    logit = scale / (1.0 + jnp.exp(-lin))
    out = jnp.where(kind == C.KIND_GAMMA, logit, lognorm)
    return jnp.where(kind > 0, out, 0.0)


def transform_noise(noise_z, config: C.GPConfig):
    """Observation-noise variance incl. model jitter (Model.jl:133-134)."""
    return transform_param("noise", noise_z, config) + C.MODEL_JITTER


# ---------------------------------------------------------------------------
# Static tables for the tree prior
# ---------------------------------------------------------------------------

def normal_logpdf(z):
    return -0.5 * (z * z + LOG2PI)


class PriorTables(NamedTuple):
    """Static (numpy) tables derived from a GPConfig."""
    node_dist: jnp.ndarray       # [3, 8] leaf / nocp / cp distributions
    log_node_dist: jnp.ndarray   # [3, 8]
    ttable: jnp.ndarray          # [4, 3] transform params
    arity: jnp.ndarray           # [NUM_TYPES]
    depths: jnp.ndarray          # [M] 1-based slot depths
    ancestors: jnp.ndarray       # [M, D]
    depth_cap: int
    changepoints: bool


def prior_tables(config: C.GPConfig) -> PriorTables:
    nd = config.node_dist_table()
    with np.errstate(divide="ignore"):
        log_nd = np.log(nd)
    D = config.depth_cap
    return PriorTables(
        node_dist=jnp.asarray(nd),
        log_node_dist=jnp.asarray(log_nd),
        ttable=jnp.asarray(config.transform_table()),
        arity=jnp.asarray(C.PARAM_ARITY),
        depths=jnp.asarray(gp_math.slot_depths(D)),
        ancestors=jnp.asarray(gp_math.ancestor_table(D)),
        depth_cap=D,
        changepoints=config.changepoints,
    )


def _dist_row(depth, cp_allowed, tables: PriorTables, leaf_cap=None):
    """Index of the node distribution row for a slot (Model.jl:66-76).

    `leaf_cap` overrides the depth at which the leaf-only row applies
    (used when scoring a tree under a *shallower* config than the heap it
    is embedded in, e.g. depth-annealed SMC)."""
    at_cap = depth == (tables.depth_cap if leaf_cap is None else leaf_cap)
    row = jnp.where(at_cap, 0, jnp.where(cp_allowed, 2, 1))
    return row


def in_subtree(slot_idx, root_idx, tables: PriorTables):
    """Whether static slot `slot_idx` lies in the subtree of traced root."""
    return jnp.any(tables.ancestors[slot_idx] == root_idx)


# ---------------------------------------------------------------------------
# Tree prior: log density (Model.jl:78-128)
# ---------------------------------------------------------------------------

def tree_prior_logpdf(node_type, params_z, tables: PriorTables,
                      root_idx=0, root_cp_allowed=None, leaf_cap=None):
    """Log density of the subtree rooted at `root_idx` under the PCFG prior.

    With root_idx=0 and root_cp_allowed=config.changepoints this is the full
    tree prior. `root_cp_allowed` is a traced bool (changepoint gating for
    subtree proposals, inference_rejuv_tree_sr.jl:27-39). `leaf_cap`
    optionally scores under a shallower max_depth than the heap size.
    """
    M = node_type.shape[0]
    if root_cp_allowed is None:
        root_cp_allowed = jnp.asarray(tables.changepoints)

    active = node_type > 0
    # cp_allowed per slot: root uses the gate; otherwise parent must be CP.
    parent_idx = np.maximum(0, (np.arange(M) - 1) // 2)
    parent_type = node_type[jnp.asarray(parent_idx)]
    is_root = jnp.arange(M) == root_idx
    cp_allowed = jnp.where(is_root, root_cp_allowed,
                           parent_type == C.CHANGEPOINT)

    rows = _dist_row(tables.depths, cp_allowed, tables, leaf_cap=leaf_cap)
    # Code 9 (WhiteNoise) never appears under the prior; clamp for gather.
    code_idx = jnp.clip(node_type - 1, 0, 7)
    logp_type = tables.log_node_dist[rows, code_idx]

    # Continuous parameters: z ~ Normal(0,1) per active param slot.
    ar = tables.arity[node_type]                     # [M]
    slot_mask = (jnp.arange(C.MAX_PARAMS)[None, :] < ar[:, None])
    logp_params = jnp.sum(normal_logpdf(params_z) * slot_mask, axis=1)

    member = jnp.any(tables.ancestors == root_idx, axis=1)
    contrib = jnp.where(active & member, logp_type + logp_params, 0.0)
    return jnp.sum(contrib)


# ---------------------------------------------------------------------------
# Tree prior: sampling (Model.jl:78-128)
# ---------------------------------------------------------------------------

def sample_subtree(key, node_type, params_z, tables: PriorTables,
                   root_idx=0, root_cp_allowed=None):
    """Resample the subtree rooted at traced `root_idx` from the prior.

    Slots outside the subtree keep their current values; slots inside are
    overwritten (inactive descendants get node_type 0 / params 0). Returns
    (node_type', params_z'). Works under vmap/jit: the BFS dependence is
    only parent -> child, so the loop runs over the depth_cap LEVELS with
    each level's slots sampled as one batch (program size O(depth_cap),
    not O(2^depth_cap) — the per-slot form dominated SMC-round compiles).
    """
    D = tables.depth_cap
    if root_cp_allowed is None:
        root_cp_allowed = jnp.asarray(tables.changepoints)

    keys = jax.random.split(key, 2 * D)
    new_type = jnp.zeros_like(node_type)
    new_params = jnp.zeros_like(params_z)

    for lvl in range(D):
        lo, hi = (1 << lvl) - 1, (1 << (lvl + 1)) - 1   # slots [lo, hi)
        W = hi - lo
        if lvl == 0:
            parent_t = jnp.full((1,), C.INACTIVE, node_type.dtype)
        else:
            plo = (1 << (lvl - 1)) - 1
            parent_t = jnp.repeat(new_type[plo:lo], 2)
        slots = jnp.arange(lo, hi)
        member = jnp.any(tables.ancestors[lo:hi] == root_idx, axis=1)
        is_root = slots == root_idx
        # Active inside the subtree: the root itself, or child of an op.
        active = member & (is_root | is_op_parent(parent_t))
        cp_allowed = jnp.where(is_root, root_cp_allowed,
                               parent_t == C.CHANGEPOINT)
        row = _dist_row(tables.depths[lo:hi], cp_allowed, tables)
        logits = tables.log_node_dist[row]               # [W, 8]
        t = jax.random.categorical(keys[2 * lvl], logits) + 1
        t = jnp.where(active, t, 0).astype(node_type.dtype)
        z = jax.random.normal(keys[2 * lvl + 1], (W, C.MAX_PARAMS),
                              params_z.dtype)
        ar = tables.arity[t]
        z = jnp.where(jnp.arange(C.MAX_PARAMS)[None, :] < ar[:, None],
                      z, 0.0)
        new_type = new_type.at[lo:hi].set(t)
        new_params = new_params.at[lo:hi].set(z)

    member_all = jnp.any(tables.ancestors == root_idx, axis=1)
    out_type = jnp.where(member_all, new_type, node_type)
    out_params = jnp.where(member_all[:, None], new_params, params_z)
    return out_type, out_params


def is_op_parent(t):
    return (t == C.PLUS) | (t == C.TIMES) | (t == C.CHANGEPOINT)


def sample_tree(key, tables: PriorTables, dtype=jnp.float32):
    """Sample a full tree from the prior."""
    M = (1 << tables.depth_cap) - 1
    node_type = jnp.zeros((M,), dtype=jnp.int32)
    params_z = jnp.zeros((M, C.MAX_PARAMS), dtype=dtype)
    return sample_subtree(key, node_type, params_z, tables, root_idx=0)


# ---------------------------------------------------------------------------
# Joint score (Model.jl:130-138)
# ---------------------------------------------------------------------------

def lml(node_type, params_z, noise_z, ts, xs, mask, config: C.GPConfig,
        tables: PriorTables, pallas=None):
    """Log marginal likelihood for one particle.

    `pallas=None` auto-selects the fused Pallas path on TPU float32:
    tape-driven assembly with its custom-VJP gradient kernel
    (ops/cov_pallas*.py), the batched Pallas Cholesky under vmap, and the
    closed-form MVN-logpdf VJP. CPU/x64 uses the XLA stack-machine
    evaluator with plain autodiff.
    """
    params_t = transform_params(node_type, params_z, tables.ttable)
    noise = transform_noise(noise_z, config)
    if pallas is None:
        from autogp_tpu import backend
        pallas = backend.use_pallas()
    if pallas:
        from autogp_tpu.ops import cov_pallas_vjp
        if gp_math._use_blocked_inv(ts.shape[0]):
            # Fully fused VJP: the backward kernel forms the Kbar
            # cotangent in VMEM from (K^-1, beta, g) — no [N,N] Kbar
            # array in HBM.
            return cov_pallas_vjp.lml_tape_fused(node_type, params_t,
                                                 noise, ts, xs, mask,
                                                 tables.depth_cap)
        K = cov_pallas_vjp.cov_matrix_diff(node_type, params_t, noise, ts,
                                           mask, tables.depth_cap)
        # The assembly kernel already emits the padded-identity gram;
        # pregram skips a redundant full-matrix masking pass.
        return gp_math.mvn_logpdf_masked_cvjp(K, xs, mask, True)
    return gp_math.lml_masked(node_type, params_t, noise, ts, xs, mask,
                              tables.depth_cap)


def assemble_K0(node_type, params_z, ts, mask, config: C.GPConfig,
                tables: PriorTables, pallas=None):
    """Noise-free masked gram K0 (padded rows/cols = identity).

    The noise-HMC leapfrog only shifts the active diagonal
    (K(nz) = K0 + noise(nz) * diag(mask)), so K0 is constant along a
    trajectory and is assembled ONCE (hmc.hmc_noise_step); each step then
    pays only the Cholesky, not the covariance assembly.
    """
    if pallas is None:
        from autogp_tpu import backend
        pallas = backend.use_pallas()
    params_t = transform_params(node_type, params_z, tables.ttable)
    zero = jnp.asarray(0.0, params_z.dtype)
    if pallas:
        from autogp_tpu.ops import cov_pallas
        # lower_only: K0 feeds only the lower-reading Cholesky in
        # lml_value_and_noise_grad_from_K0.
        return cov_pallas.cov_matrix_tape(node_type, params_t, zero, ts,
                                          mask, tables.depth_cap,
                                          lower_only=True)
    K = gp_math.eval_cov(node_type, params_t, ts, ts, tables.depth_cap)
    K = 0.5 * (K + K.T)
    return gp_math.masked_gram(K, mask)


def lml_value_and_noise_grad_from_K0(K0, noise_z, xs, mask,
                                     config: C.GPConfig):
    """(lml, d lml/d noise_z) given the precomputed noise-free gram.

    Same math as lml_value_and_noise_grad's blocked-inverse branch;
    assembly is hoisted out of the leapfrog loop (see assemble_K0).
    """
    N = K0.shape[0]
    noise = transform_noise(noise_z, config)
    eye = jnp.eye(N, dtype=K0.dtype)
    Km = K0 + (noise * mask) * eye
    # Fused factor+solve for the VALUE (same algorithm as model.lml's
    # primal); the gradient stats (beta, ||L^-1||_F^2) come from the
    # fused kinv_pallas.linv_stats kernel, whose contractions run at the
    # GRAD_PRECISION class (in-kernel bf16x3; gradient-only per
    # gp_math.py:36-53).
    from autogp_tpu.ops import chol_pallas, kinv_pallas
    # wd variant: the factorization's per-panel diagonal-block inverses
    # feed the stats kernel directly (saves its 0.88 ms/batch internal
    # tri-inverse — this runs once per NOISE leapfrog, L_noise times per
    # HMC sweep). L/alpha (and hence the value) are bit-identical to
    # chol_solve_psd's.
    L, alpha, wd = chol_pallas.chol_solve_wd_psd(Km, xs * mask)
    beta, fro2 = kinv_pallas.linv_stats_wd(L, alpha, wd)
    n = jnp.sum(mask)
    logdet = 2.0 * jnp.sum(jnp.log(gp_math.diag_fast(L)) * mask)
    val = -0.5 * (n * LOG2PI + logdet + jnp.sum(alpha * alpha))
    tr_active = fro2 - (N - n)
    dlml_dnoise = -0.5 * (tr_active - jnp.sum(beta * beta))
    p = config.prior["wildcard"]
    dnoise_dz = p["sigma"] * (noise - C.MODEL_JITTER)
    return val, dlml_dnoise * dnoise_dz


def lml_value_and_noise_grad(node_type, params_z, noise_z, ts, xs, mask,
                             config: C.GPConfig, tables: PriorTables,
                             pallas=None):
    """(lml, d lml / d noise_z) without reverse-mode AD.

    The noise-HMC leapfrog (inference_smc_anneal_data.jl:66) only needs
    the scalar noise gradient, but reverse mode through the covariance
    pays the full assembly-backward kernel. Analytically, with
    Km = K + noise*I (masked):
        d lml/d noise = -1/2 (tr_active(Km^-1) - beta^T beta),
        beta = Km^-1 x,   tr_active(Km^-1) = ||Linv||_F^2 - (N - n)
    (padded columns of Linv are unit basis vectors), then the chain rule
    through the log-normal noise transform. Falls back to autodiff when
    the blocked inverse isn't applicable.
    """
    N = ts.shape[0]
    if pallas is None:
        from autogp_tpu import backend
        pallas = backend.use_pallas()
    if not gp_math._use_blocked_inv(N):
        return jax.value_and_grad(
            lambda z: lml(node_type, params_z, z, ts, xs, mask, config,
                          tables, pallas=pallas))(noise_z)

    params_t = transform_params(node_type, params_z, tables.ttable)
    noise = transform_noise(noise_z, config)
    if pallas:
        from autogp_tpu.ops import cov_pallas
        K = cov_pallas.cov_matrix_tape(node_type, params_t, noise, ts,
                                       mask, tables.depth_cap,
                                       lower_only=True)
        Km = K  # masked assembly already produces the padded-identity gram
    else:
        K = gp_math.eval_cov(node_type, params_t, ts, ts, tables.depth_cap)
        K = 0.5 * (K + K.T)
        K = K + noise * jnp.eye(N, dtype=K.dtype)
        Km = gp_math.masked_gram(K, mask)
    from autogp_tpu.ops import chol_pallas
    L, alpha = chol_pallas.chol_solve_psd(Km, xs * mask)
    Linv = gp_math.tri_inv_blocked(L, precision=gp_math.GRAD_PRECISION)
    n = jnp.sum(mask)
    logdet = 2.0 * jnp.sum(jnp.log(gp_math.diag_fast(L)) * mask)
    val = -0.5 * (n * LOG2PI + logdet + jnp.sum(alpha * alpha))
    beta = jnp.matmul(Linv.T, alpha, precision=gp_math.GRAD_PRECISION)
    tr_active = jnp.sum(Linv * Linv) - (N - n)
    dlml_dnoise = -0.5 * (tr_active - jnp.sum(beta * beta))
    # d noise / d noise_z: log-normal transform + constant jitter.
    p = config.prior["wildcard"]
    dnoise_dz = p["sigma"] * (noise - C.MODEL_JITTER)
    return val, dlml_dnoise * dnoise_dz


def joint_score(node_type, params_z, noise_z, ts, xs, mask,
                config: C.GPConfig, tables: PriorTables):
    """log p(tree, noise, xs) — the Gen trace score."""
    lp_tree = tree_prior_logpdf(node_type, params_z, tables)
    lp_noise = normal_logpdf(noise_z)
    return lp_tree + lp_noise + lml(node_type, params_z, noise_z, ts, xs,
                                    mask, config, tables)


def generate(key, ts, xs, mask, config: C.GPConfig, tables: PriorTables,
             noise_z_constraint=None, dtype=jnp.float32):
    """Gen.generate(model, (ts, config), {xs[, noise]}) for one particle.

    Samples tree (and noise unless constrained) from the prior; the
    generate weight is the log density of the constrained choices:
    LML (+ noise prior if noise is constrained).
    Returns (node_type, params_z, noise_z, weight).
    """
    k_tree, k_noise = jax.random.split(key)
    node_type, params_z = sample_tree(k_tree, tables, dtype=dtype)
    if noise_z_constraint is None:
        noise_z = jax.random.normal(k_noise, (), dtype=dtype)
        w_noise = 0.0
    else:
        noise_z = jnp.asarray(noise_z_constraint, dtype=dtype)
        w_noise = normal_logpdf(noise_z)
    w = w_noise + lml(node_type, params_z, noise_z, ts, xs, mask, config,
                      tables)
    return node_type, params_z, noise_z, w
