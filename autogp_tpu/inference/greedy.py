"""Greedy AIC-driven kernel structure search (reference: src/Greedy.jl).

CKS-style search (Kim & Teh 2018, Alg. 2): start from the best single base
kernel, then repeatedly try every replace-leaf and insert-operator
extension, MAP-optimize each candidate's parameters with a line-searched
gradient ascent (Gen.map_optimize analog), and keep the argmin-AIC
candidate while it improves.

TPU mapping: candidate structures are enumerated host-side (trees are
tiny), padded to a power-of-two batch, and optimized in parallel with one
vmapped jitted program — the reference's `Threads.@threads` over candidates
(Greedy.jl:402,427) becomes the candidate axis of a single XLA program.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import config as C
from autogp_tpu import model as M
from autogp_tpu import tree as T
from autogp_tpu.inference import smc

MAX_OPT = 500          # update_and_optimize_structure (Greedy.jl:363)
MAX_OPT_MCMC = 10      # greedy_mcmc_rejuvenate (Greedy.jl:57)


# ---------------------------------------------------------------------------
# MAP optimization (Gen.map_optimize analog)
# ---------------------------------------------------------------------------

def _score_fn(nt, pz, nz, data, cfg, tables, pmask):
    lp_params = jnp.sum(M.normal_logpdf(pz) * pmask)
    lp_noise = M.normal_logpdf(nz)
    # The Pallas assembly is differentiable via its custom-VJP kernel.
    lml = M.lml(nt, pz, nz, data.ts, data.xs, data.mask, cfg, tables)
    return lp_params + lp_noise + lml, lml


def map_optimize(nt, pz, nz, data, cfg, tables, infer_noise: bool,
                 max_rounds: int = MAX_OPT, max_step: float = 0.1,
                 tau: float = 0.5, min_step: float = 1e-12):
    """Repeated line-searched gradient-ascent steps on the selected
    continuous parameters until the score stops improving
    (Greedy.jl:358-381 with Gen.map_optimize's backtracking rule).

    Implemented as a single flat probe loop (one score/grad eval per
    iteration): an accepted probe applies the step and resets the step
    size to `max_step` (= a new map_optimize round in Gen); a rejected
    probe halves it. A lane terminates when the step underflows
    `min_step` — i.e. no improvement even at the smallest step, the
    analog of Gen's score-equality convergence. This keeps the vmapped
    batch's cost proportional to the slowest lane instead of
    rounds x line-search-depth. Returns (pz, nz, score, lml)."""
    pmask = T.param_mask(nt).astype(pz.dtype)
    nmask = jnp.asarray(1.0 if infer_noise else 0.0, pz.dtype)
    max_probes = 2 * max_rounds + 64

    def val_and_grad(pz, nz):
        (s, lml), (gp, gn) = jax.value_and_grad(
            lambda p, n: _score_fn(nt, p, n, data, cfg, tables, pmask),
            argnums=(0, 1), has_aux=True)(pz, nz)
        return s, lml, gp * pmask, gn * nmask

    def body(carry):
        pz, nz, s, lml, gp, gn, step, rounds, it = carry
        pz2 = pz + step * gp
        nz2 = nz + step * gn
        s2, lml2, gp2, gn2 = val_and_grad(pz2, nz2)
        ok = (s2 > s) & jnp.isfinite(s2)
        return (jnp.where(ok, pz2, pz), jnp.where(ok, nz2, nz),
                jnp.where(ok, s2, s), jnp.where(ok, lml2, lml),
                jnp.where(ok, gp2, gp), jnp.where(ok, gn2, gn),
                jnp.where(ok, jnp.asarray(max_step, pz.dtype), step * tau),
                rounds + ok.astype(jnp.int32), it + 1)

    def cond(carry):
        *_, step, rounds, it = carry
        return (step >= min_step) & (rounds < max_rounds) & (it < max_probes)

    s0, lml0, gp0, gn0 = val_and_grad(pz, nz)
    init = (pz, nz, s0, lml0, gp0, gn0, jnp.asarray(max_step, pz.dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    pz, nz, s, lml, *_ = jax.lax.while_loop(cond, body, init)
    return pz, nz, s, lml


# ---------------------------------------------------------------------------
# AIC (Greedy.jl:27-50)
# ---------------------------------------------------------------------------

def n_params(nt, infer_noise: bool):
    """k in the AIC: active numeric tree params (+ noise when inferred)."""
    return T.num_active_params(nt) + (1 if infer_noise else 0)


def compute_aic(lml, k):
    """2*(k - logp_data); logp_data is the LML (Greedy.jl:43-50)."""
    return 2.0 * (k - lml)


# ---------------------------------------------------------------------------
# Candidate enumeration (host side, Greedy.jl:142-352)
# ---------------------------------------------------------------------------

def leaf_node_types(cfg: C.GPConfig) -> List[int]:
    return [i + 1 for i, p in enumerate(cfg.node_dist_leaf) if p > 0]


def op_node_types(cfg: C.GPConfig) -> List[int]:
    dist = cfg.node_dist_cp if cfg.changepoints else cfg.node_dist_nocp
    n_leaf = len(cfg.node_dist_leaf)
    return [i + 1 for i, p in enumerate(dist) if p > 0 and i >= n_leaf]


def _subtree_slots(s: int, M_: int) -> List[int]:
    out = []
    stack = [s]
    while stack:
        i = stack.pop()
        if i < M_:
            out.append(i)
            stack.append(2 * i + 1)
            stack.append(2 * i + 2)
    return out


def _move_subtree(nt, pz, src: int, dst: int, M_: int):
    """Re-index the subtree at src to root at dst (host numpy);
    extract_subtree_choices analog (inference_utils.jl:116-146)."""
    new_nt = np.zeros_like(nt)
    new_pz = np.zeros_like(pz)
    stack = [(src, dst)]
    while stack:
        i, o = stack.pop()
        if i >= M_ or nt[i] == 0:
            continue
        if o >= M_:
            raise ValueError("subtree move exceeds depth cap")
        new_nt[o] = nt[i]
        new_pz[o] = pz[i]
        stack.append((2 * i + 1, 2 * o + 1))
        stack.append((2 * i + 2, 2 * o + 2))
    return new_nt, new_pz


def _random_leaf_params(rng, node_type: int) -> np.ndarray:
    """make_base_kernel_choicemap: params ~ Normal(0,1) (Greedy.jl:204-218)."""
    z = np.zeros(C.MAX_PARAMS)
    ar = int(C.PARAM_ARITY[node_type])
    z[:ar] = rng.standard_normal(ar)
    return z


def enumerate_next_structures(nt, pz, cfg: C.GPConfig, rng
                              ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """All replace-leaf and insert-operator candidates (Greedy.jl:383-387).

    Candidate order mirrors the reference: replace-leaf over leaf slots x
    leaf types, then insert-op over (sorted) subtree slots x op types x
    leaf types.
    """
    M_ = len(nt)
    leaf_types = leaf_node_types(cfg)
    op_types = op_node_types(cfg)
    cands = []

    leaf_slots = [i for i in range(M_)
                  if nt[i] in (1, 2, 3, 4, 5, 9)]
    node_slots = sorted([i for i in range(M_) if nt[i] > 0])

    # Move 1: replace leaf with a different base kernel (Greedy.jl:225-274).
    for s in leaf_slots:
        for t in leaf_types:
            if t == nt[s]:
                continue
            nt2 = nt.copy(); pz2 = pz.copy()
            nt2[s] = t
            pz2[s] = _random_leaf_params(rng, t)
            cands.append((nt2, pz2))

    # Move 2: insert operator above a subtree (Greedy.jl:281-352):
    # old subtree -> left child; fresh random leaf -> right child.
    for s in node_slots:
        for o in op_types:
            for t in leaf_types:
                if 2 * s + 2 >= M_:
                    continue  # would exceed the depth cap
                try:
                    nt2, pz2 = _move_subtree(nt, pz, s, 2 * s + 1, M_)
                except ValueError:
                    continue
                # keep everything outside the old subtree
                sub = set(_subtree_slots(s, M_))
                for i in range(M_):
                    if i not in sub and nt[i] > 0:
                        nt2[i] = nt[i]; pz2[i] = pz[i]
                nt2[s] = o
                pz2[s] = np.zeros(C.MAX_PARAMS)
                nt2[2 * s + 2] = t
                pz2[2 * s + 2] = _random_leaf_params(rng, t)
                cands.append((nt2, pz2))
    return cands


# ---------------------------------------------------------------------------
# Batched optimize + select (greedy_search_initialize / _extend)
# ---------------------------------------------------------------------------

_opt_cache = {}


def _optimize_batch_fn(cfg, tables, infer_noise, max_rounds):
    sig = (cfg.cache_key, infer_noise, max_rounds)
    if sig not in _opt_cache:
        def f(nts, pzs, nzs, data):
            def one(nt, pz, nz):
                pz2, nz2, s, lml = map_optimize(
                    nt, pz, nz, data, cfg, tables, infer_noise,
                    max_rounds=max_rounds)
                k = n_params(nt, infer_noise)
                return pz2, nz2, s, lml, compute_aic(lml, k)
            return jax.vmap(one)(nts, pzs, nzs)
        _opt_cache[sig] = jax.jit(f)
    return _opt_cache[sig]


def _pad_pow2(k: int, minimum: int = 1) -> int:
    return max(minimum, 1 << math.ceil(math.log2(max(k, 1))))


def sweep_bucket(cfg: C.GPConfig, max_depth: int) -> int:
    """Single candidate-batch bucket covering a whole greedy depth sweep.

    Every optimize_candidates call in fit_greedy pads to this size so the
    sweep compiles ONE batched program (remote TPU compiles cost minutes;
    per-bucket recompilation dominated config-3 wall-clock in round 1).
    Upper bound: after d accepted steps the tree has <= d leaves and
    <= 2d-1 nodes (move 2 adds one op + one leaf; move 1 replaces), so the
    largest extension round enumerates at most
    leaves*(L-1) + nodes*O*L candidates (Greedy.jl:416-432)."""
    L = len(leaf_node_types(cfg))
    O = len(op_node_types(cfg))
    d = max(max_depth - 1, 1)
    bound = max(L, d * (L - 1) + (2 * d - 1) * O * L)
    return _pad_pow2(bound)


def optimize_candidates(cands, nz0, data, cfg, tables, infer_noise,
                        max_rounds=MAX_OPT, pad_to: Optional[int] = None):
    """Optimize a list of candidate structures in one vmapped program;
    returns (best_nt, best_pz, best_nz, best_lml, best_aic)."""
    k = len(cands)
    pad = max(_pad_pow2(k), pad_to or 0)
    M_ = cfg.max_nodes
    nts = np.zeros((pad, M_), np.int32)
    pzs = np.zeros((pad, M_, C.MAX_PARAMS), np.float64)
    for i in range(pad):
        nts[i], pzs[i] = cands[min(i, k - 1)]
    nzs = np.full(pad, nz0, np.float64)
    fn = _optimize_batch_fn(cfg, tables, infer_noise, max_rounds)
    dt = data.ts.dtype
    pz2, nz2, s, lml, aic = fn(jnp.asarray(nts), jnp.asarray(pzs, dt),
                               jnp.asarray(nzs, dt), data)
    aic_np = np.array(aic, np.float64, copy=True)
    aic_np[k:] = np.inf
    best = int(np.argmin(aic_np))
    return (nts[best], np.asarray(pz2)[best], float(np.asarray(nz2)[best]),
            float(np.asarray(lml)[best]), float(aic_np[best]))


def greedy_search_initialize(data, cfg, tables, rng, nz0,
                             infer_noise: bool, pad_to=None):
    """Best single-leaf structure (Greedy.jl:389-414)."""
    cands = []
    M_ = cfg.max_nodes
    for t in leaf_node_types(cfg):
        nt = np.zeros(M_, np.int32)
        pz = np.zeros((M_, C.MAX_PARAMS))
        nt[0] = t
        pz[0] = _random_leaf_params(rng, t)
        cands.append((nt, pz))
    return optimize_candidates(cands, nz0, data, cfg, tables, infer_noise,
                               pad_to=pad_to)


def greedy_search_extend(nt, pz, nz, aic, data, cfg, tables, rng,
                         infer_noise: bool, verbose=False, pad_to=None):
    """One extension round; keeps the argmin-AIC candidate iff it improves
    (Greedy.jl:416-441). Returns (nt, pz, nz, lml, aic, accepted)."""
    cands = enumerate_next_structures(nt, pz, cfg, rng)
    if verbose:
        print(f"Proposals: {len(cands)}")
    if not cands:
        return nt, pz, nz, None, aic, False
    bnt, bpz, bnz, blml, baic = optimize_candidates(
        cands, nz, data, cfg, tables, infer_noise, pad_to=pad_to)
    if baic < aic:
        return bnt, bpz, bnz, blml, baic, True
    return nt, pz, nz, None, aic, False


# ---------------------------------------------------------------------------
# fit_greedy (api.jl:327-378)
# ---------------------------------------------------------------------------

def fit_greedy(model, max_depth: Optional[int] = None,
               verbose: bool = False, check: bool = False,
               callback_fn: Optional[Callable] = None):
    import time as _time
    from autogp_tpu import api

    cfg = model.config
    if model.num_particles != 1:
        raise ValueError("fit_greedy requires exactly 1 particle.")
    if cfg.changepoints:
        raise ValueError("fit_greedy does not support changepoint "
                         "operators.")
    max_depth = cfg.depth_cap if max_depth is None else max_depth
    if not (1 <= max_depth <= cfg.depth_cap):
        raise ValueError("fit_greedy requires positive and finite "
                         "max_depth within the static cap.")

    rng = api._GLOBAL["rng"]
    infer_noise = cfg.noise is None
    data = model._dataset()
    tables = model.tables
    if infer_noise:
        nz0 = float(rng.standard_normal())
    else:
        nz0 = float(M.untransform_param("noise", cfg.noise, cfg))

    pad_to = sweep_bucket(cfg, max_depth)
    elapsed = 0.0
    t0 = _time.time()
    nt, pz, nz, lml, aic = greedy_search_initialize(
        data, cfg, tables, rng, nz0, infer_noise, pad_to=pad_to)
    elapsed += _time.time() - t0

    def set_model(nt, pz, nz, lml):
        particles = smc.Particles(
            node_type=jnp.asarray(nt[None]),
            params=jnp.asarray(pz[None], model.dtype),
            noise_z=jnp.asarray([nz], model.dtype),
            log_weights=jnp.asarray([lml], model.dtype),
            lml=jnp.asarray([lml], model.dtype),
            log_ml_est=jnp.asarray(0.0, model.dtype),
            parents=jnp.zeros(1, jnp.int32))
        model.particles = particles

    def validate():
        if check:
            # Greedy.jl:88,102 runs Gen's dynamic checks under check=true;
            # the analog here is trace-integrity validation of the
            # particle plus finiteness of its score.
            smc.validate_particles(model.particles, cfg)

    set_model(nt, pz, nz, lml)
    validate()
    if callback_fn is not None:
        callback_fn(model=model, step=1, aic=aic, elapsed=elapsed)

    for depth in range(2, max_depth + 1):
        t0 = _time.time()
        nt, pz, nz, new_lml, new_aic, accepted = greedy_search_extend(
            nt, pz, nz, aic, data, cfg, tables, rng, infer_noise,
            verbose=verbose, pad_to=pad_to)
        elapsed += _time.time() - t0
        assert new_aic <= aic
        aic = new_aic
        if accepted:
            lml = new_lml
        set_model(nt, pz, nz, lml)
        validate()
        if callback_fn is not None:
            callback_fn(model=model, step=depth, aic=aic, elapsed=elapsed)
    return model


# ---------------------------------------------------------------------------
# Hybrid greedy/MCMC rejuvenation (Algorithm 0, Greedy.jl:59-130)
# ---------------------------------------------------------------------------

def greedy_mcmc_rejuvenate(key, nt, pz, nz, aic, lml, data, cfg, tables,
                           biased: bool, infer_noise: bool):
    """Propose a subtree-replace, MAP-optimize <=10 rounds, accept iff the
    AIC improves (Greedy.jl:59-110). One particle; jit/vmap-friendly."""
    from autogp_tpu.inference import moves
    k_pick, k_sub = jax.random.split(key)
    sizes = T.subtree_sizes(nt).astype(pz.dtype)
    idx, _ = moves.sample_pick_node(k_pick, nt, sizes, biased,
                                    tables.depth_cap)
    gate = moves.cp_gate_at(nt, idx, cfg.changepoints)
    nt2, pz2 = M.sample_subtree(k_sub, nt, pz, tables, root_idx=idx,
                                root_cp_allowed=gate)
    pz3, nz3, _, lml3 = map_optimize(nt2, pz2, nz, data, cfg, tables,
                                     infer_noise, max_rounds=MAX_OPT_MCMC)
    k2 = n_params(nt2, infer_noise)
    aic2 = compute_aic(lml3, k2)
    acc = aic2 < aic
    return (jnp.where(acc, nt2, nt), jnp.where(acc, pz3, pz),
            jnp.where(acc, nz3, nz), jnp.where(acc, aic2, aic),
            jnp.where(acc, lml3, lml), acc)


_gmr_cache = {}


def _greedy_mcmc_step_fn(cfg, tables, biased: bool, infer_noise: bool,
                         n_parallel: int):
    """Jitted n_parallel variant (Greedy.jl:113-124): n independent
    subtree-replace/optimize proposals from the SAME state, keep the
    argmin-AIC result. The reference's per-proposal thread loop becomes
    the batch axis of one vmapped program. Rejected proposals return the
    original (state, aic), so argmin falls back to it when nothing
    improves — exactly the reference's `argmin(x -> x[2], results)`."""
    sig = (cfg.cache_key, biased, infer_noise, n_parallel)
    if sig not in _gmr_cache:
        def f(key, nt, pz, nz, aic, lml, data):
            keys = jax.random.split(key, n_parallel)
            nts, pzs, nzs, aics, lmls, accs = jax.vmap(
                lambda k: greedy_mcmc_rejuvenate(
                    k, nt, pz, nz, aic, lml, data, cfg, tables, biased,
                    infer_noise))(keys)
            b = jnp.argmin(aics)
            return (nts[b], pzs[b], nzs[b], aics[b], lmls[b], accs[b])
        _gmr_cache[sig] = jax.jit(f)
    return _gmr_cache[sig]


def fit_greedy_mcmc(model, n_mcmc: int, n_parallel: int = 1,
                    biased: bool = False, verbose: bool = False,
                    check: bool = False,
                    callback_fn: Optional[Callable] = None):
    """Hybrid greedy/MCMC chain ("Algorithm 0", Greedy.jl:59-130): n_mcmc
    steps, each proposing `n_parallel` independent subtree-replace moves
    from the current state, MAP-optimizing each <=10 rounds, and keeping
    the argmin-AIC candidate iff it improves. AIC is non-increasing along
    the chain by construction.

    Same applicability constraints as fit_greedy (api.jl:334-336): one
    particle, no changepoint operators. The chain starts from the model's
    current particle after the same <=10-round MAP optimization the
    proposals get, so the initial AIC is comparable to candidate AICs.
    """
    import time as _time
    from autogp_tpu import api

    cfg = model.config
    if model.num_particles != 1:
        raise ValueError("fit_greedy_mcmc requires exactly 1 particle.")
    if cfg.changepoints:
        raise ValueError("fit_greedy_mcmc does not support changepoint "
                         "operators.")
    if n_parallel < 1:
        raise ValueError("n_parallel must be >= 1")

    infer_noise = cfg.noise is None
    data = model._dataset()
    tables = model.tables
    dt = data.ts.dtype

    nt = np.asarray(model.particles.node_type[0])
    pz = jnp.asarray(model.particles.params[0], dt)
    nz = jnp.asarray(model.particles.noise_z[0], dt)

    # Initial state: optimize the current structure's parameters with the
    # same budget the proposals get, then score it.
    init_fn = _optimize_batch_fn(cfg, tables, infer_noise, MAX_OPT_MCMC)
    pz_b, nz_b, _s, lml_b, aic_b = init_fn(
        jnp.asarray(nt[None]), pz[None], nz[None], data)
    nt = jnp.asarray(nt)
    pz, nz, lml = pz_b[0], nz_b[0], lml_b[0]
    aic = aic_b[0]

    def set_model(nt, pz, nz, lml):
        lml_f = jnp.asarray(lml, model.dtype).reshape(1)
        particles = smc.Particles(
            node_type=jnp.asarray(nt)[None],
            params=jnp.asarray(pz, model.dtype)[None],
            noise_z=jnp.asarray(nz, model.dtype).reshape(1),
            log_weights=lml_f,
            lml=lml_f,
            log_ml_est=jnp.asarray(0.0, model.dtype),
            parents=jnp.zeros(1, jnp.int32))
        model.particles = particles

    step_fn = _greedy_mcmc_step_fn(cfg, tables, biased, infer_noise,
                                   n_parallel)
    elapsed = 0.0
    n_accepted = 0
    set_model(nt, pz, nz, lml)
    for step in range(1, n_mcmc + 1):
        t0 = _time.time()
        key = api._next_key()
        nt, pz, nz, aic, lml, acc = step_fn(key, nt, pz, nz, aic, lml,
                                            data)
        elapsed += _time.time() - t0
        accepted = bool(acc)
        n_accepted += accepted
        if accepted:
            set_model(nt, pz, nz, lml)
            if check:
                smc.validate_particles(model.particles, cfg)
        if verbose:
            print(f"greedy-mcmc step {step}: AIC={float(aic):.3f} "
                  f"accepted={accepted}")
        if callback_fn is not None:
            callback_fn(model=model, step=step, aic=float(aic),
                        accepted=accepted, elapsed=elapsed)
    if verbose:
        print(f"greedy-mcmc: {n_accepted}/{n_mcmc} steps accepted")
    return model
