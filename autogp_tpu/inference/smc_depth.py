"""SMC over tree DEPTH (reference: src/inference_smc_anneal_depth.jl).

A dormant-but-documented variant in the reference: instead of annealing
over data prefixes, the particle ensemble anneals over the maximum tree
depth — each round raises `max_depth` by one and extends every particle
with an ATTACH proposal (detach as the backward kernel), then resamples
and rejuvenates. The reference file is not included by Inference.jl and
references undefined helpers (SURVEY.md §1); this implementation completes
it on tensor traces.

Because the tensor-trace shape is 2^depth - 1, particles are re-embedded
into the larger heap between rounds (slot indices are depth-stable).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import config as C
from autogp_tpu import model as M
from autogp_tpu import tree as T
from autogp_tpu.inference import hmc as hmc_mod
from autogp_tpu.inference import moves, moves_da, smc


def embed_particles(particles: smc.Particles, m_new: int) -> smc.Particles:
    """Grow the heap from M_old to M_new slots (indices are stable)."""
    P, m_old = particles.node_type.shape
    if m_new == m_old:
        return particles
    assert m_new > m_old
    nt = jnp.zeros((P, m_new), particles.node_type.dtype)
    nt = nt.at[:, :m_old].set(particles.node_type)
    pz = jnp.zeros((P, m_new, C.MAX_PARAMS), particles.params.dtype)
    pz = pz.at[:, :m_old].set(particles.params)
    return particles._replace(node_type=nt, params=pz)


def attach_extend_step(key, node_type, params_z, noise_z, data,
                       cfg_new: C.GPConfig, tables_new: M.PriorTables,
                       depth_old: int, biased=False):
    """One particle's depth-extension: forward ATTACH under the deeper
    config, backward DETACH (smc_anneal_depth.jl:17-91). Returns
    (nt', pz', weight_diff)."""
    ts, xs, mask = data
    D = tables_new.depth_cap
    dt = params_z.dtype
    k_pa, k_path, k_aux = jax.random.split(key, 3)

    sizes = T.subtree_sizes(node_type).astype(dt)
    idx_a, path_a = moves.sample_pick_node(k_pa, node_type, sizes, biased, D)
    lq_pick_a_old, _ = moves.assess_pick_node(path_a, node_type, sizes,
                                              biased, D)

    h_att = moves_da.subtree_height(node_type, idx_a, tables_new)
    mda = D - (h_att - 1)
    hole = moves_da.sample_random_path(k_path, idx_a, mda, tables_new, D)
    lq_path = moves_da.logq_random_path(idx_a, hole, mda, tables_new, dt)
    force_cp = node_type[idx_a] == C.CHANGEPOINT

    nt_mv, pz_mv = moves_da.move_subtree(node_type, params_z, idx_a, hole,
                                         tables_new)
    nt_new, pz_new = moves_da.sample_aux(k_aux, nt_mv, pz_mv, idx_a, hole,
                                         force_cp, tables_new)
    lq_aux = moves_da.aux_logpdf(nt_new, pz_new, idx_a, hole, force_cp,
                                 tables_new)

    # Backward detach density on the new tree.
    sizes_new = T.subtree_sizes(nt_new).astype(dt)
    lq_pick_a_new, _ = moves.assess_pick_node(path_a, nt_new, sizes_new,
                                              biased, D)
    path_ab = moves_da.path_between(idx_a, hole, tables_new, D)
    lq_pick_b_new, _ = moves.assess_pick_node(path_ab, nt_new, sizes_new,
                                              biased, D, start_idx=idx_a)

    # Model weight: score under the deeper config minus score under the
    # previous config (the argdiffs=(NoChange, UnknownChange) update). The
    # old tree is scored on the embedded heap with the OLD leaf-depth cap.
    lp_old = M.tree_prior_logpdf(node_type, params_z, tables_new,
                                 leaf_cap=depth_old)
    lp_new = M.tree_prior_logpdf(nt_new, pz_new, tables_new)
    lml_old = M.lml(node_type, params_z, noise_z, ts, xs, mask, cfg_new,
                    tables_new)
    lml_new = M.lml(nt_new, pz_new, noise_z, ts, xs, mask, cfg_new,
                    tables_new)

    w = ((lp_new + lml_new) - (lp_old + lml_old)
         + (lq_pick_a_new + lq_pick_b_new)
         - (lq_pick_a_old + lq_path + lq_aux))
    return nt_new, pz_new, lml_new, w


_extend_cache = {}


def _extend_all_jit(cfg_new: C.GPConfig, tables_new, depth_old: int,
                    biased: bool):
    """Content-keyed jit of the batched depth-extension (a fresh
    jax.jit per depth step would re-trace and round-trip the remote
    compile cache every call; data is an operand, not a constant)."""
    sig = (cfg_new.cache_key, depth_old, biased)
    if sig not in _extend_cache:
        def f(k, parts, data):
            P = parts.node_type.shape[0]
            keys = jax.random.split(k, P)
            d = (data.ts, data.xs, data.mask)
            nt, pz, lml, w = jax.vmap(
                lambda kk, a, b, c: attach_extend_step(
                    kk, a, b, c, d, cfg_new, tables_new, depth_old,
                    biased=biased))(keys, parts.node_type, parts.params,
                                    parts.noise_z)
            return parts._replace(node_type=nt, params=pz, lml=lml,
                                  log_weights=parts.log_weights + w)
        _extend_cache[sig] = jax.jit(f)
    return _extend_cache[sig]


def run_smc_anneal_depth(
        key,
        ts: np.ndarray,
        xs: np.ndarray,
        schedule: Sequence[int],
        n_particles: int = 50,
        n_mcmc: int = 10,
        n_hmc: int = 10,
        biased: bool = False,
        changepoints: bool = False,
        noise: Optional[float] = None,
        hmc_cfg: hmc_mod.HMCConfig = hmc_mod.HMCConfig(),
        adaptive_resampling: bool = True,
        adaptive_rejuvenation: bool = False,
        verbose: bool = False,
        callback_fn=None,
        dtype=None):
    """Depth-annealed SMC (smc_anneal_depth.jl:130-229). Returns the final
    (particles, config)."""
    schedule = list(schedule)
    assert all(b > a for a, b in zip(schedule, schedule[1:]))
    n = len(ts)
    data = smc.make_dataset(ts, xs, dtype=dtype)
    infer_noise = noise is None

    def cfg_at(depth):
        return C.GPConfig(max_depth=depth, changepoints=changepoints,
                          noise=noise)

    cfg = cfg_at(schedule[0])
    tables = M.prior_tables(cfg)
    key, k_init = jax.random.split(key)
    particles = smc.initialize(k_init, n_particles, data, cfg, tables,
                               dtype=dtype)

    for step_i, depth in enumerate(schedule):
        if verbose:
            print(f"Running SMC round {depth}/{schedule[-1]}")
        cfg_new = cfg_at(depth)
        tables_new = M.prior_tables(cfg_new)
        if depth != schedule[0]:
            depth_old = cfg.max_depth
            particles = embed_particles(particles, cfg_new.max_nodes)
            key, k_ext = jax.random.split(key)
            particles = _extend_all_jit(cfg_new, tables_new, depth_old,
                                        biased)(k_ext, particles, data)

        # Resample (skipped at the last step).
        resampled = jnp.asarray(False)
        if depth < schedule[-1]:
            threshold = (n_particles / 2 if adaptive_resampling
                         else float(n_particles))
            key, k_res = jax.random.split(key)
            particles, resampled = smc.maybe_resample_jit(
                k_res, particles,
                jnp.asarray(threshold, particles.params.dtype))

        # Rejuvenate under the current config.
        if not adaptive_rejuvenation or bool(resampled):
            key, k_rej = jax.random.split(key)
            particles, _, _, _ = smc.rejuvenate_jit(
                cfg_new, tables_new, n_mcmc, n_hmc, biased, hmc_cfg,
                infer_noise)(k_rej, particles, data)

        cfg, tables = cfg_new, tables_new
        if callback_fn is not None:
            callback_fn(particles=particles, depth=depth,
                        resampled=bool(resampled))
    return particles, cfg
