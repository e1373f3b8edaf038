"""Involutive MCMC structure moves on tensor traces.

Subtree-replace (reference: src/inference_rejuv_tree_sr.jl): pick a random
node via a size-weighted tree walk, resimulate the whole subtree from the
prior (with changepoint gating), and accept via the involutive MH ratio
 alpha = [score' - score] + logq_bwd - logq_fwd,
where the pick-path density is re-assessed on the proposed tree and the
subtree prior densities appear in both the score difference and the
proposal densities (they cancel analytically; we compute them explicitly to
mirror Gen's accounting, which also keeps the implementation honest).

All functions operate on ONE particle (vmap outside). Tree walks are
fixed-length loops over the static depth cap with masked updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autogp_tpu import config as C
from autogp_tpu import model as M
from autogp_tpu import tree as T
from autogp_tpu import gp_math

NEG_INF = -jnp.inf


class PickPath(NamedTuple):
    """Record of a pick_random_node walk (inference_utils.jl:27-59).

    stop_level: level (0-based, relative to walk start) at which the walk
    stopped; dirs[d] in {0,1} = went left/right at level d (< stop_level).
    """
    stop_level: jnp.ndarray   # int32 scalar
    dirs: jnp.ndarray         # int32 [depth_cap]


def sample_pick_node(key, node_type, sizes, biased, depth_cap: int,
                     start_idx=0, noroot=False):
    """Sample a random node of the (sub)tree rooted at start_idx.

    Returns (idx, PickPath). Probabilities per inference_utils.jl:17-24:
      p_done = 1 at leaves; else 0 if noroot-at-start; else .5 if biased
               else 1/size(subtree);
      p_left = .5 if biased else size(left)/(size-1).
    """
    keys = jax.random.split(key, 2 * depth_cap)
    idx = jnp.asarray(start_idx, jnp.int32)
    done = jnp.asarray(False)
    stop_level = jnp.asarray(depth_cap - 1, jnp.int32)
    dirs = jnp.zeros((depth_cap,), jnp.int32)
    M_ = node_type.shape[0]

    for level in range(depth_cap):
        t = node_type[idx]
        leaf = gp_math.is_leaf_code(t)
        at_bottom = jnp.asarray(2 * idx + 1 >= M_)
        p_done = jnp.where(leaf | at_bottom, 1.0,
                           jnp.where(jnp.asarray(noroot) & (level == 0), 0.0,
                                     jnp.where(biased, 0.5,
                                               1.0 / sizes[idx])))
        u = jax.random.uniform(keys[2 * level])
        stop_now = (~done) & (u < p_done)
        stop_level = jnp.where(stop_now, level, stop_level)
        done = done | stop_now

        size_l = sizes[jnp.minimum(2 * idx + 1, M_ - 1)]
        p_left = jnp.where(biased, 0.5,
                           size_l / jnp.maximum(sizes[idx] - 1.0, 1.0))
        go_left = jax.random.uniform(keys[2 * level + 1]) < p_left
        dirs = dirs.at[level].set(
            jnp.where(done, dirs[level], jnp.where(go_left, 0, 1)))
        new_idx = jnp.where(go_left, 2 * idx + 1, 2 * idx + 2)
        idx = jnp.where(done, idx, jnp.minimum(new_idx, M_ - 1)).astype(
            jnp.int32)

    return idx, PickPath(stop_level=stop_level, dirs=dirs)


def assess_pick_node(path: PickPath, node_type, sizes, biased,
                     depth_cap: int, start_idx=0, noroot=False):
    """Log density of walking `path` on the given tree; -inf if infeasible.

    Reused for the forward density (on the current tree) and the backward
    density (same path on the proposed tree, Gen re-`generate`s the
    reverse proposal from the copied choices).
    """
    idx = jnp.asarray(start_idx, jnp.int32)
    logq = jnp.asarray(0.0, sizes.dtype)
    M_ = node_type.shape[0]
    done = jnp.asarray(False)

    for level in range(depth_cap):
        t = node_type[idx]
        leaf = gp_math.is_leaf_code(t)
        at_bottom = jnp.asarray(2 * idx + 1 >= M_)
        p_done = jnp.where(leaf | at_bottom, 1.0,
                           jnp.where(jnp.asarray(noroot) & (level == 0), 0.0,
                                     jnp.where(biased, 0.5,
                                               1.0 / sizes[idx])))
        stop_here = path.stop_level == level
        # log p(stop) if stopping, else log p(continue).
        step_lp = jnp.where(stop_here, jnp.log(p_done),
                            jnp.log1p(-p_done))
        size_l = sizes[jnp.minimum(2 * idx + 1, M_ - 1)]
        p_left = jnp.where(biased, 0.5,
                           size_l / jnp.maximum(sizes[idx] - 1.0, 1.0))
        go_left = path.dirs[level] == 0
        dir_lp = jnp.where(stop_here, 0.0,
                           jnp.where(go_left, jnp.log(p_left),
                                     jnp.log1p(-p_left)))
        logq = logq + jnp.where(done, 0.0, step_lp + dir_lp)
        done = done | stop_here
        new_idx = jnp.where(go_left, 2 * idx + 1, 2 * idx + 2)
        idx = jnp.where(done, idx, jnp.minimum(new_idx, M_ - 1)).astype(
            jnp.int32)

    return logq, idx


def cp_gate_at(node_type, idx, changepoints: bool):
    """Changepoint permission for a subtree proposal rooted at idx
    (inference_rejuv_tree_sr.jl:27-39): allowed iff config permits AND
    (idx is root OR parent is a ChangePoint)."""
    parent = jnp.maximum((idx - 1) // 2, 0)
    return jnp.asarray(changepoints) & (
        (idx == 0) | (node_type[parent] == C.CHANGEPOINT))


class MHResult(NamedTuple):
    node_type: jnp.ndarray
    params: jnp.ndarray
    lml: jnp.ndarray
    accepted: jnp.ndarray


class MHProposal(NamedTuple):
    """A structure-move proposal before likelihood scoring.

    `delta` carries every term of the involutive-MH log acceptance ratio
    EXCEPT the likelihoods: log_alpha = (lml_new - lml_cached) + delta.
    Splitting proposal from scoring lets the umbrella kernel select one
    of several proposals by the mixture coin and pay for a single LML
    evaluation (the only O(N^3) part) instead of one per move type.
    """
    node_type: jnp.ndarray
    params: jnp.ndarray
    delta: jnp.ndarray


def subtree_replace_propose(key, node_type, params_z, cfg: C.GPConfig,
                            tables: M.PriorTables, biased=False
                            ) -> MHProposal:
    """Subtree-replace proposal: pick a node, resimulate its subtree from
    the prior (inference_rejuv_tree_sr.jl:17-47)."""
    k_pick, k_sub = jax.random.split(key)
    D = tables.depth_cap

    sizes = T.subtree_sizes(node_type).astype(params_z.dtype)
    idx, path = sample_pick_node(k_pick, node_type, sizes, biased, D)
    logq_pick_fwd, _ = assess_pick_node(path, node_type, sizes, biased, D)

    gate = cp_gate_at(node_type, idx, cfg.changepoints)
    new_type, new_params = M.sample_subtree(
        k_sub, node_type, params_z, tables, root_idx=idx,
        root_cp_allowed=gate)

    # Subtree prior densities (appear in both score delta and proposal
    # densities; kept explicit to mirror Gen.metropolis_hastings).
    lp_sub_new = M.tree_prior_logpdf(new_type, new_params, tables,
                                     root_idx=idx, root_cp_allowed=gate)
    lp_sub_old = M.tree_prior_logpdf(node_type, params_z, tables,
                                     root_idx=idx, root_cp_allowed=gate)

    new_sizes = T.subtree_sizes(new_type).astype(params_z.dtype)
    logq_pick_bwd, _ = assess_pick_node(path, new_type, new_sizes, biased, D)

    # alpha = (score' - score) + logq_bwd - logq_fwd; the model-prior terms
    # use the same gating as the proposal so they appear symmetrically.
    delta = (lp_sub_new - lp_sub_old
             + (logq_pick_bwd + lp_sub_old)
             - (logq_pick_fwd + lp_sub_new))
    return MHProposal(node_type=new_type, params=new_params, delta=delta)


def score_proposal(k_acc, prop: MHProposal, node_type, params_z, noise_z,
                   lml_cached, data, cfg: C.GPConfig,
                   tables: M.PriorTables) -> MHResult:
    """Score a structure proposal (the single fresh Cholesky) and apply
    the involutive-MH accept/reject."""
    ts, xs, mask = data
    lml_new = M.lml(prop.node_type, prop.params, noise_z, ts, xs, mask,
                    cfg, tables)
    log_alpha = (lml_new - lml_cached) + prop.delta
    accept = jnp.log(jax.random.uniform(k_acc)) < log_alpha
    accept = accept & jnp.isfinite(lml_new) & jnp.isfinite(log_alpha)
    return MHResult(
        node_type=jnp.where(accept, prop.node_type, node_type),
        params=jnp.where(accept, prop.params, params_z),
        lml=jnp.where(accept, lml_new, lml_cached),
        accepted=accept)


def subtree_replace_step(key, node_type, params_z, noise_z, lml_cached,
                         data, cfg: C.GPConfig, tables: M.PriorTables,
                         biased=False):
    """One subtree-replace involutive MH step for one particle.

    `data` = (ts, xs, mask); `lml_cached` is the current trace's LML so
    only the proposed tree needs a fresh Cholesky.
    """
    k_prop, k_acc = jax.random.split(key)
    prop = subtree_replace_propose(k_prop, node_type, params_z, cfg,
                                   tables, biased=biased)
    return score_proposal(k_acc, prop, node_type, params_z, noise_z,
                          lml_cached, data, cfg, tables)


def tree_rejuvenation_step(key, node_type, params_z, noise_z, lml_cached,
                           data, cfg: C.GPConfig, tables: M.PriorTables,
                           biased=False):
    """Umbrella involutive kernel: 50/50 mixture of subtree-replace and
    detach-attach (inference_rejuv_tree.jl:23-55); detach-attach is
    disabled when the depth cap is 1. The move_type choice density is
    symmetric and cancels from the acceptance ratio.

    Under vmap both proposals are computed for every particle (tree
    surgery is cheap heap arithmetic), the mixture coin selects one, and
    only the SELECTED proposal is scored — one LML Cholesky per MH step
    instead of one per move type."""
    from autogp_tpu.inference import moves_da

    if tables.depth_cap == 1:
        return subtree_replace_step(key, node_type, params_z, noise_z,
                                    lml_cached, data, cfg, tables,
                                    biased=biased)
    k_sel, k_mv, k_acc = jax.random.split(key, 3)
    use_da = jax.random.uniform(k_sel) < 0.5
    prop_sr = subtree_replace_propose(k_mv, node_type, params_z, cfg,
                                      tables, biased=biased)
    prop_da = moves_da.detach_attach_propose(k_mv, node_type, params_z,
                                             tables, biased=biased)
    prop = MHProposal(
        node_type=jnp.where(use_da, prop_da.node_type, prop_sr.node_type),
        params=jnp.where(use_da, prop_da.params, prop_sr.params),
        delta=jnp.where(use_da, prop_da.delta, prop_sr.delta))
    return score_proposal(k_acc, prop, node_type, params_z, noise_z,
                          lml_cached, data, cfg, tables)
