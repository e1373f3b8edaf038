"""Detach-attach involutive MCMC move (reference: src/inference_rejuv_tree_da.jl).

The dimension-changing structure move:
  DETACH: pick node `a`, pick node `b` inside subtree(a); promote
    subtree(b) to position `a`, discarding the rest of subtree(a)
    (which becomes the reverse proposal's auxiliary tree).
  ATTACH: pick node `a`, generate a random downward path from `a` to a
    hole `b`, sample auxiliary structure around the path (internal path
    nodes are forced to operators — Dirac at ChangePoint when the moved
    subtree's root is a ChangePoint), and bury the current subtree(a)
    at `b`.

On tensor traces all of this is heap-index arithmetic: a node `b` inside
subtree(a) is addressed by the low bits of (b+1) below (a+1)'s bits, so
subtree moves are gathers with traced index maps, and path densities are
computed directly from the endpoint indices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import config as C
from autogp_tpu import model as M
from autogp_tpu import tree as T
from autogp_tpu import gp_math
from autogp_tpu.inference import moves


# ---------------------------------------------------------------------------
# Heap-index geometry (all traced)
# ---------------------------------------------------------------------------

def slot_depth(idx, tables):
    """1-based depth of a traced slot index."""
    return tables.depths[idx]


def is_descendant(s, r, tables):
    """Whether static-or-traced slot s lies in the subtree of traced r
    (inclusive)."""
    return jnp.any(tables.ancestors[s] == r)


def descend_mask(r, tables):
    """[M] mask of slots in the subtree of traced r."""
    return jnp.any(tables.ancestors == r, axis=1)


def ancestor_mask_of(h, tables):
    """[M] mask of slots that are ancestors of traced h (inclusive)."""
    Mn = tables.ancestors.shape[0]
    anc_of_h = tables.ancestors[h]          # [D] ancestors of h, -1 padded
    idx = jnp.arange(Mn)
    return jnp.any(idx[:, None] == anc_of_h[None, :], axis=1)


def subtree_height(node_type, root, tables):
    """Height of the active subtree rooted at traced `root`
    (GP.depth of the subtree node)."""
    mask = descend_mask(root, tables) & (node_type > 0)
    maxd = jnp.max(jnp.where(mask, tables.depths, 0))
    return maxd - tables.depths[root] + 1


def remap_index(t, src, dst, tables):
    """Map slot `t` in subtree(dst) to the corresponding slot under `src`:
    (t+1) = (dst+1) << k | rem  ->  (src+1) << k | rem - 1.

    Returns (mapped_idx, valid) where valid requires the mapped slot to
    exist in the heap.
    """
    Mn = tables.ancestors.shape[0]
    k = tables.depths[t] - tables.depths[dst]
    rem = (t + 1) - ((dst + 1) << k)
    mapped = ((src + 1) << k) + rem - 1
    valid = (k >= 0) & (mapped < Mn) & (mapped >= 0)
    return jnp.where(valid, mapped, 0), valid


def move_subtree(node_type, params_z, src, dst, tables):
    """Return (node_type', params') where the subtree at traced `src` has
    been copied to root at traced `dst`, clearing the rest of subtree(dst).
    Slots outside subtree(dst) are preserved. src must be deep enough that
    the source content fits (guaranteed by the proposal's depth limits when
    moving down; always true when moving up)."""
    Mn = node_type.shape[0]
    idx = jnp.arange(Mn)
    in_dst = descend_mask(dst, tables)
    mapped, valid = jax.vmap(
        lambda t: remap_index(t, src, dst, tables))(idx)
    gathered_nt = jnp.where(valid & is_desc_vec(mapped, src, tables),
                            node_type[mapped], 0)
    gathered_pz = jnp.where((valid & is_desc_vec(mapped, src, tables))[:, None],
                            params_z[mapped], 0.0)
    new_nt = jnp.where(in_dst, gathered_nt.astype(node_type.dtype),
                       node_type)
    new_pz = jnp.where(in_dst[:, None], gathered_pz, params_z)
    return new_nt, new_pz


def is_desc_vec(s_vec, r, tables):
    return jnp.any(tables.ancestors[s_vec] == r, axis=-1)


def path_between(a, b, tables, depth_cap: int) -> moves.PickPath:
    """PickPath from traced a down to traced descendant b: stop_level =
    depth(b)-depth(a), dirs from the binary digits of (b+1)."""
    L = tables.depths[b] - tables.depths[a]
    rem = (b + 1) - ((a + 1) << L)
    levels = jnp.arange(depth_cap)
    # dir at level l (0-based from a) is bit (L-1-l) of rem.
    shift = jnp.maximum(L - 1 - levels, 0)
    dirs = jnp.where(levels < L, (rem >> shift) & 1, 0).astype(jnp.int32)
    return moves.PickPath(stop_level=L.astype(jnp.int32), dirs=dirs)


# ---------------------------------------------------------------------------
# generate_random_path (inference_utils.jl:62-89)
# ---------------------------------------------------------------------------

def sample_random_path(key, a, max_depth_aux, tables, depth_cap: int,
                       noroot=False):
    """Random downward path from traced `a`; p_done = .5 per level, forced
    stop at depth == max_depth_aux, forced continue at the root if noroot.
    Returns hole index."""
    keys = jax.random.split(key, 2 * depth_cap)
    idx = jnp.asarray(a, jnp.int32)
    done = jnp.asarray(False)
    Mn = tables.ancestors.shape[0]
    for level in range(depth_cap):
        depth = tables.depths[idx]
        p_done = jnp.where(depth == max_depth_aux, 1.0,
                           jnp.where(jnp.asarray(noroot) & (level == 0),
                                     0.0, 0.5))
        stop_now = (~done) & (jax.random.uniform(keys[2 * level]) < p_done)
        done = done | stop_now
        go_left = jax.random.uniform(keys[2 * level + 1]) < 0.5
        nxt = jnp.where(go_left, 2 * idx + 1, 2 * idx + 2)
        idx = jnp.where(done, idx, jnp.minimum(nxt, Mn - 1)).astype(
            jnp.int32)
    return idx


def logq_random_path(a, hole, max_depth_aux, tables, dtype,
                     noroot=False):
    """Density of generate_random_path choosing `hole` from `a`."""
    L = tables.depths[hole] - tables.depths[a]
    depth_a = tables.depths[a]
    # Levels 0..L-1: continue. Continue prob = 1-p_done; p_done at level l
    # is .5 except 0 at the root when noroot (continue prob 1).
    log_half = jnp.asarray(np.log(0.5), dtype)
    n_cont = L
    cont_lp = n_cont * log_half
    if noroot:
        cont_lp = cont_lp - jnp.where(L > 0, log_half, 0.0)
    # The L direction choices, each .5.
    dir_lp = L * log_half
    # Stop at the hole: p=1 if at max_depth_aux (or noroot-excluded
    # impossible), else .5.
    stop_forced = tables.depths[hole] == max_depth_aux
    stop_lp = jnp.where(stop_forced, 0.0, log_half)
    # noroot && hole==a is infeasible.
    lp = cont_lp + dir_lp + stop_lp
    if noroot:
        lp = jnp.where(L == 0, -jnp.inf, lp)
    return lp


# ---------------------------------------------------------------------------
# Auxiliary-tree proposal (covariance_proposal_attach_detach, da.jl:17-87)
# ---------------------------------------------------------------------------

def _aux_dist_row(s_depth, cp_allowed, on_path, force_cp, tables):
    """Log node-type distribution for an aux-proposal slot: off-path slots
    use the model prior row; internal path slots are restricted to
    operators (renormalized), or Dirac at ChangePoint when force_cp."""
    row = jnp.where(s_depth == tables.depth_cap, 0,
                    jnp.where(cp_allowed, 2, 1))
    dist = tables.node_dist[row]                       # [8]
    ops_only = dist * jnp.asarray([0., 0., 0., 0., 0., 1., 1., 1.])
    ops_only = ops_only / jnp.maximum(jnp.sum(ops_only), 1e-300)
    dirac_cp = jnp.zeros(8).at[C.CHANGEPOINT - 1].set(1.0)
    path_dist = jnp.where(force_cp, dirac_cp, ops_only)
    out = jnp.where(on_path, path_dist, dist)
    return jnp.log(jnp.maximum(out, 1e-300)) + jnp.where(
        out > 0, 0.0, -jnp.inf)


def aux_logpdf(node_type, params_z, a, hole, force_cp, tables):
    """Log density of the auxiliary material of `node_type` — the slots in
    subtree(a) excluding subtree(hole) — under the attach proposal."""
    Mn = node_type.shape[0]
    member = descend_mask(a, tables) & ~descend_mask(hole, tables)
    on_path = ancestor_mask_of(hole, tables) & member
    active = (node_type > 0) & member

    parent_idx = np.maximum(0, (np.arange(Mn) - 1) // 2)
    parent_type = node_type[jnp.asarray(parent_idx)]
    is_a = jnp.arange(Mn) == a
    cp_allowed = jnp.where(is_a, jnp.asarray(tables.changepoints),
                           parent_type == C.CHANGEPOINT)

    log_dist = jax.vmap(
        lambda d, c, o: _aux_dist_row(d, c, o, force_cp, tables))(
            tables.depths, cp_allowed, on_path)
    code_idx = jnp.clip(node_type - 1, 0, 7)
    lp_type = jnp.take_along_axis(log_dist, code_idx[:, None],
                                  axis=1)[:, 0]
    ar = tables.arity[node_type]
    slot_mask = (jnp.arange(C.MAX_PARAMS)[None, :] < ar[:, None])
    lp_params = jnp.sum(M.normal_logpdf(params_z) * slot_mask, axis=1)
    return jnp.sum(jnp.where(active, lp_type + lp_params, 0.0))


def sample_aux(key, node_type, params_z, a, hole, force_cp, tables):
    """Sample auxiliary structure for the slots in subtree(a) excluding
    subtree(hole); other slots are left untouched (the caller writes the
    moved subtree into the hole region first).

    Like model.sample_subtree, the BFS dependence is parent -> child only,
    so the loop runs over depth_cap LEVELS with each level sampled as one
    batch (program size O(depth_cap), not O(2^depth_cap))."""
    D = tables.depth_cap
    member_all = descend_mask(a, tables) & ~descend_mask(hole, tables)
    on_path_all = ancestor_mask_of(hole, tables) & member_all
    keys = jax.random.split(key, 2 * D)

    new_type = node_type
    new_params = params_z
    for lvl in range(D):
        lo, hi = (1 << lvl) - 1, (1 << (lvl + 1)) - 1   # slots [lo, hi)
        W = hi - lo
        member = member_all[lo:hi]
        on_path = on_path_all[lo:hi]
        if lvl == 0:
            parent_t = jnp.zeros((1,), node_type.dtype)  # inactive sentinel
        else:
            plo = (1 << (lvl - 1)) - 1
            parent_t = jnp.repeat(new_type[plo:lo], 2)
        is_a = jnp.arange(lo, hi) == a
        # Active: a itself, or child of an active aux/op parent. Children
        # of the path are always active (path nodes are ops); an off-path
        # slot is active iff its parent is an operator.
        active = member & (is_a | M.is_op_parent(parent_t))
        cp_allowed = jnp.where(is_a, jnp.asarray(tables.changepoints),
                               parent_t == C.CHANGEPOINT)
        logits = jax.vmap(
            lambda d, c, o: _aux_dist_row(d, c, o, force_cp, tables))(
                tables.depths[lo:hi], cp_allowed, on_path)  # [W, 8]
        t = (jax.random.categorical(keys[2 * lvl], logits) + 1).astype(
            node_type.dtype)
        z = jax.random.normal(keys[2 * lvl + 1], (W, C.MAX_PARAMS),
                              params_z.dtype)
        ar = tables.arity[t]
        z = jnp.where(jnp.arange(C.MAX_PARAMS)[None, :] < ar[:, None],
                      z, 0.0)
        t = jnp.where(active, t, 0)
        z = jnp.where(active[:, None], z, 0.0)
        new_type = new_type.at[lo:hi].set(
            jnp.where(member, t, new_type[lo:hi]))
        new_params = new_params.at[lo:hi].set(
            jnp.where(member[:, None], z, new_params[lo:hi]))
    return new_type, new_params


# ---------------------------------------------------------------------------
# The move
# ---------------------------------------------------------------------------

def detach_attach_propose(key, node_type, params_z,
                          tables: M.PriorTables, biased=False
                          ) -> "moves.MHProposal":
    """Detach-attach proposal for one particle.

    Chooses DETACH vs ATTACH with p_detach = .5 (0 for singleton trees)
    and applies the move; the returned delta carries the full involutive
    ratio except the likelihoods — tree prior change, auxiliary-tree and
    path densities (da.jl:90-281).
    """
    D = tables.depth_cap
    dt = params_z.dtype
    (k_move, k_pa, k_pb, k_path, k_aux) = jax.random.split(key, 5)

    sizes = T.subtree_sizes(node_type).astype(dt)
    tree_size = sizes[0]
    p_detach = jnp.where(tree_size == 1, 0.0, 0.5)
    do_detach = jax.random.uniform(k_move) < p_detach

    # Both branches share pick_node_a.
    idx_a, path_a = moves.sample_pick_node(k_pa, node_type, sizes, biased,
                                           D)
    lq_pick_a_old, _ = moves.assess_pick_node(path_a, node_type, sizes,
                                              biased, D)

    # ----- DETACH branch ---------------------------------------------------
    idx_b_det, path_b = moves.sample_pick_node(
        k_pb, node_type, sizes, biased, D, start_idx=idx_a)
    lq_pick_b_old, _ = moves.assess_pick_node(
        path_b, node_type, sizes, biased, D, start_idx=idx_a)
    nt_det, pz_det = move_subtree(node_type, params_z, idx_b_det, idx_a,
                                  tables)
    # Reverse (attach) quantities on the detached tree.
    sizes_det = T.subtree_sizes(nt_det).astype(dt)
    lq_pick_a_det, _ = moves.assess_pick_node(path_a, nt_det, sizes_det,
                                              biased, D)
    h_det = subtree_height(nt_det, idx_a, tables)
    mda_det = D - (h_det - 1)
    lq_path_det = logq_random_path(idx_a, idx_b_det, mda_det, tables, dt)
    force_cp_det = nt_det[idx_a] == C.CHANGEPOINT
    lq_aux_det = aux_logpdf(node_type, params_z, idx_a, idx_b_det,
                            force_cp_det, tables)
    p_detach_det = jnp.where(sizes_det[0] == 1, 0.0, 0.5)
    lq_fwd_det = jnp.log(jnp.maximum(p_detach, 1e-300)) \
        + lq_pick_a_old + lq_pick_b_old
    lq_bwd_det = jnp.log1p(-p_detach_det) + lq_pick_a_det + lq_path_det \
        + lq_aux_det

    # ----- ATTACH branch ---------------------------------------------------
    h_att = subtree_height(node_type, idx_a, tables)
    mda_att = D - (h_att - 1)
    hole = sample_random_path(k_path, idx_a, mda_att, tables, D)
    lq_path_att = logq_random_path(idx_a, hole, mda_att, tables, dt)
    force_cp_att = node_type[idx_a] == C.CHANGEPOINT
    # Move subtree(a) down to the hole, then fill aux around the path.
    nt_mv, pz_mv = move_subtree(node_type, params_z, idx_a, hole, tables)
    # move_subtree(.., idx_a, hole) clears subtree(hole) and writes the
    # moved content, but slots in subtree(a)\subtree(hole) still hold stale
    # values; sample_aux overwrites exactly those slots.
    nt_att, pz_att = sample_aux(k_aux, nt_mv, pz_mv, idx_a, hole,
                                force_cp_att, tables)
    lq_aux_att = aux_logpdf(nt_att, pz_att, idx_a, hole, force_cp_att,
                            tables)
    # Reverse (detach) quantities on the attached tree.
    sizes_att = T.subtree_sizes(nt_att).astype(dt)
    lq_pick_a_att, _ = moves.assess_pick_node(path_a, nt_att, sizes_att,
                                              biased, D)
    path_ab = path_between(idx_a, hole, tables, D)
    lq_pick_b_att, _ = moves.assess_pick_node(
        path_ab, nt_att, sizes_att, biased, D, start_idx=idx_a)
    p_detach_att = jnp.where(sizes_att[0] == 1, 0.0, 0.5)
    lq_fwd_att = jnp.log1p(-p_detach) + lq_pick_a_old + lq_path_att \
        + lq_aux_att
    lq_bwd_att = jnp.log(jnp.maximum(p_detach_att, 1e-300)) \
        + jnp.where(p_detach_att > 0, 0.0, -jnp.inf) \
        + lq_pick_a_att + lq_pick_b_att

    # ----- select branch, assemble proposal ---------------------------------
    nt_new = jnp.where(do_detach, nt_det, nt_att)
    pz_new = jnp.where(do_detach, pz_det, pz_att)
    lq_fwd = jnp.where(do_detach, lq_fwd_det, lq_fwd_att)
    lq_bwd = jnp.where(do_detach, lq_bwd_det, lq_bwd_att)

    lp_tree_old = M.tree_prior_logpdf(node_type, params_z, tables)
    lp_tree_new = M.tree_prior_logpdf(nt_new, pz_new, tables)
    delta = (lp_tree_new - lp_tree_old) + lq_bwd - lq_fwd
    return moves.MHProposal(node_type=nt_new, params=pz_new, delta=delta)


def detach_attach_step(key, node_type, params_z, noise_z, lml_cached,
                       data, cfg: C.GPConfig, tables: M.PriorTables,
                       biased=False):
    """One detach-attach involutive MH step for one particle (proposal +
    likelihood scoring + accept/reject)."""
    k_prop, k_acc = jax.random.split(key)
    prop = detach_attach_propose(k_prop, node_type, params_z, tables,
                                 biased=biased)
    return moves.score_proposal(k_acc, prop, node_type, params_z, noise_z,
                                lml_cached, data, cfg, tables)
