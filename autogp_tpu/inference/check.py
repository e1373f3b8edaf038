"""Involution round-trip checks (the reference's `check=true` analog).

Gen.check_round_trip (used at inference_smc_anneal_depth.jl:59-87 and
plumbed through api.jl:208) applies a move, then applies the reverse move
from the recorded choices, and asserts the original trace returns exactly.
Here the same property is checked on tensor traces for all three structure
moves:

  - subtree-replace: writing the ORIGINAL subtree content back at the
    picked index must restore the trace, and the recorded pick path must
    resolve to the same index with finite density on the proposed tree;
  - detach(a, b): the reverse attach — re-burying the promoted subtree at
    hole `b` and restoring the original auxiliary material — must restore
    the trace;
  - attach(a, hole): the reverse detach — promoting subtree(hole) back to
    `a` — must restore the trace (this also proves sample_aux never
    touches subtree(hole)).

All checkers sample the move's proposal choices exactly like the real
steps (moves.py / moves_da.py) and are vmap/jit-friendly, so a sweep over
thousands of random (tree, move) pairs is one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from autogp_tpu import config as C
from autogp_tpu import model as M
from autogp_tpu import tree as T
from autogp_tpu.inference import moves, moves_da


def _states_equal(nt_a, pz_a, nt_b, pz_b):
    return jnp.all(nt_a == nt_b) & jnp.all(pz_a == pz_b)


def subtree_replace_roundtrip(key, node_type, params_z, tables,
                              changepoints: bool = True, biased=False):
    """Forward subtree-replace + reverse-from-recorded-choices == identity.

    Returns a bool scalar (True = round trip exact)."""
    D = tables.depth_cap
    k_pick, k_sub = jax.random.split(key)
    sizes = T.subtree_sizes(node_type).astype(params_z.dtype)
    idx, path = moves.sample_pick_node(k_pick, node_type, sizes, biased, D)
    gate = moves.cp_gate_at(node_type, idx, changepoints)
    new_type, new_params = M.sample_subtree(
        k_sub, node_type, params_z, tables, root_idx=idx,
        root_cp_allowed=gate)

    # Reverse: the discarded subtree (Gen's `discard`, _sr.jl:84) is the
    # original content of subtree(idx); writing it back must restore.
    member = moves_da.descend_mask(idx, tables)
    nt_rt = jnp.where(member, node_type, new_type)
    pz_rt = jnp.where(member[:, None], params_z, new_params)
    ok_state = _states_equal(nt_rt, pz_rt, node_type, params_z)

    # The recorded pick path must reach the same index with finite density
    # on the PROPOSED tree (the reverse proposal re-assesses it there).
    new_sizes = T.subtree_sizes(new_type).astype(params_z.dtype)
    lq_bwd, idx_bwd = moves.assess_pick_node(path, new_type, new_sizes,
                                             biased, D)
    ok_path = (idx_bwd == idx) & jnp.isfinite(lq_bwd)
    return ok_state & ok_path


def detach_roundtrip(key, node_type, params_z, tables, biased=False):
    """detach(a, b) then reverse attach from recorded choices == identity."""
    D = tables.depth_cap
    k_pa, k_pb = jax.random.split(key)
    sizes = T.subtree_sizes(node_type).astype(params_z.dtype)
    idx_a, _ = moves.sample_pick_node(k_pa, node_type, sizes, biased, D)
    idx_b, _ = moves.sample_pick_node(k_pb, node_type, sizes, biased, D,
                                      start_idx=idx_a)
    nt_det, pz_det = moves_da.move_subtree(node_type, params_z, idx_b,
                                           idx_a, tables)
    # Reverse attach: bury the promoted subtree back at hole b, then
    # restore the recorded aux material (the reverse proposal's :aux_tree,
    # _da.jl:229-239) — the original slots of subtree(a) \ subtree(b).
    nt_mv, pz_mv = moves_da.move_subtree(nt_det, pz_det, idx_a, idx_b,
                                         tables)
    member = moves_da.descend_mask(idx_a, tables) & \
        ~moves_da.descend_mask(idx_b, tables)
    nt_rt = jnp.where(member, node_type, nt_mv)
    pz_rt = jnp.where(member[:, None], params_z, pz_mv)
    return _states_equal(nt_rt, pz_rt, node_type, params_z)


def attach_roundtrip(key, node_type, params_z, tables,
                     changepoints: bool = True, biased=False):
    """attach(a, hole) then reverse detach(a, b=hole) == identity."""
    D = tables.depth_cap
    k_pa, k_path, k_aux = jax.random.split(key, 3)
    sizes = T.subtree_sizes(node_type).astype(params_z.dtype)
    idx_a, _ = moves.sample_pick_node(k_pa, node_type, sizes, biased, D)
    h = moves_da.subtree_height(node_type, idx_a, tables)
    mda = D - (h - 1)
    hole = moves_da.sample_random_path(k_path, idx_a, mda, tables, D)
    force_cp = node_type[idx_a] == C.CHANGEPOINT
    nt_mv, pz_mv = moves_da.move_subtree(node_type, params_z, idx_a, hole,
                                         tables)
    nt_att, pz_att = moves_da.sample_aux(k_aux, nt_mv, pz_mv, idx_a, hole,
                                         force_cp, tables)
    # Reverse detach: promote subtree(hole) back to a.
    nt_rt, pz_rt = moves_da.move_subtree(nt_att, pz_att, hole, idx_a,
                                         tables)
    return _states_equal(nt_rt, pz_rt, node_type, params_z)


def roundtrip_all(key, node_type, params_z, tables,
                  changepoints: bool = True, biased=False):
    """All three move round trips for one trace. Returns bool[3]:
    (subtree_replace, detach, attach)."""
    k1, k2, k3 = jax.random.split(key, 3)
    sr = subtree_replace_roundtrip(k1, node_type, params_z, tables,
                                   changepoints, biased)
    de = detach_roundtrip(k2, node_type, params_z, tables, biased)
    at = attach_roundtrip(k3, node_type, params_z, tables, changepoints,
                          biased)
    return jnp.stack([sr, de, at])


def trace_structurally_valid(node_type, changepoints: bool = True):
    """Jit-friendly heap-invariant check for one trace (the in-program
    Gen.check_observations analog: observations cannot change here by
    construction, so trace integrity is what `check=true` must guard).

    Valid iff: root slot active with a known code; every non-root slot is
    active exactly when its parent is an operator; every active slot
    holds a known code; ChangePoint appears only when permitted and only
    at the root or directly below another ChangePoint (GP.jl node
    distribution, src/GP.jl:1099-1138)."""
    from autogp_tpu import gp_math

    M_ = node_type.shape[0]
    t = node_type
    known = gp_math.is_leaf_code(t) | gp_math.is_op_code(t)
    s = jnp.arange(M_)
    par = jnp.maximum((s - 1) // 2, 0)
    parent_is_op = gp_math.is_op_code(t[par])
    active = t > 0
    ok = known[0] & active[0]
    ok &= jnp.all((active[1:] == parent_is_op[1:]) & (known[1:] | ~active[1:]))
    is_cp = t == C.CHANGEPOINT
    at_root = s == 0
    cp_ok = (~is_cp) | ((at_root | (t[par] == C.CHANGEPOINT))
                        & jnp.asarray(changepoints))
    ok &= jnp.all(cp_ok)
    return ok
