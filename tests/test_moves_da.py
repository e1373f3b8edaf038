"""Detach-attach move tests.

The decisive oracle: with NO data the posterior equals the prior, so the
full umbrella kernel (subtree-replace + detach-attach) must leave the
exactly-enumerable structure distribution of a depth-2 grammar invariant.
Density errors in the aux-tree / path / pick terms show up as drift.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autogp_tpu import config as C
from autogp_tpu import model, tree
from autogp_tpu import kernels as K
from autogp_tpu.config import GPConfig
from autogp_tpu.inference import moves, moves_da

CFG3 = GPConfig(max_depth=3)
TAB3 = model.prior_tables(CFG3)


def empty_data(size=16):
    z = jnp.zeros((size,), jnp.float64)
    return (z, z, z)


def test_move_subtree_up_and_down():
    node = (K.Linear(1.0) + K.Periodic(1.0, 1.0)) * K.Linear(2.0)
    nt, pz = tree.node_to_tensor(node, CFG3)
    nt = jnp.asarray(nt); pz = jnp.asarray(pz)
    # Move subtree at slot 1 (the Plus) up to the root.
    nt2, pz2 = moves_da.move_subtree(nt, pz, jnp.asarray(1),
                                     jnp.asarray(0), TAB3)
    got = tree.tensor_to_node(np.asarray(nt2), np.asarray(pz2), CFG3)
    assert got.isapprox(K.Linear(1.0) + K.Periodic(1.0, 1.0))
    # Move a leaf up: subtree at slot 4 (Periodic) to root.
    nt3, pz3 = moves_da.move_subtree(nt, pz, jnp.asarray(4),
                                     jnp.asarray(0), TAB3)
    got3 = tree.tensor_to_node(np.asarray(nt3), np.asarray(pz3), CFG3)
    assert got3.isapprox(K.Periodic(1.0, 1.0))
    # Move down: leaf at slot 2 into slot 5 region (child of slot 2).
    nt4, pz4 = moves_da.move_subtree(nt, pz, jnp.asarray(2),
                                     jnp.asarray(5), TAB3)
    assert int(nt4[5]) == int(nt[2])
    np.testing.assert_allclose(np.asarray(pz4[5]), np.asarray(pz[2]))
    # Slots outside subtree(5) preserved except 5's subtree.
    assert int(nt4[2]) == int(nt[2])


def test_path_between_and_density():
    # path from root (0) to slot 5 = right child of 1? 5 = 2*2+1 -> left
    # child of 2; 2 = right child of 0. dirs: [1, 0].
    p = moves_da.path_between(jnp.asarray(0), jnp.asarray(5), TAB3, 3)
    assert int(p.stop_level) == 2
    assert np.asarray(p.dirs)[:2].tolist() == [1, 0]

    # Density of generate_random_path from 0: levels continue at .5 each,
    # dirs .5 each, stop at .5 unless at max_depth_aux.
    lp = moves_da.logq_random_path(jnp.asarray(0), jnp.asarray(5),
                                   jnp.asarray(3), TAB3, jnp.float64)
    # continue at level0 (.5), dir (.5), continue level1 (.5), dir (.5),
    # stop at depth 3 == max_depth_aux -> forced (1.0)
    np.testing.assert_allclose(float(lp), 4 * np.log(0.5), rtol=1e-12)
    # Total probability over all reachable holes = 1.
    total = 0.0
    for hole in range(7):
        lq = float(moves_da.logq_random_path(
            jnp.asarray(0), jnp.asarray(hole), jnp.asarray(3), TAB3,
            jnp.float64))
        total += np.exp(lq)
    np.testing.assert_allclose(total, 1.0, rtol=1e-12)
    # Sampled frequencies match the densities.
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    holes = jax.jit(jax.vmap(
        lambda k: moves_da.sample_random_path(k, jnp.asarray(0),
                                              jnp.asarray(3), TAB3, 3)))(keys)
    holes = np.asarray(holes)
    for h in range(7):
        want = np.exp(float(moves_da.logq_random_path(
            jnp.asarray(0), jnp.asarray(h), jnp.asarray(3), TAB3,
            jnp.float64)))
        got = (holes == h).mean()
        assert abs(got - want) < 0.03, (h, got, want)


def test_aux_sample_density_consistency():
    """sample_aux draws have the density aux_logpdf claims (MC check via
    importance identity E_q[1] = 1 is trivial; instead check discrete
    structure frequencies against exp(sum of type log-probs))."""
    node = (K.Linear(1.0) + K.Periodic(1.0, 1.0)) * K.Linear(2.0)
    nt, pz = tree.node_to_tensor(node, CFG3)
    nt = jnp.asarray(nt); pz = jnp.asarray(pz)
    a = jnp.asarray(0)
    hole = jnp.asarray(2)   # bury current tree at slot 2? hole=2, path 0->2
    force_cp = jnp.asarray(False)

    nt_mv, pz_mv = moves_da.move_subtree(nt, pz, a, hole, TAB3)
    keys = jax.random.split(jax.random.PRNGKey(1), 2000)

    def draw(k):
        nta, pza = moves_da.sample_aux(k, nt_mv, pz_mv, a, hole, force_cp,
                                       TAB3)
        return nta

    nts = np.asarray(jax.jit(jax.vmap(draw))(keys))
    # Root slot must be an operator (on path), slot 1 a sampled subtree,
    # slot 2 subtree preserved (the moved tree would go there).
    assert np.isin(nts[:, 0], [C.PLUS, C.TIMES, C.CHANGEPOINT]).all()
    # Frequency of root CHANGEPOINT matches ops-renormalized model dist.
    d = np.asarray(CFG3.node_dist_cp)
    ops = d[5:8] / d[5:8].sum()
    freq_cp = (nts[:, 0] == C.CHANGEPOINT).mean()
    assert abs(freq_cp - ops[2]) < 0.03
    # And aux_logpdf of each draw is finite.
    lps = jax.jit(jax.vmap(
        lambda t: moves_da.aux_logpdf(t, jnp.zeros_like(pz), a, hole,
                                      force_cp, TAB3)))(jnp.asarray(nts))
    assert np.isfinite(np.asarray(lps)).all()


def _structure_key(nts):
    """Encode depth-2 structures as root*100 + left*10 + right."""
    return nts[:, 0] * 100 + nts[:, 1] * 10 + nts[:, 2]


def test_umbrella_kernel_preserves_prior_depth2():
    """Enumerable check: depth-2 grammar, empty data. The chain's
    stationary structure distribution must equal the prior exactly."""
    cfg = GPConfig(max_depth=2)
    tab = model.prior_tables(cfg)
    P = 384
    steps = 25
    keys = jax.random.split(jax.random.PRNGKey(2), P)
    nt0, pz0 = jax.vmap(
        lambda k: model.sample_tree(k, tab, dtype=jnp.float64))(keys)
    noise = jnp.zeros((P,), jnp.float64)
    lml0 = jnp.zeros((P,), jnp.float64)
    data = empty_data()

    def chain(key, nt, pz, nz, lml):
        def body(carry, k):
            nt, pz, lml = carry
            r = moves.tree_rejuvenation_step(k, nt, pz, nz, lml, data, cfg,
                                             tab)
            return (r.node_type, r.params, r.lml), r.accepted
        (nt, pz, lml), acc = jax.lax.scan(body, (nt, pz, lml),
                                          jax.random.split(key, steps))
        return nt, acc.mean()

    keys2 = jax.random.split(jax.random.PRNGKey(3), P)
    nt1, acc = jax.jit(jax.vmap(chain))(keys2, nt0, pz0, noise, lml0)
    assert float(jnp.mean(acc)) > 0.2

    # Exact prior probabilities of each structure.
    d_cp = np.asarray(cfg.node_dist_cp)
    d_leaf = np.asarray(cfg.node_dist_leaf)
    probs = {}
    for root in range(1, 9):
        if d_cp[root - 1] == 0:
            continue
        if root in (C.PLUS, C.TIMES, C.CHANGEPOINT):
            for l in range(1, 6):
                for r in range(1, 6):
                    if d_leaf[l - 1] > 0 and d_leaf[r - 1] > 0:
                        probs[root * 100 + l * 10 + r] = (
                            d_cp[root - 1] * d_leaf[l - 1] * d_leaf[r - 1])
        else:
            probs[root * 100] = d_cp[root - 1]
    assert abs(sum(probs.values()) - 1.0) < 1e-12

    got_keys = _structure_key(np.asarray(nt1))
    init_keys = _structure_key(np.asarray(nt0))
    for sk, pw in sorted(probs.items()):
        got = (got_keys == sk).mean()
        ini = (init_keys == sk).mean()
        # Chain frequencies should match prior with MC tolerance.
        tol = 5.0 * np.sqrt(pw * (1 - pw) / P) + 0.012
        assert abs(got - pw) < tol, (sk, got, pw, ini, tol)


def test_umbrella_kernel_preserves_prior_depth3_stats():
    """Depth-3 grammar: summary statistics (size, depth, root type) stay
    at their prior values under the umbrella kernel with empty data."""
    P = 384
    steps = 20
    keys = jax.random.split(jax.random.PRNGKey(4), P)
    nt0, pz0 = jax.vmap(
        lambda k: model.sample_tree(k, TAB3, dtype=jnp.float64))(keys)
    noise = jnp.zeros((P,), jnp.float64)
    lml0 = jnp.zeros((P,), jnp.float64)
    data = empty_data()

    def chain(key, nt, pz, nz, lml):
        def body(carry, k):
            nt, pz, lml = carry
            r = moves.tree_rejuvenation_step(k, nt, pz, nz, lml, data,
                                             CFG3, TAB3)
            return (r.node_type, r.params, r.lml), r.accepted
        (nt, pz, lml), acc = jax.lax.scan(body, (nt, pz, lml),
                                          jax.random.split(key, steps))
        return nt, acc.mean()

    keys2 = jax.random.split(jax.random.PRNGKey(5), P)
    nt1, acc = jax.jit(jax.vmap(chain))(keys2, nt0, pz0, noise, lml0)
    assert float(jnp.mean(acc)) > 0.2

    s0 = np.asarray(jax.vmap(tree.subtree_sizes)(nt0))[:, 0]
    s1 = np.asarray(jax.vmap(tree.subtree_sizes)(nt1))[:, 0]
    assert abs(s0.mean() - s1.mean()) < 0.4, (s0.mean(), s1.mean())
    f0 = np.bincount(np.asarray(nt0)[:, 0], minlength=9)[1:] / P
    f1 = np.bincount(np.asarray(nt1)[:, 0], minlength=9)[1:] / P
    assert np.abs(f0 - f1).max() < 0.09, (f0, f1)
    # All resulting trees are structurally valid.
    nts = np.asarray(nt1)
    for s in range(1, CFG3.max_nodes):
        par = (s - 1) // 2
        is_op = np.isin(nts[:, par], [C.PLUS, C.TIMES, C.CHANGEPOINT])
        assert ((nts[:, s] > 0) == is_op).all()
    # ChangePoints only at the root or under ChangePoints.
    for s in range(1, CFG3.max_nodes):
        par = (s - 1) // 2
        bad = (nts[:, s] == C.CHANGEPOINT) & (nts[:, par] != C.CHANGEPOINT)
        assert not bad.any()
