"""Involution round-trip property tests (Gen.check_round_trip analog).

For every structure move, applying the move and then the reverse move
reconstructed from the recorded choices must restore the trace EXACTLY
(node_type and params bit-identical) — the property the reference asserts
at runtime under check=true (inference_smc_anneal_depth.jl:59-87).

Sweeps >=1,000 random (tree, move) pairs per move type, including trees
at the depth-cap boundary (full-depth trees where attach is forced to
stop and detach promotes across the cap).
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autogp_tpu import GPConfig
from autogp_tpu import config as C
from autogp_tpu import model as M
from autogp_tpu.inference import check as check_mod


def _cfg(**kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return GPConfig(**kw)


def _random_trees(key, tables, n, dtype=jnp.float64):
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: M.sample_tree(k, tables, dtype=dtype))(keys)


@pytest.mark.parametrize("depth,changepoints", [(3, True), (3, False),
                                                (4, True), (5, True)])
def test_roundtrip_sweep(depth, changepoints):
    cfg = _cfg(max_depth=depth, changepoints=changepoints)
    tables = M.prior_tables(cfg)
    n = 400  # x3 moves x4 param sets >= 1,000 pairs per move overall
    nts, pzs = _random_trees(jax.random.PRNGKey(depth * 10 + changepoints),
                             tables, n)
    keys = jax.random.split(jax.random.PRNGKey(99 + depth), n)
    ok = jax.jit(jax.vmap(
        lambda k, nt, pz: check_mod.roundtrip_all(
            k, nt, pz, tables, changepoints=changepoints)))(keys, nts, pzs)
    ok = np.asarray(ok)
    assert ok[:, 0].all(), f"subtree-replace failed: {np.where(~ok[:, 0])}"
    assert ok[:, 1].all(), f"detach failed: {np.where(~ok[:, 1])}"
    assert ok[:, 2].all(), f"attach failed: {np.where(~ok[:, 2])}"


def test_roundtrip_full_depth_trees():
    """Depth-cap boundary: trees whose active height equals the cap."""
    cfg = _cfg(max_depth=4)
    tables = M.prior_tables(cfg)
    n = 512
    nts, pzs = _random_trees(jax.random.PRNGKey(7), tables, n)
    from autogp_tpu import tree as T
    heights = np.asarray(jax.vmap(T.tree_depth)(nts))
    deep = heights == cfg.depth_cap
    assert deep.sum() >= 20, "need full-depth trees in the sweep"
    keys = jax.random.split(jax.random.PRNGKey(8), n)
    ok = np.asarray(jax.jit(jax.vmap(
        lambda k, nt, pz: check_mod.roundtrip_all(k, nt, pz, tables)))(
            keys, nts, pzs))
    assert ok[deep].all()


def test_validate_particles_runs_roundtrip():
    """check=true plumbing: validate_particles runs the round-trip check."""
    from autogp_tpu.inference import smc
    cfg = _cfg(max_depth=3)
    tables = M.prior_tables(cfg)
    data = smc.make_dataset(np.linspace(0, 1, 16), np.zeros(16), pad_to=16,
                            dtype=jnp.float64)
    particles = smc.initialize(jax.random.PRNGKey(0), 8, data, cfg, tables,
                               dtype=jnp.float64)
    smc.validate_particles(particles, cfg, tables=tables,
                           key=jax.random.PRNGKey(1))

    # A corrupted trace (op node with inactive children) must be caught by
    # the structural check before the round-trip stage.
    bad = particles._replace(node_type=particles.node_type.at[0, 0].set(
        C.PLUS).at[0, 1].set(0).at[0, 2].set(0))
    with pytest.raises(AssertionError):
        smc.validate_particles(bad, cfg, tables=tables)
