"""Per-move check=true semantics (Gen.metropolis_hastings(..., check),
reference inference_smc_anneal_data.jl:90-96): the round-trip + trace-
integrity checks run INSIDE every MH step, so a transient mid-round
corruption is caught even when the final state looks healthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autogp_tpu import config as C
from autogp_tpu import model
from autogp_tpu import kernels as K
from autogp_tpu import tree
from autogp_tpu.config import GPConfig
from autogp_tpu.inference import check as check_mod
from autogp_tpu.inference import hmc as hmc_mod
from autogp_tpu.inference import moves, smc

CFG = GPConfig(max_depth=3)
TABLES = model.prior_tables(CFG)
HC = hmc_mod.HMCConfig(L_param=2, L_noise=2, n_exit=1)


def _leaf_particles(P=4):
    """Particle batch whose every tree is a single root leaf."""
    nt, pz = tree.node_to_tensor(K.Linear(0.7), CFG)
    return smc.Particles(
        node_type=jnp.tile(jnp.asarray(nt)[None], (P, 1)),
        params=jnp.tile(jnp.asarray(pz, jnp.float64)[None], (P, 1, 1)),
        noise_z=jnp.zeros((P,), jnp.float64),
        log_weights=jnp.zeros((P,), jnp.float64),
        lml=jnp.zeros((P,), jnp.float64),
        log_ml_est=jnp.asarray(0.0, jnp.float64),
        parents=jnp.arange(P, dtype=jnp.int32))


def _data(n=16):
    rng = np.random.default_rng(0)
    ts = np.linspace(0, 1, n)
    xs = np.sin(5 * ts) + 0.1 * rng.standard_normal(n)
    return smc.make_dataset(ts, xs, pad_to=n)


def test_trace_structurally_valid():
    good = [K.Linear(0.7), K.Linear(1.0) + K.Periodic(1.0, 2.0),
            (K.Linear(1.0) * K.SquaredExponential(0.5)) + K.Constant(2.0)]
    for k in good:
        nt, _ = tree.node_to_tensor(k, CFG)
        assert bool(check_mod.trace_structurally_valid(jnp.asarray(nt)))
    nt, _ = tree.node_to_tensor(K.Linear(0.7), CFG)
    # Active child below a leaf root.
    bad1 = jnp.asarray(nt).at[2].set(C.LINEAR)
    assert not bool(check_mod.trace_structurally_valid(bad1))
    # Unknown code at the root.
    bad2 = jnp.asarray(nt).at[0].set(99)
    assert not bool(check_mod.trace_structurally_valid(bad2))
    # Inactive root.
    bad3 = jnp.asarray(nt).at[0].set(0)
    assert not bool(check_mod.trace_structurally_valid(bad3))
    # ChangePoint below a non-ChangePoint operator.
    nt4, _ = tree.node_to_tensor(K.Linear(1.0) + K.Periodic(1.0, 2.0), CFG)
    bad4 = jnp.asarray(nt4).at[1].set(C.CHANGEPOINT)
    assert not bool(check_mod.trace_structurally_valid(bad4))
    # ... but a root ChangePoint is fine when permitted, invalid when not.
    cp = K.ChangePoint(K.Linear(1.0), K.Periodic(1.0, 2.0), 0.5, 0.1)
    nt5, _ = tree.node_to_tensor(cp, GPConfig(max_depth=3,
                                              changepoints=True))
    assert bool(check_mod.trace_structurally_valid(jnp.asarray(nt5),
                                                   changepoints=True))
    assert not bool(check_mod.trace_structurally_valid(jnp.asarray(nt5),
                                                       changepoints=False))


def test_per_move_check_catches_transient_corruption(monkeypatch):
    """A buggy move that corrupts the heap on step 1 and restores it on
    step 2 passes the final-state sweep but MUST be flagged by the
    per-move mode."""
    parts = _leaf_particles()
    data = _data()

    def toggling_step(key, nt, pz, nz, lml, d, cfg, tables, biased=False):
        # Leaf root => slot 2 inactive (0). Toggle it to an active child
        # under a non-operator parent (structurally invalid), back on the
        # next call.
        corrupted = nt[2] == 0
        nt2 = jnp.where(corrupted, nt.at[2].set(C.LINEAR),
                        nt.at[2].set(0))
        return moves.MHResult(node_type=nt2, params=pz, lml=lml,
                              accepted=jnp.asarray(False))

    monkeypatch.setattr(moves, "tree_rejuvenation_step", toggling_step)

    out, n_acc, n_sw, ok = smc.rejuvenate_structure(
        jax.random.PRNGKey(0), parts, data, CFG, TABLES, n_mcmc=2,
        n_hmc=0, biased=False, hmc_cfg=HC, infer_noise=True, check=True)
    # Final state is clean again: the per-round sweep cannot see the bug.
    smc.validate_particles(out, CFG)
    np.testing.assert_array_equal(np.asarray(out.node_type),
                                  np.asarray(parts.node_type))
    # ... but the per-move structural check caught the transient.
    assert not np.asarray(ok)[:, 0].any()

    # Without check=True nothing is flagged (the ok output is all-True).
    out2, _, _, ok2 = smc.rejuvenate_structure(
        jax.random.PRNGKey(0), parts, data, CFG, TABLES, n_mcmc=2,
        n_hmc=0, biased=False, hmc_cfg=HC, infer_noise=True, check=False)
    assert np.asarray(ok2).all()


def test_check_true_green_on_real_kernel():
    """check=True through the real rejuvenation kernel: round trips and
    structural validity hold at every step."""
    data = _data()
    parts = smc.initialize(jax.random.PRNGKey(4), 6, data, CFG, TABLES)
    out, _, _, ok = smc.rejuvenate_structure(
        jax.random.PRNGKey(5), parts, data, CFG, TABLES, n_mcmc=3,
        n_hmc=1, biased=False, hmc_cfg=HC, infer_noise=True, check=True)
    assert np.asarray(ok).all()
    smc.validate_particles(out, CFG, tables=TABLES,
                           key=jax.random.PRNGKey(6))


def test_fit_smc_check_end_to_end():
    """The driver surfaces per-move check results (and stays green on a
    healthy run)."""
    import autogp_tpu
    rng = np.random.default_rng(1)
    n = 16
    ts = np.linspace(0, 1, n)
    xs = np.sin(5 * ts) + 0.1 * rng.standard_normal(n)
    autogp_tpu.seed(9)
    m = autogp_tpu.GPModel(ts, xs, n_particles=4, config=CFG)
    autogp_tpu.fit_smc(m, schedule=[8, 16], n_mcmc=2, n_hmc=1,
                       check=True,
                       hmc_config={"L_param": 2, "L_noise": 2, "n_exit": 1})
    assert np.isfinite(np.asarray(m.particles.lml)).all()
