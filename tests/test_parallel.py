"""Multi-device tests on the 8 virtual CPU devices (SURVEY.md §4).

The particle mesh is pure data parallelism; resampling's collectives are
inserted by XLA from sharding annotations. A sharded SMC round must
produce the same results as the unsharded program (same keys).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autogp_tpu import model
from autogp_tpu.config import GPConfig
from autogp_tpu.inference import hmc as hmc_mod
from autogp_tpu.inference import smc
from autogp_tpu.parallel import mesh as pmesh

CFG = GPConfig(max_depth=3)
TAB = model.prior_tables(CFG)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_smc_round_matches_unsharded():
    P = 16
    rng = np.random.default_rng(0)
    n = 24
    ts = np.linspace(0, 1, n)
    xs = np.sin(8 * ts) + 0.1 * rng.standard_normal(n)
    data = smc.make_dataset(ts, xs, pad_to=32)
    parts = smc.initialize(jax.random.PRNGKey(0), P, data, CFG, TAB)

    hc = hmc_mod.HMCConfig(n_exit=1, L_param=3, L_noise=3)
    fn = smc.smc_round_jit(CFG, TAB, n_mcmc=2, n_hmc=1, biased=False,
                           hmc_cfg=hc, infer_noise=True,
                           allow_resample=True, ess_threshold=P / 2,
                           adaptive_rejuvenation=False)
    key = jax.random.PRNGKey(7)
    ref, ref_stats = fn(key, parts, data)

    m = pmesh.particle_mesh(8)
    parts_s = pmesh.shard_particles(parts, m)
    data_s = pmesh.replicate_dataset(data, m)
    out, out_stats = fn(key, parts_s, data_s)

    assert len(out.node_type.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out.node_type),
                                  np.asarray(ref.node_type))
    np.testing.assert_allclose(np.asarray(out.log_weights),
                               np.asarray(ref.log_weights), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.lml), np.asarray(ref.lml),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out.log_ml_est),
                               float(ref.log_ml_est), rtol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_graft_entry_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    g.dryrun_multichip(8)


@pytest.mark.skipif(
    not (__import__("os").environ.get("AUTOGP_MULTIHOST") == "1"
         and jax.process_count() > 1),
    reason="multi-host skeleton: set AUTOGP_MULTIHOST=1 and run one "
           "process per host after jax.distributed.initialize() "
           "(parallel/README.md)")
def test_multihost_skeleton():
    """2+ process SMC round over a process-spanning mesh (DCN collectives
    only at resampling). The caller is responsible for
    jax.distributed.initialize() before JAX init."""
    P = 4 * jax.device_count()  # global particle count
    rng = np.random.default_rng(0)
    n = 24
    ts = np.linspace(0, 1, n)
    xs = np.sin(8 * ts) + 0.1 * rng.standard_normal(n)
    data = smc.make_dataset(ts, xs, pad_to=32)
    # Initialize ON-DEVICE under the global sharding: every process runs
    # the same program; jax places each particle's generate on its shard.
    m = pmesh.particle_mesh()
    parts = smc.initialize(jax.random.PRNGKey(0), P, data, CFG, TAB)
    parts = pmesh.shard_particles(parts, m)
    data = pmesh.replicate_dataset(data, m)
    hc = hmc_mod.HMCConfig(n_exit=1, L_param=3, L_noise=3)
    fn = smc.smc_round_jit(CFG, TAB, n_mcmc=1, n_hmc=1, biased=False,
                           hmc_cfg=hc, infer_noise=True,
                           allow_resample=True, ess_threshold=P / 2,
                           adaptive_rejuvenation=False)
    out, _ = fn(jax.random.PRNGKey(7), parts, data)
    assert np.isfinite(np.asarray(out.log_weights)).all()
