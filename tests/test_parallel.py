"""Multi-device tests on the 8 virtual CPU devices (SURVEY.md §4).

The particle mesh is pure data parallelism; resampling's collectives are
inserted by XLA from sharding annotations. A sharded SMC round must
produce the same results as the unsharded program (same keys).
"""

import os

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
@pytest.mark.slow  # compile-heavy sharded round, ~45 s
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
@pytest.mark.slow  # subprocess dryrun compile, ~45 s
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


@pytest.mark.slow  # two-process fit, ~6 min (largest single test)
def test_multihost_two_process():
    """REAL multi-process execution (SURVEY §5.8): two jax.distributed
    processes on localhost, 4 virtual CPU devices each, drive
    api.fit_smc over the global 8-device mesh — resampling collectives
    cross the process boundary — and each process asserts its addressable
    shards are bit-identical to the unsharded single-device reference
    (tests/multihost_worker.py)."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            ["python", worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "OK" in out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow  # full sharded driver, ~40 s
def test_fit_smc_mesh_matches_unsharded_full_driver():
    """Multi-chip through the PUBLIC API (VERDICT r2 next #1): GPModel +
    fit_smc with an 8-device mesh must run the FULL annealing driver
    (init -> reweight -> resample -> rejuvenate, several rounds) with the
    particle batch sharded throughout, and produce results identical to
    the unsharded fit (the reference's parallelism contract, api.jl:95)."""
    import autogp_tpu

    rng = np.random.default_rng(4)
    n = 24
    ts = np.linspace(0, 1, n)
    xs = np.sin(8 * ts) + 0.1 * rng.standard_normal(n)

    def fit(mesh):
        autogp_tpu.seed(21)
        m = autogp_tpu.GPModel(ts, xs, n_particles=16, config=CFG,
                               mesh=mesh)
        autogp_tpu.fit_smc(
            m, schedule=[8, 16, 24], n_mcmc=2, n_hmc=1,
            adaptive_resampling=False,  # force resampling collectives
            hmc_config={"L_param": 3, "L_noise": 3, "n_exit": 1})
        return m

    ref = fit(None)
    shd = fit(8)

    # Actually sharded, across all 8 devices, at the end of the run.
    assert len(shd.particles.node_type.sharding.device_set) == 8
    # Identical results through the whole driver.
    np.testing.assert_array_equal(np.asarray(shd.particles.node_type),
                                  np.asarray(ref.particles.node_type))
    np.testing.assert_array_equal(np.asarray(shd.particles.parents),
                                  np.asarray(ref.particles.parents))
    for name in ("params", "noise_z", "log_weights", "lml"):
        np.testing.assert_allclose(
            np.asarray(getattr(shd.particles, name)),
            np.asarray(getattr(ref.particles, name)), rtol=1e-12, atol=0)
    np.testing.assert_allclose(float(shd.particles.log_ml_est),
                               float(ref.particles.log_ml_est), rtol=1e-12)

    # Downstream API works straight off the sharded batch.
    np.testing.assert_allclose(shd.particle_weights(),
                               ref.particle_weights(), rtol=1e-12)
    p_ref = autogp_tpu.predict(ref, ts[:6], quantiles=[0.1])
    p_shd = autogp_tpu.predict(shd, ts[:6], quantiles=[0.1])
    np.testing.assert_allclose(p_shd["y_mean"].to_numpy(),
                               p_ref["y_mean"].to_numpy(), rtol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gpmodel_mesh_initialize_sharded_and_streaming():
    """Construction draws the prior batch directly onto the mesh; the
    streaming path (add_data / maybe_resample) keeps it there."""
    import autogp_tpu
    from autogp_tpu import api

    rng = np.random.default_rng(5)
    n = 20
    ts = np.linspace(0, 1, n)
    xs = np.sin(8 * ts) + 0.1 * rng.standard_normal(n)

    autogp_tpu.seed(22)
    m = autogp_tpu.GPModel(ts[:18], xs[:18], n_particles=8, config=CFG,
                           mesh=8)
    assert len(m.particles.node_type.sharding.device_set) == 8

    autogp_tpu.seed(22)
    m_ref = autogp_tpu.GPModel(ts[:18], xs[:18], n_particles=8, config=CFG)
    np.testing.assert_array_equal(np.asarray(m.particles.node_type),
                                  np.asarray(m_ref.particles.node_type))
    np.testing.assert_allclose(np.asarray(m.particles.lml),
                               np.asarray(m_ref.particles.lml), rtol=1e-12)

    autogp_tpu.add_data(m, ts[18:], xs[18:])
    autogp_tpu.add_data(m_ref, ts[18:], xs[18:])
    assert len(m.particles.lml.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(m.particles.log_weights),
                               np.asarray(m_ref.particles.log_weights),
                               rtol=1e-12)
    api.maybe_resample(m, float(m.num_particles))
    assert not np.isnan(np.asarray(m.particles.log_weights)).any()

    with pytest.raises(ValueError):
        autogp_tpu.GPModel(ts, xs, n_particles=6, config=CFG, mesh=8)
