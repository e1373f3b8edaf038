"""NaN-robustness + streaming-path tests (VERDICT r2 weak #1/#2).

At f32 N~1024 roughly a third of prior-draw covariances produce a
non-finite Cholesky (BENCH.md "NaN parity"); the init/reweight paths must
retry and clamp instead of propagating NaN into the user-facing weights.
The streaming entry points (add_data/remove_data/maybe_resample) must not
re-trace per call.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import autogp_tpu
from autogp_tpu import api, model
from autogp_tpu import config as C
from autogp_tpu.config import GPConfig
from autogp_tpu.inference import smc

CFG = GPConfig(max_depth=3)
TABLES = model.prior_tables(CFG)


def _data(n=24, pad_to=32, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.linspace(0, 1, n)
    xs = np.sin(7 * ts) + 0.1 * rng.standard_normal(n)
    return ts, xs, smc.make_dataset(ts, xs, pad_to=pad_to)


def test_reweight_clamps_nonfinite(monkeypatch):
    """A NaN incremental LML becomes (-inf weight, BAD_LML cache), never a
    NaN weight (inference/smc.py reweight)."""
    _, _, data = _data()
    parts = smc.initialize(jax.random.PRNGKey(0), 8, data, CFG, TABLES)

    orig = smc._lml_all

    def poisoned(nt, pz, nz, d, cfg, tables):
        out = orig(nt, pz, nz, d, cfg, tables)
        return out.at[0].set(jnp.nan).at[3].set(jnp.inf)

    monkeypatch.setattr(smc, "_lml_all", poisoned)
    out = smc.reweight(parts, data, CFG, TABLES)
    lw = np.asarray(out.log_weights)
    lml = np.asarray(out.lml)
    assert lw[0] == -np.inf and lw[3] == -np.inf
    assert lml[0] == smc.BAD_LML and lml[3] == smc.BAD_LML
    assert not np.isnan(lw).any()
    good = [1, 2, 4, 5, 6, 7]
    assert np.isfinite(lw[good]).all() and np.isfinite(lml[good]).all()
    # A later reweight from the clamped state stays NaN-free too.
    monkeypatch.setattr(smc, "_lml_all", orig)
    out2 = smc.reweight(out, data, CFG, TABLES)
    assert not np.isnan(np.asarray(out2.log_weights)).any()
    assert np.isfinite(np.asarray(out2.lml)).all()


def test_initialize_retries_then_clamps(monkeypatch):
    """Non-finite generate-time LMLs are retried with fresh keys; lanes
    that never clear get -inf weight and the finite BAD_LML sentinel."""
    # Unique config so the poisoned trace cannot leak into other tests'
    # jit caches (initialize is content-keyed on cfg.cache_key).
    cfg = GPConfig(max_depth=2, noise=0.12345)
    tab = model.prior_tables(cfg)
    _, _, data = _data()

    orig_lml = model.lml

    def always_nan(nt, pz, nz, ts, xs, mask, config, tables, **kw):
        return jnp.nan * orig_lml(nt, pz, nz, ts, xs, mask, config,
                                  tables, **kw)

    monkeypatch.setattr(model, "lml", always_nan)
    parts = smc.initialize(jax.random.PRNGKey(1), 4, data, cfg, tab)
    lw = np.asarray(parts.log_weights)
    lml = np.asarray(parts.lml)
    assert (lw == -np.inf).all()
    assert (lml == smc.BAD_LML).all()

    # Flaky-LML case: a lane fails until its redraw happens to clear the
    # condition; bounded retries must fix every lane for this seed.
    cfg2 = GPConfig(max_depth=2, noise=0.54321)
    tab2 = model.prior_tables(cfg2)

    def flaky(nt, pz, nz, ts, xs, mask, config, tables, **kw):
        out = orig_lml(nt, pz, nz, ts, xs, mask, config, tables, **kw)
        # Pseudo-random in the draw (params), deterministic in the seed.
        bad = jnp.sin(1e3 * jnp.sum(pz)) > 0.0
        return jnp.where(bad, jnp.nan, out)

    monkeypatch.setattr(model, "lml", flaky)
    parts2 = smc.initialize(jax.random.PRNGKey(2), 8, data, cfg2, tab2,
                            max_retries=8)
    assert np.isfinite(np.asarray(parts2.log_weights)).all()
    assert np.isfinite(np.asarray(parts2.lml)).all()


def test_gpmodel_workflow_finite_with_bad_lanes(monkeypatch):
    """The documented pre-fit workflow (GPModel -> weights -> LML est ->
    predict -> add_data) stays finite when some prior lanes are
    numerically dead (VERDICT r2 weak #1 'Done' criterion)."""
    cfg = GPConfig(max_depth=2, noise=0.2468)
    orig_lml = model.lml

    def half_dead(nt, pz, nz, ts, xs, mask, config, tables, **kw):
        out = orig_lml(nt, pz, nz, ts, xs, mask, config, tables, **kw)
        bad = jnp.sin(1e3 * jnp.sum(pz)) > 0.0
        return jnp.where(bad, jnp.nan, out)

    monkeypatch.setattr(model, "lml", half_dead)
    ts, xs, _ = _data(n=20)
    autogp_tpu.seed(11)
    m = autogp_tpu.GPModel(ts, xs, n_particles=8, config=cfg)
    # Retries should have cleared every lane here; even if not, weights
    # must be non-NaN and the estimates finite.
    w = m.particle_weights()
    assert not np.isnan(w).any()
    assert np.isfinite(m.log_marginal_likelihood_estimate())
    assert np.isfinite(np.asarray(m.particles.lml)).all()
    pred = autogp_tpu.predict(m, ts[:5], quantiles=[0.1, 0.9])
    assert np.isfinite(pred["y_mean"].to_numpy()).all()
    autogp_tpu.add_data(m, ts[-1:] + 0.05, xs[-1:])
    assert not np.isnan(np.asarray(m.particles.log_weights)).any()
    assert np.isfinite(np.asarray(m.particles.lml)).all()


def test_f32_large_n_init_no_nan():
    """f32 initialization at a flagship-style N must yield NaN-free
    weights/LMLs end to end (the measured TPU failure mode: 21/64 NaN
    Cholesky draws at N=1024, BENCH.md)."""
    rng = np.random.default_rng(7)
    n = 512
    ts = np.linspace(0, 1, n)
    xs = np.sin(2 * np.pi * 9 * ts) + 0.05 * rng.standard_normal(n)
    data = smc.make_dataset(ts, xs, pad_to=n, dtype=jnp.float32)
    parts = smc.initialize(jax.random.PRNGKey(3), 16, data, CFG, TABLES,
                           dtype=jnp.float32)
    lw = np.asarray(parts.log_weights)
    assert not np.isnan(lw).any()
    assert np.isfinite(np.asarray(parts.lml)).all()
    # Weight normalization is well-defined even with dead lanes.
    assert not np.isnan(np.asarray(
        smc.normalized_weights(parts.log_weights))).any()


def test_add_data_no_retrace():
    """Second add_data in the same padding bucket performs ZERO new
    traces (the streaming path must be content-key cached, VERDICT r2
    weak #2 / next #4)."""
    ts, xs, _ = _data(n=20)
    autogp_tpu.seed(5)
    m = autogp_tpu.GPModel(ts[:18], xs[:18], n_particles=4, config=CFG)
    autogp_tpu.add_data(m, ts[18:19], xs[18:19])  # n=19 -> bucket 32
    fn = api._reweight_cache[m.config.cache_key]
    n_before = fn._cache_size()
    autogp_tpu.add_data(m, ts[19:20], xs[19:20])  # n=20 -> same bucket
    assert fn._cache_size() == n_before
    autogp_tpu.remove_data(m, ts[19:20])
    assert fn._cache_size() == n_before
    # maybe_resample reuses one module-level jit as well; the threshold
    # is a traced operand, so changing it must not re-trace.
    api.maybe_resample(m, 2.0)
    n_mr = smc.maybe_resample_jit._cache_size()
    api.maybe_resample(m, 3.0)
    assert smc.maybe_resample_jit._cache_size() == n_mr
