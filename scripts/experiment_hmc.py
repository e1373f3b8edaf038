"""HMC ground-truth-recovery experiment (reference: test/experiment_hmc.jl).

Workload of BASELINE.md config 2: fixed kernel structure, HMC over the
numeric hyperparameters, ground-truth simulated data, held-out predictive
log-probability tracked per step. Includes the reference's Bayes-rule
oracle: predictive logp via the conditional MVN must equal the difference
of joint and marginal generate weights (experiment_hmc.jl:111-132).

Usage: BENCHMARK=2 N=1000 N_OBS=200 N_STEPS=100 python scripts/experiment_hmc.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import autogp_tpu
from autogp_tpu import GP, GPConfig
from autogp_tpu import config as C
from autogp_tpu import gp_math, model, tree
from autogp_tpu.inference import hmc as hmc_mod
from autogp_tpu.inference import smc

BENCHMARKS = {
    1: (GP.SquaredExponential(2.0), 0.01),
    2: (GP.Linear(0.5) + GP.Periodic(2.0, 1.0), 0.05),
    3: (GP.ChangePoint(GP.Linear(0.5), GP.Linear(1.5), 1.0, 0.001), 0.001),
}


def main():
    return run(bench=int(os.environ.get("BENCHMARK", 2)),
               n=int(os.environ.get("N", 1000)),
               n_obs=int(os.environ.get("N_OBS", 200)),
               n_steps=int(os.environ.get("N_STEPS", 100)),
               seed=int(os.environ.get("SEED", 0)),
               eps=float(os.environ.get("EPS", 0.1)))


def run(bench=2, n=1000, n_obs=200, n_steps=100, seed=0, eps=0.1,
        verbose=True):
    """Run the experiment; returns a metrics dict (CI-asserted in fast
    mode by tests/test_experiment_hmc.py)."""
    cfg = GPConfig(changepoints=True, max_depth=4)
    tables = model.prior_tables(cfg)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    rng = np.random.default_rng(seed)

    node_true, noise_true = BENCHMARKS[bench]
    nz_true = float(model.untransform_param("noise", noise_true, cfg))
    if verbose:
        print(f"True structure: {GP.pretty(node_true)} noise={noise_true}")

    # Simulate ground truth on an n-point grid; observe a prefix.
    ts = np.linspace(0, 10, n)
    Kt = GP.compute_cov_matrix_vectorized(
        node_true, float(model.transform_noise(nz_true, cfg)), ts)
    xs = rng.multivariate_normal(np.zeros(n), Kt)
    perm = rng.permutation(n)
    obs_idx = np.sort(perm[:n_obs])
    test_idx = np.sort(perm[n_obs:])
    ts_obs, xs_obs = ts[obs_idx], xs[obs_idx]
    ts_test, xs_test = ts[test_idx], xs[test_idx]

    nt, pz_true = tree.node_to_tensor(node_true, cfg)
    nt = jnp.asarray(nt)

    data = smc.make_dataset(ts_obs, xs_obs, dtype=dtype)
    d = (data.ts, data.xs, data.mask)

    def lp_test(pz, nz):
        """Held-out predictive log-probability via the conditional MVN."""
        pt = model.transform_params(nt, pz, jnp.asarray(tables.ttable,
                                                        dtype))
        noise = model.transform_noise(nz, cfg)
        mu, cov = gp_math.posterior_mvn_masked(
            nt, pt, noise, data.ts, data.xs, data.mask,
            jnp.asarray(ts_test, dtype), cfg.depth_cap)
        return gp_math.mvn_logpdf(mu, cov, jnp.asarray(xs_test, dtype))

    # --- Bayes-rule oracle (experiment_hmc.jl:111-132) --------------------
    pz_j = jnp.asarray(pz_true, dtype)
    nz_j = jnp.asarray(nz_true, dtype)
    data_joint = smc.make_dataset(np.concatenate([ts_obs, ts_test]),
                                  np.concatenate([xs_obs, xs_test]),
                                  dtype=dtype)
    w_joint = model.lml(nt, pz_j, nz_j, data_joint.ts, data_joint.xs,
                        data_joint.mask, cfg, tables, pallas=False)
    w_obs = model.lml(nt, pz_j, nz_j, data.ts, data.xs, data.mask, cfg,
                      tables, pallas=False)
    lp_bayes = float(w_joint - w_obs)
    lp_ll = float(lp_test(pz_j, nz_j))
    if verbose:
        print(f"predictive logp: conditional={lp_ll:.6f} bayes={lp_bayes:.6f} "
              f"diff={abs(lp_ll - lp_bayes):.2e}")
    # f64: near-exact identity. f32: each of the n_test log-terms carries
    # ~1e-4 roundoff, so the identity holds to ~3e-4 * n_test.
    tol = (max(1e-6 * abs(lp_bayes), 1e-3) if dtype == jnp.float64
           else max(1e-4 * abs(lp_bayes), 3e-4 * len(ts_test)))
    assert abs(lp_ll - lp_bayes) < tol, \
        f"Bayes-rule oracle failed: diff {abs(lp_ll - lp_bayes)} > {tol}"

    # --- HMC from a prior draw (z ~ N(0,1), as the reference generates
    # its initial trace; a uniform[-2,2] init can land the period in a
    # gradient-blowup region where every trajectory diverges) -------------
    pmask = np.asarray(tree.param_mask(nt))
    pz0 = jnp.asarray(rng.standard_normal(pz_true.shape) * pmask, dtype)
    nz0 = jnp.asarray(rng.standard_normal(), dtype)

    # Gen.hmc defaults (eps=0.1, L=10) as used by experiment_hmc.jl:237.
    hc = hmc_mod.HMCConfig(L_param=10, eps_param=eps, L_noise=10,
                           eps_noise=eps, n_exit=10 ** 9)

    @jax.jit
    def hmc_step(key, pz, nz, lml):
        pz, nz, lml, n_acc, _sw = hmc_mod.rejuvenate_parameters(
            key, nt, pz, nz, lml, d, cfg, tables, 1, hc, True)
        return pz, nz, lml, n_acc

    lml0 = model.lml(nt, pz0, nz0, data.ts, data.xs, data.mask, cfg,
                     tables)
    lp_init = float(lp_test(pz0, nz0))
    if verbose:
        print(f"init: score={float(lml0):.3f} lp_test={lp_init:.3f} "
              f"(true lp_test={lp_ll:.3f})")

    key = jax.random.PRNGKey(seed)
    pz, nz, lml = pz0, nz0, lml0
    t_total = 0.0
    acc_total = 0
    for i in range(1, n_steps + 1):
        key, k = jax.random.split(key)
        t0 = time.time()
        pz, nz, lml, n_acc = hmc_step(k, pz, nz, lml)
        jax.block_until_ready(lml)
        t_total += time.time() - t0
        acc_total += int(n_acc)
        if verbose and i % max(1, n_steps // 10) == 0:
            print(f"step {i:4d} acc={acc_total}/{i} "
                  f"lml={float(lml):10.3f} "
                  f"lp_test={float(lp_test(pz, nz)):10.3f}")

    lp_final = float(lp_test(pz, nz))
    if verbose:
        print(f"Completed {n_steps} HMC steps in {t_total:.2f}s "
              f"(avg {t_total / n_steps * 1000:.1f} ms/step)")
        print("inferred kernel:",
              tree.tensor_to_node(np.asarray(nt), np.asarray(pz), cfg))
        print("inferred noise:",
              float(model.transform_noise(float(nz), cfg)))
    return {"lp_bayes": lp_bayes, "lp_true": lp_ll, "lp_init": lp_init,
            "lp_final": lp_final, "lml_init": float(lml0),
            "lml_final": float(lml), "acc_rate": acc_total / n_steps,
            "ms_per_step": t_total / n_steps * 1000}


if __name__ == "__main__":
    main()
