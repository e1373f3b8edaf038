"""Profile ONE representative online-CLI step (config 5, VERDICT r4 #5).

The online driver (scripts/online.py, mirroring
/root/reference/scripts/online.jl:232-244) pays per step:
  (a) one SMC round (reweight + resample? + rejuvenate) at the current
      data bucket,
  (b) one `predict` over the full query grid (train factor computed
      once per state change via the GPModel._train_factor cache),
  (c) one `predict_proba` on the held-out block (cache HIT — same
      state),
  (d) host-side CSV assembly.

This script reproduces the r4 logged workload state (iclaims, P=8,
N_MCMC=20, N_HMC=10) at a LATE step (n=300 of 354 — per-step cost grows
with the annealing bucket, so late steps dominate the wall-clock) and
times each phase separately, warm. Run on the TPU.

Usage: python scripts/bench_online_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
REPO = "/root/repo"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import pandas as pd
    import autogp_tpu
    from autogp_tpu import GPConfig
    from autogp_tpu import api as A
    from autogp_tpu.inference import hmc as H
    from autogp_tpu.inference import smc

    log(f"devices: {jax.devices()}")

    df = pd.read_csv(os.path.join(REPO, "docs/tutorials/assets/iclaims.csv"))
    ds = pd.to_datetime(df[df.columns[0]])
    y = np.log(df[df.columns[1]].to_numpy(float))
    n_step = 354 - 89          # train prefix of the online run
    n_train = n_step           # late step: all current data observed
    P, n_mcmc, n_hmc = 8, 20, 10

    autogp_tpu.seed(3)
    model = autogp_tpu.GPModel(ds[:n_step], y[:n_step], n_particles=P,
                               config=GPConfig())
    # Reach a representative late state cheaply: a short annealed fit.
    autogp_tpu.fit_smc(model, schedule=[66, 132, 198, n_step], n_mcmc=5,
                       n_hmc=5, verbose=False)

    data = model._dataset(pad_to=smc.bucket_size(n_step))
    hc = H.HMCConfig(n_exit=10)
    round_fn = smc.smc_round_jit(model.config, model.tables, n_mcmc,
                                 n_hmc, False, hc, model.config.noise is
                                 None, True, P / 2, False)
    key = jax.random.PRNGKey(7)

    # Warm every program once (compiles excluded from all timings).
    parts2, _ = round_fn(key, model.particles, data)
    jax.block_until_ready(parts2.log_weights)
    ds_query = np.concatenate([A.to_numeric(ds),
                               A.to_numeric(ds)[-1]
                               + np.arange(1, 27) * 7 * 86400.0])
    t_csv = 0.0

    def one_step(k):
        nonlocal t_csv
        t0 = time.perf_counter()
        parts2, _ = round_fn(k, model.particles, data)
        jax.block_until_ready(parts2.log_weights)
        t_round = time.perf_counter() - t0

        model.particles = parts2  # state change -> factor cache invalid
        t0 = time.perf_counter()
        pred = autogp_tpu.predict(model, ds_query,
                                  quantiles=[0.025, 0.975])
        t_pred = time.perf_counter() - t0

        t0 = time.perf_counter()
        logp = autogp_tpu.predict_proba(model, ds[n_step:],
                                         y[n_step:])
        t_proba = time.perf_counter() - t0

        t0 = time.perf_counter()
        pred["step"] = n_train
        pred.to_csv("/tmp/online_step_probe.csv", index=False)
        t_csv = time.perf_counter() - t0
        return t_round, t_pred, t_proba, t_csv

    one_step(jax.random.PRNGKey(8))  # warm predict/proba programs
    rows = []
    for i in range(3):
        rows.append(one_step(jax.random.PRNGKey(10 + i)))
    arr = np.array(rows)
    t_round, t_pred, t_proba, t_csv = arr.min(axis=0)
    total = arr.sum(axis=1).min()
    log(f"online step breakdown (iclaims, n={n_train}, P={P}, "
        f"n_mcmc={n_mcmc}, n_hmc={n_hmc}; best of 3 warm):")
    log(f"  SMC round      : {t_round:6.3f} s")
    log(f"  predict (grid) : {t_pred:6.3f} s  (factor recomputed: state "
        "changed)")
    log(f"  predict_proba  : {t_proba:6.3f} s  (train-factor cache HIT)")
    log(f"  CSV assembly   : {t_csv:6.3f} s")
    log(f"  TOTAL          : {total:6.3f} s/step")

    # Cache efficacy: second predict against unchanged state.
    t0 = time.perf_counter()
    autogp_tpu.predict(model, ds_query, quantiles=[0.025, 0.975])
    t_pred_hit = time.perf_counter() - t0
    log(f"  predict again (cache hit): {t_pred_hit:6.3f} s "
        f"(vs {t_pred:6.3f} cold)")


if __name__ == "__main__":
    main()
