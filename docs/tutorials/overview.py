# %% [markdown]
# # Overview: structure discovery on the airline passengers series
#
# Executable analog of the reference's `overview.ipynb`
# (/root/reference/docs/src/tutorials/overview.ipynb): fit an ensemble of
# GP covariance structures to the monthly airline passengers series
# (tsdl.161), forecast with uncertainty bands, score held-out data, and
# stream new observations in online.
#
# Reference configuration (overview.md:104,244): n_particles=6,
# linear_schedule(n_train, .10), n_mcmc=75, n_hmc=10.

# %%
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (FAST, load_tsdl161, train_test_split, maybe_force_cpu,
                     plot_forecasts)

maybe_force_cpu()

import numpy as np
import autogp_tpu
from autogp_tpu import Schedule

df = load_tsdl161()
if FAST:  # CI smoke: subsample to keep CPU compile size small
    df = df.iloc[::3].reset_index(drop=True)
df_train, df_test = train_test_split(df, 0.8)
n_train = len(df_train)
print(f"{len(df)} observations; {n_train} train / {len(df_test)} test")

# %% Initialize the model: particles are sampled from the PCFG prior.
n_particles = 2 if FAST else 6
cfg = autogp_tpu.GPConfig(max_depth=3) if FAST else None
autogp_tpu.seed(6)
model = autogp_tpu.GPModel(df_train["ds"], df_train["y"].to_numpy(),
                           n_particles=n_particles, config=cfg)

# Query horizon: observed + test + 36 months ahead.
ds_future = df["ds"].max() + np.arange(1, 37) * (df["ds"].iloc[1]
                                                 - df["ds"].iloc[0])
ds_query = np.concatenate([df["ds"].to_numpy(), np.asarray(ds_future)])

# Prior forecasts (structures sampled from the prior, not yet fit).
forecasts_prior = autogp_tpu.predict(model, ds_query,
                                     quantiles=[0.025, 0.975])
print("prior forecast rows:", len(forecasts_prior))

# %% Fit with SMC structure learning (fit_smc!, api.jl:212-249).
n_mcmc, n_hmc = (4, 4) if FAST else (75, 10)
frac = 0.5 if FAST else 0.10
autogp_tpu.fit_smc(model,
                   schedule=Schedule.linear_schedule(n_train, frac),
                   n_mcmc=n_mcmc, n_hmc=n_hmc, verbose=not FAST)

# %% Inspect the discovered ensemble.
for w, k in zip(model.particle_weights(), model.covariance_kernels()):
    print(f"weight {w:.3f}: {autogp_tpu.GP.pretty(k)}")
print("log marginal likelihood estimate:",
      model.log_marginal_likelihood_estimate())

# %% Forecasts + held-out predictive probability.
forecasts = autogp_tpu.predict(model, ds_query, quantiles=[0.025, 0.975])
plot_forecasts(df_train, df_test, forecasts, name="overview_fit.png",
               title="tsdl.161 after fit_smc")

logps = autogp_tpu.predict_proba(model, df_test["ds"],
                                 df_test["y"].to_numpy())
print(logps)

# The full predictive distribution as a particle-weighted MVN mixture.
mvn = autogp_tpu.predict_mvn(model, df_test["ds"])
print("mixture components:", mvn.n_components, "dim:", mvn.dim)

# %% Online learning: absorb the test data, reweight, rejuvenate.
print("weights before add_data:", model.particle_weights())
autogp_tpu.add_data(model, df_test["ds"], df_test["y"].to_numpy())
print("weights after add_data:", model.particle_weights())
autogp_tpu.maybe_resample(model, ess_threshold=model.num_particles / 2)
autogp_tpu.mcmc_structure(model, n_mcmc=2 if FAST else 10,
                          n_hmc=2 if FAST else 10)

forecasts_final = autogp_tpu.predict(model, ds_query,
                                     quantiles=[0.025, 0.975])
plot_forecasts(df, None, forecasts_final, name="overview_online.png",
               title="tsdl.161 after online update")
print("OVERVIEW TUTORIAL OK")
