# %% [markdown]
# # iclaims: weekly unemployment claims in log space
#
# Executable analog of the reference's `iclaims.ipynb`: model the weekly
# US unemployment insurance claims series on a log scale, fit with SMC
# (fixed resampling schedule), query mixture quantiles, and convert mean
# forecasts back to direct space with the log-normal moment correction.
#
# Reference configuration (iclaims.md): n_particles=8,
# linear_schedule(n_train, .20), n_mcmc=50, n_hmc=10, shuffle=true,
# adaptive_resampling=false.

# %%
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (FAST, load_iclaims, train_test_split, maybe_force_cpu,
                     plot_forecasts)

maybe_force_cpu()

import numpy as np
import autogp_tpu
from autogp_tpu import Schedule
from autogp_tpu.transforms import LogTransform

df = load_iclaims()
df["y"] = np.log(df["y"].to_numpy())  # model in log space (iclaims.md)
if FAST:
    df = df.iloc[:60].reset_index(drop=True)
df_train, df_test = train_test_split(df, 0.8)
n_train = len(df_train)

# %% Fit.
n_particles = 2 if FAST else 8
cfg = autogp_tpu.GPConfig(max_depth=3) if FAST else None
autogp_tpu.seed(10)
model = autogp_tpu.GPModel(df_train["ds"], df_train["y"].to_numpy(),
                           n_particles=n_particles, config=cfg)
frac = 0.5 if FAST else 0.20
n_mcmc, n_hmc = (4, 4) if FAST else (50, 10)
autogp_tpu.fit_smc(model,
                   schedule=Schedule.linear_schedule(n_train, frac),
                   n_mcmc=n_mcmc, n_hmc=n_hmc, shuffle=True,
                   adaptive_resampling=False, verbose=not FAST)

for w, k in zip(model.particle_weights(), model.covariance_kernels()):
    print(f"weight {w:.3f}: {autogp_tpu.GP.pretty(k)}")

# %% Forecasts (log space) + per-particle plot.
ds_future = df["ds"].max() + np.arange(1, 27) * (df["ds"].iloc[1]
                                                 - df["ds"].iloc[0])
ds_query = np.concatenate([df["ds"].to_numpy(), np.asarray(ds_future)])
forecasts = autogp_tpu.predict(model, ds_query, quantiles=[0.025, 0.975])
plot_forecasts(df_train, df_test, forecasts, name="iclaims_fit.png",
               title="iclaims (log space)")

# %% Overall mixture quantiles via the bracketed CDF bisection
# (predict_quantile, api.jl:547-596).
ds_q = ds_query[:: max(1, len(ds_query) // 32)]
lo, _ = autogp_tpu.predict_quantile(model, ds_q, 0.025, tol=1e-6)
md, _ = autogp_tpu.predict_quantile(model, ds_q, 0.50, tol=1e-6)
hi, _ = autogp_tpu.predict_quantile(model, ds_q, 0.975, tol=1e-6)
assert np.all(lo <= md) and np.all(md <= hi)
# Quantiles transform directly: exp(q) is the direct-space quantile.
print("direct-space median forecast head:", np.exp(md[:4]))

# %% Direct-space mean forecasts need the log-normal moment correction
# E[exp(Z)] = exp(mu + s^2/2), NOT exp(E[Z]) (iclaims.md MvLogNormal note;
# Transforms.jl:84-91).
mvn = autogp_tpu.predict_mvn(model, ds_q)
lt = LogTransform()
naive = np.exp(mvn.mean())
correct = np.zeros_like(naive)
for w, c in zip(mvn.weights, mvn.components):
    mu = c.mean
    var = np.diag(c.cov)
    m, _ = lt.unapply_mean_var(mu, var)
    correct += w * m
bias = correct - naive
assert np.all(bias >= -1e-8), "log-normal mean must exceed exp(mean)"
print("max direct-space mean bias of the naive transform:",
      float(np.max(bias)))
print("ICLAIMS TUTORIAL OK")
