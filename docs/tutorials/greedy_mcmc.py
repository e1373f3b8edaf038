# %% [markdown]
# # Greedy search and MCMC sampling
#
# Executable analog of the reference's `greedy_mcmc.ipynb`: two
# alternatives to SMC for structure learning — greedy AIC-driven search
# (`fit_greedy`, single particle, no changepoints) and pure involutive
# MCMC (`fit_mcmc`).
#
# Reference configuration (greedy_mcmc.md): greedy with max_depth=10 and
# a per-step callback; MCMC with 2 particles, n_mcmc=45, n_hmc=10.

# %%
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import FAST, load_tsdl161, maybe_force_cpu, plot_forecasts

maybe_force_cpu()

import numpy as np
import autogp_tpu
from autogp_tpu import GP, GPConfig

df = load_tsdl161()
ds = df["ds"]
y = df["y"].to_numpy()
if FAST:
    ds, y = ds[:48], y[:48]

# %% Greedy search: requires 1 particle, finite depth, no changepoints
# (api.jl:334-336).
autogp_tpu.seed(2)
config = GPConfig(changepoints=False, max_depth=5 if not FAST else 3)
model = autogp_tpu.GPModel(ds, y, n_particles=1, config=config)

aic_trace = []


def greedy_callback(*, model, step, aic, elapsed, **kwargs):
    k = model.covariance_kernels(reparameterize=False)[0]
    aic_trace.append((step, aic))
    print(f"greedy step {step}: AIC={aic:.2f} kernel={GP.pretty(k)}")


autogp_tpu.fit_greedy(model, max_depth=2 if FAST else 4,
                      callback_fn=greedy_callback)
assert len(aic_trace) >= 1
# AIC is non-increasing across accepted greedy steps.
aics = [a for _, a in aic_trace]
assert all(b <= a + 1e-9 for a, b in zip(aics, aics[1:]))

forecasts = autogp_tpu.predict(model, ds, quantiles=[0.025, 0.975])
plot_forecasts(df.iloc[:len(ds)], None, forecasts,
               name="greedy_fit.png", title="greedy search fit")

# %% Hybrid greedy/MCMC chain ("Algorithm 0", Greedy.jl:59-130): n_mcmc
# AIC-monotone steps, each keeping the best of n_parallel independent
# subtree-replace + MAP-optimize proposals.
autogp_tpu.seed(7)
model_h = autogp_tpu.GPModel(ds, y, n_particles=1, config=config)
hybrid_aics = []
autogp_tpu.fit_greedy_mcmc(
    model_h, n_mcmc=4 if FAST else 20, n_parallel=2 if FAST else 4,
    callback_fn=lambda *, step, aic, accepted, **kw: hybrid_aics.append(aic))
assert all(b <= a + 1e-9 for a, b in zip(hybrid_aics, hybrid_aics[1:]))
print(f"greedy-mcmc chain: AIC {hybrid_aics[0]:.2f} -> {hybrid_aics[-1]:.2f}")
k_h = model_h.covariance_kernels(reparameterize=False)[0]
print("greedy-mcmc kernel:", GP.pretty(k_h))

# %% MCMC sampling: each particle is an independent chain
# (fit_mcmc!, api.jl:280-307).
autogp_tpu.seed(11)
cfg2 = GPConfig(max_depth=3) if FAST else None
model2 = autogp_tpu.GPModel(ds, y, n_particles=2, config=cfg2)

steps_seen = []


def mcmc_callback(*, model, step, elapsed, **kwargs):
    steps_seen.append(step)


n_mcmc, n_hmc = (5, 3) if FAST else (45, 10)
autogp_tpu.fit_mcmc(model2, n_mcmc=n_mcmc, n_hmc=n_hmc,
                    callback_fn=mcmc_callback)
print("MCMC accepted-step callbacks at:", steps_seen)
for k in model2.covariance_kernels():
    print("chain kernel:", GP.pretty(k))
print("GREEDY/MCMC TUTORIAL OK")
