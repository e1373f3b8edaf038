# %% [markdown]
# # Callbacks: monitoring SMC inference
#
# Executable analog of the reference's `callbacks.ipynb`: register a
# callback with `fit_smc` via `Callbacks.make_smc_callback` and watch the
# forecasts sharpen as each SMC step incorporates more data.
#
# Reference configuration (callbacks.md): n_particles=8,
# linear_schedule(n, .05), n_mcmc=10, n_hmc=10, shuffle=false.

# %%
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import FAST, load_tsdl161, maybe_force_cpu, save_plot

maybe_force_cpu()

import numpy as np
import autogp_tpu
from autogp_tpu import Schedule
from autogp_tpu.callbacks import make_smc_callback

df = load_tsdl161()
if FAST:
    df = df.iloc[::3].reset_index(drop=True)
ds = df["ds"]
y = df["y"].to_numpy()
n = len(df)

n_particles = 2 if FAST else 8
cfg = autogp_tpu.GPConfig(max_depth=3) if FAST else None
autogp_tpu.seed(3)
model = autogp_tpu.GPModel(ds, y, n_particles=n_particles, config=cfg)

# %% The callback: keyword-only args + **kwargs (Callbacks.jl:29-56
# signature contract). Collects per-step ESS, runtime and forecasts.
history = []


def fn(*, history, model, ds_next, y_next, step, elapsed, resampled,
       rejuvenated, **kwargs):
    fc = autogp_tpu.predict(model, ds, quantiles=[0.025, 0.975])
    history.append({
        "step": step,
        "elapsed": elapsed,
        "ess": model.effective_sample_size(),
        "resampled": resampled,
        "rejuvenated": rejuvenated,
        "n_observed": len(model.ds),
        "mean_band": float(np.mean(fc["y_0.975"] - fc["y_0.025"])),
    })
    print(f"step {step:3d}: observed={len(model.ds):3d} "
          f"ess={history[-1]['ess']:.2f} elapsed={elapsed:.1f}s "
          f"band={history[-1]['mean_band']:.2f}")


callback_fn = make_smc_callback(fn, model, history=history)

# %% Fit with the callback attached.
frac = 0.5 if FAST else 0.05
n_mcmc, n_hmc = (3, 3) if FAST else (10, 10)
autogp_tpu.fit_smc(model, schedule=Schedule.linear_schedule(n, frac),
                   n_mcmc=n_mcmc, n_hmc=n_hmc, shuffle=False,
                   callback_fn=callback_fn)

# The callback fired at step 0 (prior) and at every schedule step, and the
# predictive bands tighten as data accumulates.
assert len(history) >= 2
assert history[0]["step"] == 0
assert history[-1]["n_observed"] == n
assert history[-1]["mean_band"] < history[0]["mean_band"]

if os.environ.get("AUTOGP_TUTORIAL_PLOT") == "1":
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot([h["n_observed"] for h in history],
            [h["mean_band"] for h in history], marker="o")
    ax.set_xlabel("observations incorporated")
    ax.set_ylabel("mean 95% band width")
    save_plot(fig, "callbacks_bands.png")
    plt.close(fig)
print("CALLBACKS TUTORIAL OK")
