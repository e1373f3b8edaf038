"""Shared helpers for the executable tutorials.

Every tutorial honors two environment variables:
  AUTOGP_TUTORIAL_FAST=1  — CI/smoke mode: few particles, tiny MCMC
                            budgets, so the whole script runs in minutes
                            on the 1-core CPU host (tests/test_tutorials.py).
  AUTOGP_TUTORIAL_PLOT=1  — write PNG figures into docs/tutorials/output/.

The full-budget settings mirror the reference notebooks
(/root/reference/docs/src/tutorials/*.ipynb; configs cited per script).
"""

import os
import sys

import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if _REPO not in sys.path:  # allow `python docs/tutorials/<name>.py`
    sys.path.insert(0, _REPO)

ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")
OUTPUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")

FAST = os.environ.get("AUTOGP_TUTORIAL_FAST") == "1"
PLOT = os.environ.get("AUTOGP_TUTORIAL_PLOT") == "1"


def maybe_force_cpu():
    """In FAST (CI) mode run on CPU float64 — the ambient sitecustomize
    forces the remote-TPU backend through jax.config, so override there."""
    import jax
    cache_root = os.path.join(_REPO, ".jax_cache")
    cpu = FAST or os.environ.get("AUTOGP_TUTORIAL_CPU") == "1"
    if cpu:
        # CPU executables are host machine code — use the
        # host-fingerprinted subdir (autogp_tpu/utils/jax_cache.py).
        from autogp_tpu.utils.jax_cache import cpu_cache_dir
        cache_root = cpu_cache_dir(cache_root)
    jax.config.update("jax_compilation_cache_dir", cache_root)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)


def load_tsdl161():
    """Monthly airline passengers (tsdl.161.csv; overview tutorial)."""
    df = pd.read_csv(os.path.join(ASSETS, "tsdl.161.csv"), header=None,
                     names=["ds", "y"], parse_dates=["ds"])
    return df


def load_m1266():
    """M3-competition monthly series M1266 (decomposition tutorial)."""
    df = pd.read_csv(os.path.join(ASSETS, "M1266.csv"), index_col=0,
                     parse_dates=["ds"])
    return df[["ds", "y"]].reset_index(drop=True)


def load_iclaims():
    """Weekly US unemployment insurance claims (iclaims tutorial)."""
    df = pd.read_csv(os.path.join(ASSETS, "iclaims.csv"), header=None,
                     names=["ds", "y"], parse_dates=["ds"])
    return df


def train_test_split(df, frac=0.8):
    n_train = int(len(df) * frac)
    return df.iloc[:n_train], df.iloc[n_train:]


def save_plot(fig, name):
    if PLOT:
        os.makedirs(OUTPUT, exist_ok=True)
        path = os.path.join(OUTPUT, name)
        fig.savefig(path, dpi=110, bbox_inches="tight")
        print(f"wrote {path}")


def plot_forecasts(df_train, df_test, forecasts, quantiles=(0.025, 0.975),
                   name="forecast.png", title=""):
    if not PLOT:
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 4))
    for pid in sorted(set(forecasts["particle"])):
        sub = forecasts[forecasts["particle"] == pid]
        ax.plot(sub["ds"], sub["y_mean"], color="k", lw=0.8, alpha=0.5)
        ax.fill_between(sub["ds"], sub[f"y_{quantiles[0]}"],
                        sub[f"y_{quantiles[1]}"], alpha=0.05, color="tab:blue")
    ax.scatter(df_train["ds"], df_train["y"], s=6, color="k", label="train")
    if df_test is not None and len(df_test):
        ax.scatter(df_test["ds"], df_test["y"], s=6, color="r", label="test")
    ax.set_title(title)
    ax.legend()
    save_plot(fig, name)
    plt.close(fig)
