"""autogp_tpu — TPU-native Gaussian process structure discovery.

A from-scratch JAX/XLA/Pallas framework with the capabilities of AutoGP.jl
(reference: /root/reference, probsys/AutoGP.jl): sequential Monte Carlo
learning of Gaussian process covariance-kernel structure and parameters for
univariate time series, plus involutive MCMC and greedy AIC search engines.

Reference API surface mirrored from `src/api.jl` (names are pythonic:
`fit_smc!` -> `fit_smc`, etc.).
"""

from autogp_tpu.config import GPConfig
from autogp_tpu.transforms import LinearTransform, LogTransform
from autogp_tpu import kernels as GP
from autogp_tpu import schedule as Schedule

__version__ = "0.1.0"


_SUBMODULES = ("api", "callbacks", "gp_math", "model", "tree", "smc",
               "config", "transforms")


def __getattr__(name):
    # Lazy imports keep `import autogp_tpu` light and avoid import cycles.
    import importlib
    if name in _SUBMODULES:
        return importlib.import_module(f"autogp_tpu.{name}")
    if name == "Callbacks":
        return importlib.import_module("autogp_tpu.callbacks")
    _api = importlib.import_module("autogp_tpu.api")
    if hasattr(_api, name):
        return getattr(_api, name)
    raise AttributeError(f"module 'autogp_tpu' has no attribute {name!r}")
