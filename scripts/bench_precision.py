"""Measure MXU matmul speed + accuracy at DEFAULT / HIGH / HIGHEST.

On TPU, f32 dot_general is emulated on the bf16 MXU: DEFAULT = 1 bf16
pass, HIGH = 3 passes, HIGHEST = 6 passes (f32-equivalent). If HIGH is
~2x HIGHEST at ~1e-6 rel error, the gradient-only contractions of the
HMC leapfrog (tri_inv / K^-1 / cotangent) can run at HIGH: a leapfrog
with a deterministic approximate gradient is still reversible and
volume-preserving, so MH acceptance with the exact LML stays unbiased
(Neal 2011, Handbook of MCMC ch.5) — only the acceptance rate can move.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_timer import device_time  # noqa: E402


def main():
    P, N = 64, 1024
    rng = np.random.default_rng(0)
    ts = np.linspace(0, 1, N)
    # GP-like covariance: SE gram + noise, realistic conditioning.
    K64 = np.exp(-0.5 * ((ts[:, None] - ts[None, :]) / 0.1) ** 2) \
        + 0.01 * np.eye(N)
    A64 = np.linalg.cholesky(K64)
    A = jnp.asarray(np.broadcast_to(A64, (P, N, N)), jnp.float32)

    ref = A64 @ A64.T  # f64 reference product

    for prec in ["default", "high", "highest"]:
        pm = {"default": jax.lax.Precision.DEFAULT,
              "high": jax.lax.Precision.HIGH,
              "highest": jax.lax.Precision.HIGHEST}[prec]

        def f(eps, A):
            Ae = A + eps
            return jnp.matmul(Ae, jnp.swapaxes(Ae, -1, -2), precision=pm)

        t = device_time(f, A)
        out = np.asarray(jax.jit(
            lambda A: jnp.matmul(A, jnp.swapaxes(A, -1, -2),
                                 precision=pm))(A)[0], np.float64)
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        flops = 2 * P * N * N * N / t
        print(f"{prec:8s}: {t*1e3:7.2f} ms  {flops/1e12:6.1f} TF/s  "
              f"max rel err {rel:.2e}")


if __name__ == "__main__":
    main()
