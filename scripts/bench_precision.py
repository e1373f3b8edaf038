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

    # Reference from the f32-CAST inputs promoted back to f64, so the
    # measurement isolates CONTRACTION error (an f64-input reference
    # would fold the ~1e-7 input-cast floor into all three readings and
    # mask HIGHEST's true error; ADVICE r2).
    A32p = np.float64(np.float32(A64))
    ref = A32p @ A32p.T

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

    bwd_chain_case()


def bwd_chain_case():
    """The error GRAD_PRECISION actually governs: the full backward chain
    tri_inv_blocked -> K^-1 on an ILL-CONDITIONED GP gram (error
    compounds through ~log2(N/16) combine levels and scales with
    cond(K); a single well-conditioned matmul understates it, ADVICE
    r2). Prints the realized K^-1 error at HIGH vs HIGHEST against an
    f64 CPU reference from the same f32-cast gram."""
    from autogp_tpu import gp_math as V

    N = 1024
    ts = np.linspace(0, 1, N)
    # Small-noise SE gram: cond ~ 1e6 (the hard end of HMC's range).
    K64 = np.exp(-0.5 * ((ts[:, None] - ts[None, :]) / 0.25) ** 2) \
        + 1e-4 * np.eye(N)
    K32p = np.float64(np.float32(K64))
    print(f"bwd-chain gram: N={N} cond~{np.linalg.cond(K32p):.1e}")
    L64 = np.linalg.cholesky(K32p)
    Kinv64 = np.linalg.inv(K32p)
    L = jnp.asarray(np.float32(L64))[None]

    for name, pm in [("high", jax.lax.Precision.HIGH),
                     ("highest", jax.lax.Precision.HIGHEST)]:
        def chain(L):
            Linv = V.tri_inv_blocked(L, precision=pm)
            return V.kinv_from_linv(Linv, precision=pm)

        out = np.asarray(jax.jit(chain)(L)[0], np.float64)
        rel = np.abs(out - Kinv64).max() / np.abs(Kinv64).max()
        print(f"  tri_inv+kinv @ {name:8s}: max rel err {rel:.2e}")


if __name__ == "__main__":
    main()
