"""Validate + time the fused kinv_beta Pallas kernel vs the XLA chain.

Usage: python scripts/bench_kinv.py   (TPU)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from autogp_tpu import gp_math
    from autogp_tpu.ops import kinv_pallas
    from scripts.tpu_timer import device_time

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    log(f"devices: {jax.devices()}")

    # --- correctness at N=256 -------------------------------------------
    rng = np.random.default_rng(0)
    P, N = 8, 256
    A = rng.standard_normal((P, N, N))
    K64 = A @ np.swapaxes(A, 1, 2) + N * np.eye(N)
    L = jnp.asarray(np.linalg.cholesky(K64), jnp.float32)
    x = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)

    fused = jax.jit(lambda L, x: jax.vmap(kinv_pallas.kinv_beta)(L, x))
    chain = jax.jit(jax.vmap(kinv_pallas._chain_one))
    kf, bf, ff = jax.tree_util.tree_map(np.asarray, fused(L, x))
    kc, bc, fc = jax.tree_util.tree_map(np.asarray, chain(L, x))
    sk = np.abs(kc).max()
    log(f"N=256 Kinv max|diff|/scale: {np.abs(kf - kc).max() / sk:.3e}")
    log(f"N=256 beta max|diff|/scale: "
        f"{np.abs(bf - bc).max() / np.abs(bc).max():.3e}")
    log(f"N=256 fro2 rel diff: {np.abs(ff - fc).max() / fc.max():.3e}")
    # f64 ground truth
    Kinv64 = np.linalg.inv(np.float64(np.float32(
        np.linalg.cholesky(K64))) @ np.swapaxes(
        np.float64(np.float32(np.linalg.cholesky(K64))), 1, 2))
    tri = np.tril(Kinv64)
    log(f"N=256 Kinv fused vs f64: {np.abs(np.tril(kf) - tri).max() / sk:.3e}"
        f" | chain vs f64: {np.abs(np.tril(kc) - tri).max() / sk:.3e}")

    stats = jax.jit(lambda L, x: jax.vmap(kinv_pallas.linv_stats)(L, x))
    bs, fs = jax.tree_util.tree_map(np.asarray, stats(L, x))
    log(f"stats beta diff: {np.abs(bs - bc).max() / np.abs(bc).max():.3e} "
        f"fro diff: {np.abs(fs - fc).max() / fc.max():.3e}")

    # --- timing at N=1024, P=64 -----------------------------------------
    P, N = 64, 1024
    A = rng.standard_normal((P, N, N)).astype(np.float32)
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2) + N * np.eye(N, dtype=np.float32))
    Lb = jax.jit(jax.vmap(jnp.linalg.cholesky))(K)
    xb = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)

    def t_fused(eps, L, x):
        return jax.vmap(kinv_pallas.kinv_beta)(L + eps, x)

    def t_chain(eps, L, x):
        return jax.vmap(kinv_pallas._chain_one)(L + eps, x)

    def t_stats(eps, L, x):
        return jax.vmap(kinv_pallas.linv_stats)(L + eps, x)

    def t_stats_chain(eps, L, x):
        return jax.vmap(kinv_pallas._stats_one)(L + eps, x)

    for name, f in [("kinv_beta fused", t_fused), ("kinv_beta chain", t_chain),
                    ("linv_stats fused", t_stats),
                    ("linv_stats chain", t_stats_chain)]:
        dt = device_time(f, Lb, xb)
        log(f"{name}: {dt * 1e3:.2f} ms")


def profile():
    """Segment profile of the fused kernel (python scripts/bench_kinv.py profile)."""
    import jax
    import jax.numpy as jnp
    from autogp_tpu.ops import kinv_pallas
    from scripts.tpu_timer import device_time
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    rng = np.random.default_rng(1)
    P, N = 64, 1024
    A = rng.standard_normal((P, N, N)).astype(np.float32)
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2) + N * np.eye(N, dtype=np.float32))
    Lb = jax.jit(jax.vmap(jnp.linalg.cholesky))(K)
    xb = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)
    variants = [
        ("dma only", dict(want_kinv=False, want_sub=False, want_stats=False)),
        ("sub only", dict(want_kinv=False, want_sub=True, want_stats=False)),
        ("sub+stats", dict(want_kinv=False, want_sub=True, want_stats=True)),
        ("sub+kinv", dict(want_kinv=True, want_sub=True, want_stats=False)),
        ("full", dict(want_kinv=True, want_sub=True, want_stats=True)),
    ]
    for name, kw in variants:
        f = lambda eps, L, x, kw=kw: kinv_pallas._launch(L + eps, x, **kw)
        dt = device_time(f, Lb, xb)
        log(f"{name}: {dt * 1e3:.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "profile":
        profile()
    else:
        main()
