"""Validate + time the tape-cap tile dispatch (cov_pallas_vjp.TAPE_CAP).

1. A batch of small trees (max tape <= TAPE_CAP) takes the 256x256
   capped branch; the same trees with one particle swapped for a
   full-depth monster tree (tape > TAPE_CAP) take the full-heap branch.
   Shared particles' gradients must agree across branches to f32
   accumulation tolerance.
2. grad-LML e2e timing on the standard bench batch.

Usage: python scripts/bench_tape_dispatch.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from autogp_tpu import GP, GPConfig
    from autogp_tpu import model as M
    from autogp_tpu import tree as T
    from autogp_tpu.inference import smc
    from autogp_tpu.ops import cov_pallas, cov_pallas_vjp
    from scripts.tpu_timer import device_time

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    log(f"devices: {jax.devices()}")

    N, P = 1024, 64
    cfg = GPConfig(max_depth=5)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(0)
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 7 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=jnp.float32)
    parts = smc.initialize(jax.random.PRNGKey(0), P, data, cfg, tables,
                           dtype=jnp.float32)

    def grad_batch(eps, params, noise_z, node_type):
        def one(pz, nz, nt):
            def f(pz, nz):
                p = M.transform_params(nt, pz + eps, tables.ttable)
                nzv = M.transform_noise(nz, cfg)
                return cov_pallas_vjp.lml_tape_fused(
                    nt, p, nzv, data.ts, data.xs, data.mask,
                    cfg.depth_cap)
            return jax.value_and_grad(f, argnums=(0, 1))(pz, nz)
        return jax.vmap(one)(params, noise_z, node_type)

    gb = jax.jit(grad_batch)

    # --- branch equivalence ------------------------------------------------
    # Small-tree batch: replace every node_type with a fixed 5-node tree
    # (PER x LIN), params from the prior draws (finite, well-conditioned).
    node = GP.Periodic(0.7, 0.3, 1.2) * GP.Linear(0.4, 0.8, 0.6)
    nt_small, p_small = T.node_to_tensor(node, cfg)
    ntA = jnp.broadcast_to(jnp.asarray(nt_small), parts.node_type.shape)
    pzA = 0.3 * jnp.asarray(
        rng.standard_normal(parts.params.shape), jnp.float32)
    nzA = jnp.asarray(0.1 * rng.standard_normal(P), jnp.float32)

    tlA = jax.vmap(lambda n: cov_pallas.build_tape(n, cfg.depth_cap)[4])(ntA)
    assert int(jnp.max(tlA)) <= cov_pallas_vjp.TAPE_CAP

    # Monster tree: full depth-5 heap (tape length 31) in particle 0.
    full = np.zeros_like(np.asarray(ntA[0]))
    from autogp_tpu import config as C
    Mslots = full.shape[0]
    for s in range(Mslots):
        full[s] = C.PLUS if 2 * s + 1 < Mslots else C.LINEAR
    ntB = ntA.at[0].set(jnp.asarray(full))
    tlB = jax.vmap(lambda n: cov_pallas.build_tape(n, cfg.depth_cap)[4])(ntB)
    log(f"batch A max tape {int(jnp.max(tlA))}; "
        f"batch B max tape {int(jnp.max(tlB))}")

    vA, (gpA, gnA) = jax.tree_util.tree_map(
        np.asarray, gb(jnp.float32(0.0), pzA, nzA, ntA))
    vB, (gpB, gnB) = jax.tree_util.tree_map(
        np.asarray, gb(jnp.float32(0.0), pzA, nzA, ntB))
    fin = (np.isfinite(vA) & np.isfinite(gpA).all(axis=(1, 2))
           & np.isfinite(gnA))
    fin[0] = False  # particle 0 differs between batches by construction
    log(f"finite shared particles: {int(fin.sum())}/{P - 1}")
    assert fin.sum() >= 0.8 * P  # ill-conditioned f32 draws may NaN
    dv = np.abs(vA[fin] - vB[fin]).max() / np.abs(vA[fin]).max()
    dg = (np.abs(gpA[fin] - gpB[fin]).max()
          / max(np.abs(gpA[fin]).max(), 1e-30))
    dn = (np.abs(gnA[fin] - gnB[fin]).max()
          / max(np.abs(gnA[fin]).max(), 1e-30))
    log(f"cap-branch vs full-branch (shared particles): value rel "
        f"{dv:.2e}, param-grad rel {dg:.2e}, noise-grad rel {dn:.2e}")
    assert dv == 0.0, dv  # identical forward path
    assert dg < 5e-4 and dn < 5e-4, (dg, dn)

    # --- timing on the standard bench batch --------------------------------
    def f_time(eps):
        return grad_batch(eps, parts.params, parts.noise_z,
                          parts.node_type)
    dt = device_time(f_time)
    log(f"grad-LML e2e (tape dispatch): {dt*1e3:6.2f} ms "
        f"({P/dt:.0f} grad evals/s)")


if __name__ == "__main__":
    main()
