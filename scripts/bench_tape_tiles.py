"""Probe: tape-bwd kernel tile shapes under the a_cap scratch budget.

The val/adjoint scratch is [a_cap, ti, tj] x2; the default a_cap = M = 31
forces ti=128 at tj=256 (8.1 MB). Capping the tape at 19 (the observed
99.99th-percentile prior draw; max heap is 31) admits 256x256 tiles —
half the per-tile fixed costs over the same area. Timed in the REAL
backward mode (sym, K^-1 streamed from the kinv kernel).

Usage: python scripts/bench_tape_tiles.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from autogp_tpu import GPConfig
    from autogp_tpu import model as M
    from autogp_tpu.inference import smc
    from autogp_tpu.ops import chol_pallas, cov_pallas, cov_pallas_vjp, \
        kinv_pallas
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
    tl = jax.vmap(lambda nt: cov_pallas.build_tape(nt, cfg.depth_cap)[4])(
        parts.node_type)
    log(f"max tape length in batch: {int(np.asarray(tl).max())}")

    noise = jax.vmap(lambda nz: M.transform_noise(nz, cfg))(parts.noise_z)
    pt = jax.vmap(lambda pz, nt: M.transform_params(
        nt, pz, tables.ttable))(parts.params, parts.node_type)

    @jax.jit
    def stage():
        K = jax.vmap(lambda nt, p, nz: cov_pallas.cov_matrix_tape(
            nt, p, nz, data.ts, data.mask, cfg.depth_cap,
            lower_only=True))(parts.node_type, pt, noise)
        L, alpha, wd = jax.vmap(chol_pallas.chol_solve_wd_psd)(
            K, jnp.broadcast_to(data.xs * data.mask, (P, N)))
        Kinv, beta, _ = jax.vmap(kinv_pallas.kinv_beta_wd)(L, alpha, wd)
        return Kinv, beta
    Kinv, beta = jax.block_until_ready(stage())

    def make(tile, tile_i, a_cap):
        def f(eps, Kinv, beta):
            return jax.vmap(
                lambda nt, p, kv, b: cov_pallas_vjp._cov_grads_tape(
                    nt, p, kv, data.ts, data.mask, cfg.depth_cap,
                    masked=True, tile=tile, tile_i=tile_i, beta=b,
                    gscale=1.0, sym=True, a_cap=a_cap))(
                        parts.node_type, pt + eps, Kinv, beta)
        return f

    ref = None
    for (tile, ti, cap) in [(256, 128, None), (256, 256, 19),
                            (256, 256, 15), (512, 128, 19),
                            (256, 128, 19)]:
        f = make(tile, ti, cap)
        try:
            out = jax.jit(f)(jnp.float32(0.0), Kinv, beta)
            out = jax.tree_util.tree_map(np.asarray, out)
            if ref is None:
                ref = out
                ok = "ref"
            else:
                d = max(np.abs(a - b).max() for a, b in
                        zip(jax.tree_util.tree_leaves(ref),
                            jax.tree_util.tree_leaves(out)))
                ok = f"maxdiff {d:.2e}"
            dt = device_time(f, Kinv, beta)
            log(f"tape bwd kinv-mode tiles ({ti}x{tile}) a_cap={cap}: "
                f"{dt*1e3:6.2f} ms  [{ok}]")
        except Exception as e:
            log(f"tiles ({ti}x{tile}) a_cap={cap}: FAILED {type(e).__name__}"
                f" {str(e)[:200]}")


if __name__ == "__main__":
    main()
