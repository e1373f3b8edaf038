"""Generate the f64 golden gradients for the TPU fused-VJP parity test.

The fused (Pallas kinv_beta, in-kernel HIGHEST) and unfused (XLA blocked
chain at GRAD_PRECISION) backward paths are DIFFERENT f32 algorithms: on
ill-conditioned prior draws each deviates from the true gradient by far
more than they deviate on well-conditioned ones, so comparing them
against each other with a fixed tolerance is meaningless (measured: a
PD-cliff particle puts BOTH at ~2e-1 relative error vs f64 while
agreeing with each other to ~8e-3). The test instead pins the float64
gradient (CPU XLA evaluator — itself pinned against mpmath goldens by
tests/test_golden.py) and asserts the fused path is no less accurate
than the chain it replaced.

Writes tests/golden/vjp_grad_f64.npz: the f32 particle draws (node_type,
params, noise_z), the dataset, and the f64 value/param-grad/noise-grad.

Run on CPU:  python scripts/gen_golden_grad.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from autogp_tpu import GPConfig  # noqa: E402
from autogp_tpu import gp_math  # noqa: E402
from autogp_tpu import model as M  # noqa: E402
from autogp_tpu.inference import smc  # noqa: E402

OUT = "/root/repo/tests/golden/vjp_grad_f64.npz"


def main():
    cfg = GPConfig(max_depth=4)
    tables = M.prior_tables(cfg)
    rng = np.random.default_rng(7)
    N = 256
    ts = np.linspace(0.0, 1.0, N)
    xs = np.sin(2 * np.pi * 3 * ts) + 0.1 * rng.standard_normal(N)
    data = smc.make_dataset(ts, xs, pad_to=N, dtype=jnp.float32)
    # f32 draws (threefry is backend-deterministic; the npz stores them
    # anyway so the TPU test never re-draws).
    parts = smc.initialize(jax.random.PRNGKey(3), 8, data, cfg, tables,
                           dtype=jnp.float32)

    ts64 = jnp.asarray(ts, jnp.float64)
    xs64 = jnp.asarray(xs, jnp.float64)
    mask64 = jnp.ones(N, jnp.float64)
    tt64 = jnp.asarray(np.asarray(tables.ttable), jnp.float64)

    def g(pz, nz, nt):
        def f(pz, nz):
            pt = M.transform_params(nt, pz, tt64)
            noise = M.transform_noise(nz, cfg)
            return gp_math.lml_masked(nt, pt, noise, ts64, xs64, mask64,
                                      cfg.depth_cap)
        return jax.value_and_grad(f, argnums=(0, 1))(pz, nz)

    v64, (gp64, gn64) = jax.jit(jax.vmap(g))(
        jnp.asarray(np.asarray(parts.params), jnp.float64),
        jnp.asarray(np.asarray(parts.noise_z), jnp.float64),
        parts.node_type)
    np.savez(OUT,
             ts=ts, xs=xs,
             node_type=np.asarray(parts.node_type),
             params=np.asarray(parts.params, np.float32),
             noise_z=np.asarray(parts.noise_z, np.float32),
             v64=np.asarray(v64), gp64=np.asarray(gp64),
             gn64=np.asarray(gn64))
    print("wrote", OUT)
    print("finite:", np.isfinite(np.asarray(gp64)).all(axis=(1, 2)))


if __name__ == "__main__":
    main()
