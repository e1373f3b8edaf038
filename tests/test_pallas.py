"""Pallas kernel tests (interpret mode on CPU; real kernels ship on TPU).

The fused covariance-assembly kernel must match the XLA stack-machine
evaluator exactly (same formulas, different execution strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autogp_tpu import config as C
from autogp_tpu import gp_math, model, tree
from autogp_tpu import kernels as K
from autogp_tpu.config import GPConfig
from autogp_tpu.ops import cov_pallas

CFG = GPConfig(static_max_depth=4)
TAB = model.prior_tables(CFG)


def cases():
    return [
        K.Linear(0.1, 1.3, 0.7),
        K.GammaExponential(0.42, 0.58, 3.2),
        K.Periodic(0.96, 0.21, 1.1) * K.Linear(0.2),
        K.SquaredExponential(0.47, 0.13) + K.Constant(0.5),
        K.ChangePoint(K.Linear(0.3) * K.Periodic(1.0, 0.5),
                      K.GammaExponential(1.0, 1.2),
                      0.5, C.CHANGEPOINT_SCALE),
        (K.Linear(1.0) + K.Periodic(1.0, 1.0)) * K.Linear(2.0),
    ]


@pytest.mark.parametrize("masked", [True, False])
def test_cov_pallas_matches_xla(masked):
    n, pad = 100, 128
    ts = np.zeros(pad)
    ts[:n] = np.linspace(0.0, 1.0, n)
    mask = np.zeros(pad)
    mask[:n] = 1.0
    noise = 0.37

    nodes = cases()
    P = len(nodes)
    nts = np.zeros((P, CFG.max_nodes), np.int32)
    pzs = np.zeros((P, CFG.max_nodes, C.MAX_PARAMS))
    for i, node in enumerate(nodes):
        nts[i], pzs[i] = tree.node_to_tensor(node, CFG)

    pts = jax.vmap(
        lambda nt, pz: model.transform_params(nt, pz, TAB.ttable))(
            jnp.asarray(nts), jnp.asarray(pzs))

    got = cov_pallas.cov_matrix_batched(
        jnp.asarray(nts), pts, jnp.full((P,), noise),
        jnp.asarray(ts), jnp.asarray(mask), CFG.depth_cap,
        masked=masked, tile=64, interpret=True)

    for i in range(P):
        Kx = gp_math.eval_cov(jnp.asarray(nts[i]), pts[i],
                              jnp.asarray(ts), jnp.asarray(ts),
                              CFG.depth_cap)
        Kx = Kx + noise * jnp.eye(pad)
        if masked:
            Kx = gp_math.masked_gram(Kx, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(Kx),
                                   rtol=1e-6, atol=1e-8,
                                   err_msg=str(nodes[i]))
