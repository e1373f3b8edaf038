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


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """interpret=True pallas_call lowers to a host-callback CustomCall;
    (de)serializing such an executable through the persistent compile
    cache SEGFAULTS inside XLA:CPU (both full-suite crashes this round
    and last landed in compilation_cache.put/get_executable_and_time on
    exactly these programs). Interpret-mode programs are cheap to compile
    — just keep them out of the cache."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", old)


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
    n, pad = 50, 64
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
        masked=masked, tile=32, interpret=True)

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


def test_build_tape():
    """Tape = post-order walk of active slots with children positions."""
    import jax.numpy as jnp
    node = cases()[4]  # ChangePoint(Linear*Periodic, GammaExp)
    nt, _ = tree.node_to_tensor(node, CFG)
    tslot, ttype, lpos, rpos, n = cov_pallas.build_tape(
        jnp.asarray(nt), CFG.depth_cap)
    tslot, ttype, lpos, rpos = map(np.asarray, (tslot, ttype, lpos, rpos))
    n = int(n)
    assert n == int((nt > 0).sum())
    # last instruction is the root; tape order is a valid post-order.
    assert tslot[n - 1] == 0
    assert (ttype[:n] == nt[tslot[:n]]).all()
    assert (ttype[n:] == 0).all()
    for i in range(n):
        s = tslot[i]
        t = ttype[i]
        if t in (C.PLUS, C.TIMES, C.CHANGEPOINT):
            assert tslot[lpos[i]] == 2 * s + 1
            assert tslot[rpos[i]] == 2 * s + 2
            assert lpos[i] < i and rpos[i] < i
        else:
            pass  # leaf lpos/rpos refer to inactive slots; unused


@pytest.mark.parametrize("masked", [True, False])
def test_cov_pallas_tape_matches_xla(masked):
    n, pad = 50, 64
    ts = np.zeros(pad)
    ts[:n] = np.linspace(0.0, 1.0, n)
    mask = np.zeros(pad)
    mask[:n] = 1.0
    noise = 0.37

    nodes = cases()
    for node in nodes:
        nt, pz = tree.node_to_tensor(node, CFG)
        nt = jnp.asarray(nt)
        pt = model.transform_params(nt, jnp.asarray(pz), TAB.ttable)
        got = cov_pallas.cov_matrix_tape(
            nt, pt, noise, jnp.asarray(ts), jnp.asarray(mask),
            CFG.depth_cap, masked=masked, tile=32, interpret=True)
        Kx = gp_math.eval_cov(nt, pt, jnp.asarray(ts), jnp.asarray(ts),
                              CFG.depth_cap)
        Kx = Kx + noise * jnp.eye(pad)
        if masked:
            Kx = gp_math.masked_gram(Kx, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(got), np.asarray(Kx),
                                   rtol=1e-6, atol=1e-8, err_msg=str(node))


@pytest.mark.parametrize("N", [128, 256])
def test_chol_pallas_matches_lapack(N):
    from autogp_tpu.ops import chol_pallas
    rng = np.random.default_rng(0)
    P = 4
    A = rng.standard_normal((P, N, N))
    K = A @ np.swapaxes(A, 1, 2) + N * np.eye(N)
    L = np.asarray(chol_pallas.cholesky_batched(jnp.asarray(K),
                                                interpret=True))
    want = np.linalg.cholesky(K)
    np.testing.assert_allclose(L, want, rtol=1e-9, atol=1e-9)
    assert np.allclose(np.triu(L, 1), 0.0)


def test_chol_pallas_masked_gram():
    """Identity-padded (masked) gram stays block-diagonal under chol."""
    from autogp_tpu.ops import chol_pallas
    rng = np.random.default_rng(1)
    n, pad = 100, 128
    A = rng.standard_normal((2, n, n))
    K = np.tile(np.eye(pad), (2, 1, 1))
    K[:, :n, :n] = A @ np.swapaxes(A, 1, 2) + n * np.eye(n)
    L = np.asarray(chol_pallas.cholesky_batched(jnp.asarray(K),
                                                interpret=True))
    np.testing.assert_allclose(L, np.linalg.cholesky(K), rtol=1e-9,
                               atol=1e-9)


GRAD_CASES = [cases()[1], cases()[4], cases()[5]]


@pytest.mark.parametrize("tape", [False, True], ids=["slots", "tape"])
@pytest.mark.parametrize("node", GRAD_CASES, ids=lambda n: K.pretty(n)[:40])
def test_cov_pallas_vjp_matches_xla_grads(node, tape):
    """Custom-VJP kernel gradients == XLA autodiff gradients (z-space)."""
    import jax.numpy as jnp
    from autogp_tpu import model as M
    from autogp_tpu.ops import cov_pallas_vjp
    from autogp_tpu.tree import param_mask

    n, pad = 25, 32
    ts = np.zeros(pad); ts[:n] = np.linspace(0.0, 1.0, n)
    mask = np.zeros(pad); mask[:n] = 1.0
    xs = np.zeros(pad); xs[:n] = np.sin(np.linspace(0, 8, n))
    ts_j, mask_j, xs_j = map(jnp.asarray, (ts, mask, xs))

    nt, pz = tree.node_to_tensor(node, CFG)
    nt = jnp.asarray(nt)
    pz = jnp.asarray(pz)

    def lml_xla(z, nz):
        pt = M.transform_params(nt, z, TAB.ttable)
        Kx = gp_math.eval_cov(nt, pt, ts_j, ts_j, CFG.depth_cap) \
            + nz * jnp.eye(pad)
        return gp_math.mvn_logpdf_masked(Kx, xs_j, mask_j)

    def lml_pal(z, nz):
        pt = M.transform_params(nt, z, TAB.ttable)
        Kp = cov_pallas_vjp.cov_matrix_diff(nt, pt, nz, ts_j, mask_j,
                                            CFG.depth_cap, interpret=True,
                                            tape=tape)
        return gp_math.mvn_logpdf_masked(Kp, xs_j, mask_j)

    vx, gx = jax.value_and_grad(lml_xla, argnums=(0, 1))(
        pz, jnp.asarray(0.25))
    vp, gp = jax.value_and_grad(lml_pal, argnums=(0, 1))(
        pz, jnp.asarray(0.25))
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(float(gp[1]), float(gx[1]), rtol=1e-8)
    assert np.isfinite(np.asarray(gx[0])).all()
    pm = np.asarray(param_mask(nt))
    assert (np.asarray(gp[0])[pm == 0] == 0).all()


@pytest.mark.parametrize("node", GRAD_CASES, ids=lambda n: K.pretty(n)[:40])
def test_lml_tape_fused_matches_xla_grads(node):
    """Fully fused assembly+MVN VJP (in-kernel Kbar) == XLA autodiff."""
    import jax.numpy as jnp
    from autogp_tpu import model as M
    from autogp_tpu.ops import cov_pallas_vjp
    from autogp_tpu.tree import param_mask

    n, pad = 50, 64   # blocked-inverse path needs power-of-two N >= 64
    ts = np.zeros(pad); ts[:n] = np.linspace(0.0, 1.0, n)
    mask = np.zeros(pad); mask[:n] = 1.0
    xs = np.zeros(pad); xs[:n] = np.sin(np.linspace(0, 8, n))
    ts_j, mask_j, xs_j = map(jnp.asarray, (ts, mask, xs))

    nt, pz = tree.node_to_tensor(node, CFG)
    nt = jnp.asarray(nt)
    pz = jnp.asarray(pz)

    def lml_xla(z, nz):
        pt = M.transform_params(nt, z, TAB.ttable)
        Kx = gp_math.eval_cov(nt, pt, ts_j, ts_j, CFG.depth_cap) \
            + nz * jnp.eye(pad)
        return gp_math.mvn_logpdf_masked(Kx, xs_j, mask_j)

    def lml_fused(z, nz):
        pt = M.transform_params(nt, z, TAB.ttable)
        return cov_pallas_vjp.lml_tape_fused(nt, pt, nz, ts_j, xs_j,
                                             mask_j, CFG.depth_cap,
                                             interpret=True)

    vx, gx = jax.value_and_grad(lml_xla, argnums=(0, 1))(
        pz, jnp.asarray(0.25))
    vf, gf = jax.value_and_grad(lml_fused, argnums=(0, 1))(
        pz, jnp.asarray(0.25))
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gx[0]),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(float(gf[1]), float(gx[1]), rtol=1e-8)
    pm = np.asarray(param_mask(nt))
    assert (np.asarray(gf[0])[pm == 0] == 0).all()


def test_kinv_pallas_kernel_interpret():
    """The fused K^-1/beta/fro kernel (ops/kinv_pallas.py) in interpret
    mode vs the XLA blocked chain it replaces (compiled-kernel parity on
    hardware: tests/test_tpu_kernels.py::test_kinv_beta_fused_vs_chain)."""
    import jax.numpy as jnp
    from autogp_tpu.ops import kinv_pallas

    rng = np.random.default_rng(3)
    P, N = 2, 256
    A = rng.standard_normal((P, N, N))
    K64 = A @ np.swapaxes(A, 1, 2) + N * np.eye(N)
    L = jnp.asarray(np.linalg.cholesky(K64), jnp.float32)
    x = jnp.asarray(rng.standard_normal((P, N)), jnp.float32)

    # fast=False isolates the kernel STRUCTURE (full-precision passes):
    # substitution/block-row algebra must match the chain to f32 accuracy.
    kf, bf, ff = kinv_pallas._launch(L, x, want_kinv=True, interpret=True,
                                     fast=False)
    kc, bc, fc = jax.vmap(kinv_pallas._chain_one)(L, x)
    kf, bf, ff, kc, bc, fc = (np.asarray(a, np.float64)
                              for a in (kf, bf, ff, kc, bc, fc))
    scale = np.abs(kc).max()
    assert np.abs(np.tril(kf) - np.tril(kc)).max() / scale < 1e-5
    # lower-only contract: strictly-upper BLOCKS are zero.
    assert np.abs(np.triu(kf, kinv_pallas.BLOCK)).max() == 0.0
    np.testing.assert_allclose(bf, bc, rtol=1e-4,
                               atol=1e-5 * np.abs(bc).max())
    np.testing.assert_allclose(ff, fc, rtol=1e-4)
    # production mode (fast=True, bf16x3): GRAD_PRECISION-class bound vs
    # the chain (different 3-pass split points, errors don't cancel).
    kf3, bf3, ff3 = kinv_pallas._launch(L, x, want_kinv=True,
                                        interpret=True)
    assert np.abs(np.tril(np.asarray(kf3, np.float64))
                  - np.tril(kc)).max() / scale < 5e-4
    assert np.abs(np.triu(np.asarray(kf3), kinv_pallas.BLOCK)).max() == 0.0
    np.testing.assert_allclose(np.asarray(bf3, np.float64), bc, rtol=5e-4,
                               atol=5e-4 * np.abs(bc).max())
    np.testing.assert_allclose(np.asarray(ff3, np.float64), fc, rtol=1e-3)
    # stats-only variant agrees bit-for-bit with the kinv variant's stats
    # (same in-kernel code path for V/beta/fro).
    bs, fs = kinv_pallas._launch(L, x, want_kinv=False, interpret=True)
    np.testing.assert_allclose(np.asarray(bs, np.float64),
                               np.asarray(bf3, np.float64), rtol=1e-6,
                               atol=1e-7 * np.abs(bc).max())
    np.testing.assert_allclose(np.asarray(fs, np.float64),
                               np.asarray(ff3, np.float64), rtol=1e-6)
    # want_v (linv_beta backend): V must equal the blocked triangular
    # inverse with EXACT zeros on the whole strict upper triangle (the
    # in-tape K^-1 tiles contract full columns and rely on the zeros),
    # and its stats must match the kinv variant's bit-for-bit.
    vv, bv, fv = kinv_pallas._launch(L, x, want_kinv=False, want_v=True,
                                     interpret=True)
    linv64 = np.stack([np.linalg.inv(np.asarray(L, np.float64)[i])
                       for i in range(P)])
    vs = np.abs(linv64).max()
    assert np.abs(np.triu(np.asarray(vv), 1)).max() == 0.0
    assert np.abs(np.asarray(vv, np.float64)
                  - np.tril(linv64)).max() / vs < 5e-4
    np.testing.assert_allclose(np.asarray(bv, np.float64),
                               np.asarray(bf3, np.float64), rtol=1e-6,
                               atol=1e-7 * np.abs(bc).max())
    np.testing.assert_allclose(np.asarray(fv, np.float64),
                               np.asarray(ff3, np.float64), rtol=1e-6)
