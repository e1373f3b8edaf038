"""Round-5 factor-driver variants: wd / diag / strips / two-level.

The blocked Cholesky driver (ops/chol_pallas._factor_driver and its
two-level sibling _factor_driver_o2) backs four public entries used by
the LML value and gradient paths. These tests pin, in interpret mode on
CPU float64:

  - factor/solve parity with LAPACK at one-level (nb<4) and two-level
    (nb>=4, even) dispatch shapes;
  - Wd = per-panel diagonal-block inverses (reused by kinv_pallas);
  - diag variant bitwise-identical to the assembled factor's diagonal
    (the value path's bit-identity contract with the gradient path's
    fwd rule — gp_math.mvn_logpdf_masked_cvjp);
  - strips variant reassembling to exactly the assembled factor;
  - kinv_beta_wd / linv_stats_wd / kinv_beta_strips agreeing with the
    XLA chain fallbacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autogp_tpu.ops import chol_pallas, kinv_pallas


def _spd(P, N, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((P, N, N))
    K = A @ np.swapaxes(A, 1, 2) + N * np.eye(N)
    x = rng.standard_normal((P, N))
    return K, x


@pytest.mark.parametrize("N", [256, 384, 512, 768])
def test_factor_driver_matches_lapack(N):
    """One-level (nb in {2,3}) and two-level (nb in {4,6}) dispatch."""
    P = 3
    K, x = _spd(P, N)
    L, alpha, wd = chol_pallas.cholesky_solve_wd_batched(
        jnp.asarray(K), jnp.asarray(x), interpret=True)
    Lw = np.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), Lw, rtol=0, atol=1e-10)
    aw = np.stack([np.linalg.solve(Lw[i], x[i]) for i in range(P)])
    np.testing.assert_allclose(np.asarray(alpha), aw, rtol=0, atol=1e-11)
    B = chol_pallas.BLOCK
    for k in range(N // B):
        blk = Lw[:, k * B:(k + 1) * B, k * B:(k + 1) * B]
        winv = np.stack([np.linalg.inv(b) for b in blk])
        np.testing.assert_allclose(np.asarray(wd)[:, k], winv,
                                   rtol=0, atol=1e-12)
    # chol-only entry: identical factor.
    L2 = chol_pallas.cholesky_batched(jnp.asarray(K), interpret=True)
    np.testing.assert_array_equal(np.asarray(L2), np.asarray(L))


@pytest.mark.parametrize("N", [384, 512])
def test_diag_variant_bitwise_matches_factor_diag(N):
    P = 2
    K, x = _spd(P, N, seed=1)
    L, alpha, _ = chol_pallas.cholesky_solve_wd_batched(
        jnp.asarray(K), jnp.asarray(x), interpret=True)
    d, a2 = chol_pallas.cholesky_solve_diag_batched(
        jnp.asarray(K), jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(d), np.diagonal(np.asarray(L), axis1=1, axis2=2))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(alpha))


@pytest.mark.parametrize("N", [384, 512])
def test_strips_variant_reassembles_exactly(N):
    P = 2
    K, x = _spd(P, N, seed=2)
    L, alpha, wd = chol_pallas.cholesky_solve_wd_batched(
        jnp.asarray(K), jnp.asarray(x), interpret=True)
    out = chol_pallas.cholesky_solve_strips_batched(
        jnp.asarray(K), jnp.asarray(x), interpret=True)
    d, a2, wd2 = out[0], out[1], out[2]
    strips = out[3:]
    assert len(strips) == N // chol_pallas.BLOCK
    Lre = np.asarray(chol_pallas.strips_to_l(strips))
    np.testing.assert_array_equal(np.tril(Lre), np.tril(np.asarray(L)))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(alpha))
    np.testing.assert_array_equal(np.asarray(wd2), np.asarray(wd))
    np.testing.assert_array_equal(
        np.asarray(d), np.diagonal(np.asarray(L), axis1=1, axis2=2))


def test_wd_variants_match_chain():
    """kinv_beta_wd / linv_stats_wd / kinv_beta_strips vs the XLA chain
    (all on the non-Pallas fallback here; the TPU kernels are pinned by
    tests/test_tpu_kernels.py and the interpret parity suite)."""
    P, N = 3, 256
    K, x = _spd(P, N, seed=3)
    Kj, xj = jnp.asarray(K), jnp.asarray(x)
    L, alpha, wd = chol_pallas.cholesky_solve_wd_batched(Kj, xj,
                                                        interpret=True)
    kc, bc, fc = jax.vmap(kinv_pallas._chain_one)(L, alpha)
    kw, bw, fw = jax.vmap(kinv_pallas.kinv_beta_wd)(L, alpha, wd)
    np.testing.assert_allclose(np.asarray(kw), np.asarray(kc), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bw), np.asarray(bc), rtol=1e-12)
    bs, fs = jax.vmap(kinv_pallas.linv_stats_wd)(L, alpha, wd)
    np.testing.assert_allclose(np.asarray(bs), np.asarray(bc), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(fc), rtol=1e-12)
    out = chol_pallas.cholesky_solve_strips_batched(Kj, xj, interpret=True)
    strips = out[3:]
    ks, bs2, fs2 = jax.vmap(kinv_pallas.kinv_beta_strips)(
        out[1], out[2], *strips)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(kc), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(bs2), np.asarray(bc),
                               rtol=1e-12)


def test_unbatched_primal_traces():
    """custom_vmap traces the PRIMAL with unbatched args before its rule
    replaces it — every wrapper must trace cleanly at [N, N] (the
    round-5 crash class: a batched-only helper inside the primal)."""
    N = 256
    K, x = _spd(1, N, seed=4)
    K0, x0 = jnp.asarray(K[0]), jnp.asarray(x[0])
    L, a, wd = chol_pallas._chol_solve_wd_plain(K0, x0)
    assert wd.shape == (N // chol_pallas.BLOCK, chol_pallas.BLOCK,
                        chol_pallas.BLOCK)
    d, a2 = chol_pallas._chol_solve_diag_plain(K0, x0)
    assert d.shape == (N,)
    out = chol_pallas._chol_solve_strips_plain(K0, x0)
    assert len(out) == 3 + N // chol_pallas.BLOCK
