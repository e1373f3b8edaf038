"""Kernel-algebra parity tests (reference: test/test_GP.jl:24-146).

reparameterize: k(at+b, au+b; th) == k(t, u; th') for every base kernel
and every composite (pairs x {+, *, ChangePoint}).
rescale: Y = aX + b scaling of the output moves into the parameters.
split_kernel_sop: the exact algebraic cases from the reference.
"""

import numpy as np
import pytest

from autogp_tpu import GP
from autogp_tpu.transforms import LinearTransform


def base_kernels():
    # test_GP.jl:24-33
    return [
        GP.WhiteNoise(1.0),
        GP.Constant(0.5),
        GP.Linear(0.1, 1.3, 0.7),
        GP.SquaredExponential(0.47, 0.13),
        GP.GammaExponential(0.42, 0.58, 3.2),
        GP.Periodic(0.96, 0.21, 1.1),
    ]


OPS = [
    lambda a, b: a + b,
    lambda a, b: a * b,
    lambda a, b: GP.ChangePoint(a, b, 0.5, 0.95),
]


def test_reparameterize_base_and_composite():
    ds_raw = np.linspace(-10, 10, 100)
    tr = LinearTransform.from_minmax(ds_raw, 0, 1)
    ds = tr.apply(ds_raw)
    for b1 in base_kernels():
        b_raw = GP.reparameterize(b1, tr)
        np.testing.assert_allclose(GP.eval_cov(b1, ds),
                                   GP.eval_cov(b_raw, ds_raw),
                                   rtol=1e-9, atol=1e-12, err_msg=str(b1))
    for b1 in base_kernels():
        for b2 in base_kernels():
            for op in OPS:
                k = op(b1, b2)
                k_raw = GP.reparameterize(k, tr)
                np.testing.assert_allclose(
                    GP.eval_cov(k, ds), GP.eval_cov(k_raw, ds_raw),
                    rtol=1e-8, atol=1e-10, err_msg=str(k))


def test_rescale_base_and_composite():
    ds = np.linspace(-10, 10, 50)
    ys_raw = np.linspace(-10, 10, 50)
    tr = LinearTransform.from_minmax(ys_raw, -1, 1)
    inv = tr.invert()
    for b1 in base_kernels():
        M1 = GP.eval_cov(GP.rescale(b1, inv), ds)
        M2 = tr.unapply_var(GP.eval_cov(b1, ds))
        np.testing.assert_allclose(M1, M2, atol=1e-10, err_msg=str(b1))
    for b1 in base_kernels():
        for b2 in base_kernels():
            for op in OPS:
                k = op(b1, b2)
                M1 = GP.eval_cov(GP.rescale(k, inv), ds)
                M2 = tr.unapply_var(GP.eval_cov(k, ds))
                np.testing.assert_allclose(M1, M2, atol=1e-8,
                                           err_msg=str(k))


def test_split_kernel_sop_reference_cases():
    # test_GP.jl:108-146
    l = GP.Linear(1.0)
    w = GP.WhiteNoise(1.0)
    p = GP.Periodic(1.0, 1.0)
    g = GP.GammaExponential(1.0, 1.0)
    p2 = GP.Periodic(2.0, 1.0)
    l2 = GP.Linear(2.0)
    sent = GP.Constant(0.0)

    for b in base_kernels():
        assert GP.split_kernel_sop(b, type(b)) == (b, sent)
        for j in base_kernels():
            if b != j:
                assert GP.split_kernel_sop(b, type(j)) == (sent, b)

    assert GP.split_kernel_sop(l * l + p * l + g * w, GP.Linear) \
        == (l * l + p * l, g * w)
    assert GP.split_kernel_sop(l * (l + p + g), GP.Periodic) \
        == (l * p, l * (l + g))
    assert GP.split_kernel_sop((l * p) * (l + g), GP.Periodic) \
        == ((l * p) * (l + g), sent)
    assert GP.split_kernel_sop((l + p) * (g + l), GP.Periodic) \
        == (p * (g + l), l * (g + l))
    assert GP.split_kernel_sop((l + p) * (p2 + l2), GP.Periodic) \
        == (p * p2 + p * l2 + l * p2, l * l2)

    k = GP.ChangePoint(p * l + l, p * p + g, 1.0, 1.0)
    assert GP.split_kernel_sop(k, GP.WhiteNoise) == (sent, k)
    assert GP.split_kernel_sop(k, GP.GammaExponential) == (
        GP.ChangePoint(sent, g, 1.0, 1.0),
        GP.ChangePoint(p * l + l, p * p, 1.0, 1.0))

    k = GP.ChangePoint(l, p, 1.0, 1.0)
    assert GP.split_kernel_sop(k, GP.WhiteNoise) == (sent, k)
    assert GP.split_kernel_sop(k, GP.Linear) == (
        GP.ChangePoint(l, sent, 1.0, 1.0),
        GP.ChangePoint(sent, p, 1.0, 1.0))


def test_extract_kernel_rules():
    l = GP.Linear(1.0)
    p = GP.Periodic(1.0, 1.0)
    # Plus: non-matching leaf -> Constant(0); Times -> Constant(1)
    assert GP.extract_kernel(l + p, GP.Linear) == l + GP.Constant(0.0)
    assert GP.extract_kernel(l * p, GP.Linear) == l * GP.Constant(1.0)
    cp = GP.ChangePoint(l, p, 1.0, 0.5)
    assert GP.extract_kernel(cp, GP.Linear) == GP.ChangePoint(
        l, GP.Constant(0.0), 1.0, 0.5)
    # retain=False flips the behavior.
    assert GP.extract_kernel(l + p, GP.Linear, retain=False) \
        == GP.Constant(0.0) + p
    # All leaves matching -> single leaf remains itself.
    assert GP.extract_kernel(l, GP.Linear) == l
    assert GP.extract_kernel(l, GP.Periodic) == GP.Constant(0.0)


def test_unroll_and_sizes():
    l = GP.Linear(1.0)
    p = GP.Periodic(1.0, 1.0)
    k = (l + p) * l
    assert k.size == 5
    assert k.depth == 3
    u = GP.unroll(k)
    assert len(u) == 5
    assert u[-1] == k
    assert u[0] == l and u[1] == p  # post-order


def test_pretty():
    k = GP.Linear(0.1, 1.3, 0.7) * GP.Periodic(0.96, 0.21, 1.1)
    s = GP.pretty(k)
    assert s == "(LIN(0.10; 1.30, 0.70) * PER(0.96, 0.21; 1.10))"
    t = GP.pretty_tree(k)
    assert "×" in t and "LIN" in t and "PER" in t


def test_compute_cov_matrix_loop_matches_vectorized():
    """GP.jl:674-684 loop form == vectorized form (+noise*I); ChangePoint
    differs only by the vectorized path's symmetrization (~1e-16)."""
    import numpy as np
    ts = np.linspace(0.0, 1.0, 17)
    ks = [GP.Linear(0.2, 0.5, 0.3),
          GP.Periodic(0.9, 0.4, 1.1) + GP.GammaExponential(0.5, 1.2, 0.8),
          GP.ChangePoint(GP.Linear(0.3), GP.Periodic(1.0, 0.5), 0.5, 0.01)]
    for k in ks:
        a = GP.compute_cov_matrix(k, 0.37, ts)
        b = GP.compute_cov_matrix_vectorized(k, 0.37, ts)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
