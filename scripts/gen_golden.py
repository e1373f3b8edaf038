"""Generate reference-pinned golden values for tests/test_golden.py.

INDEPENDENT oracle: every formula here is transcribed directly from the
Julia reference (/root/reference/src/GP.jl, src/Model.jl) and evaluated
with mpmath at 60 significant digits — no autogp_tpu code path is
imported, so any future drift in gp_math/model/kernels (formulas, jitters,
transforms, prior tables) is caught against values the library cannot
influence.

Transcribed semantics:
  - leaf covariances            GP.jl:135-346
  - Plus/Times/ChangePoint      GP.jl:358-503 (sigma_cp at :481)
  - cov matrix + noise          GP.jl:666-668
  - posterior MVN (Schur)       GP.jl:731-758
  - infer_gp_sum                GP.jl:904-993 (JITTER 1e-8 at :760)
  - param transforms            Model.jl:24-63
  - tree prior + model joint    Model.jl:66-138 (JITTER 1e-5 at :22)
  - GPConfig default dists      GP.jl:1121-1137
  - mixture quantile bisection  api.jl:559-596

Run: python scripts/gen_golden.py   (writes tests/golden/golden.json)
"""

import json
import os

import mpmath as mp

mp.mp.dps = 60

# --- default prior hypers (GP.jl:1133-1137) --------------------------------
WILD_MU, WILD_SIGMA = mp.mpf("-1.5"), mp.mpf(1)
PERIOD_MU, PERIOD_SIGMA = mp.mpf("-1.5"), mp.mpf(1)
GAMMA_SCALE, GAMMA_MU, GAMMA_SIGMA = mp.mpf(2), mp.mpf(0), mp.mpf(1)
MODEL_JITTER = mp.mpf("1e-5")      # Model.jl:22
SUM_GP_JITTER = mp.mpf("1e-8")     # GP.jl:760
CP_SCALE = mp.mpf("0.001")         # Model.jl:121

# node_dist defaults (GP.jl:1121-1123), as exact fractions of their sums
DIST_LEAF = [mp.mpf(w) / 3 for w in [0, 1, 0, 1, 1]]
DIST_NOCP = [mp.mpf(w) / 28 for w in [0, 6, 0, 6, 6, 5, 5]]
DIST_CP = [mp.mpf(w) / 28 for w in [0, 6, 0, 6, 6, 4, 4, 2]]

CODE = {"CONST": 1, "LIN": 2, "SE": 3, "GE": 4, "PER": 5,
        "+": 6, "*": 7, "CP": 8}


def t_wild(z):
    return mp.exp(WILD_MU + WILD_SIGMA * z)  # Model.jl:24


def t_period(z):
    return mp.exp(PERIOD_MU + PERIOD_SIGMA * z)


def t_gamma(z):
    return GAMMA_SCALE / (1 + mp.exp(-(GAMMA_MU + GAMMA_SIGMA * z)))


# transform kind per (leaf type, field index), Model.jl:35-48 dispatch on
# Julia fieldnames order (GP.jl struct definitions).
FIELD_TRANSFORMS = {
    "CONST": [t_wild],
    "LIN": [t_wild, t_wild, t_wild],          # intercept, bias, amplitude
    "SE": [t_wild, t_wild],                   # lengthscale, amplitude
    "GE": [t_wild, t_gamma, t_wild],          # lengthscale, gamma, amplitude
    "PER": [t_wild, t_period, t_wild],        # lengthscale, period, amplitude
}


def leaf_params(spec):
    kind, zs = spec[0], spec[1]
    return [f(mp.mpf(z)) for f, z in zip(FIELD_TRANSFORMS[kind], zs)]


def sigma_cp(x, location):
    return mp.mpf("0.5") * (1 + mp.tanh((location - x) / CP_SCALE))


def k_eval(spec, t1, t2):
    """eval_cov(node, t1, t2) — GP.jl:135-503."""
    kind = spec[0]
    if kind == "CONST":
        (v,) = leaf_params(spec)
        return v
    if kind == "LIN":
        intercept, bias, amp = leaf_params(spec)
        return bias + amp * (t1 - intercept) * (t2 - intercept)
    if kind == "SE":
        ls, amp = leaf_params(spec)
        d = t1 - t2
        return amp * mp.exp(mp.mpf("-0.5") * d * d / (ls * ls))
    if kind == "GE":
        ls, gam, amp = leaf_params(spec)
        dt = abs(t1 - t2)
        return amp * mp.exp(-((dt / ls) ** gam))
    if kind == "PER":
        ls, period, amp = leaf_params(spec)
        dx = abs(t1 - t2)
        s = mp.sin(mp.pi / period * dx)
        return amp * mp.exp((-2 / (ls * ls)) * s * s)
    if kind == "+":
        return k_eval(spec[1], t1, t2) + k_eval(spec[2], t1, t2)
    if kind == "*":
        return k_eval(spec[1], t1, t2) * k_eval(spec[2], t1, t2)
    if kind == "CP":
        loc = t_wild(mp.mpf(spec[1]))
        s1, s2 = sigma_cp(t1, loc), sigma_cp(t2, loc)
        return (s1 * k_eval(spec[2], t1, t2) * s2
                + (1 - s1) * k_eval(spec[3], t1, t2) * (1 - s2))
    raise ValueError(kind)


def cov_matrix(spec, noise, ts):
    n = len(ts)
    K = mp.zeros(n, n)
    for i in range(n):
        for j in range(n):
            K[i, j] = k_eval(spec, ts[i], ts[j])
    # GP.jl:495-500 symmetrizes the CP block; exact arithmetic is already
    # symmetric, so K + noise I matches compute_cov_matrix_vectorized.
    for i in range(n):
        K[i, i] += noise
    return K


def lu_solve_mat(A, B):
    """Solve A X = B column-by-column (mp.lu_solve handles vectors only)."""
    X = mp.zeros(B.rows, B.cols)
    for j in range(B.cols):
        col = mp.lu_solve(A, B[:, j])
        for i in range(B.rows):
            X[i, j] = col[i]
    return X


def mvn_logpdf_zero_mean(K, x):
    n = len(x)
    L = mp.cholesky(K)
    logdet = 2 * mp.fsum(mp.log(L[i, i]) for i in range(n))
    alpha = mp.lu_solve(K, mp.matrix(x))
    quad = mp.fsum(x[i] * alpha[i] for i in range(n))
    return mp.mpf("-0.5") * (n * mp.log(2 * mp.pi) + logdet + quad)


def model_lml(spec, noise_z, ts, xs):
    """MVN likelihood term of Model.jl:130-138."""
    noise = t_wild(mp.mpf(noise_z)) + MODEL_JITTER
    K = cov_matrix(spec, noise, [mp.mpf(t) for t in ts])
    return mvn_logpdf_zero_mean(K, [mp.mpf(x) for x in xs])


def normal_logpdf(z):
    z = mp.mpf(z)
    return mp.mpf("-0.5") * (z * z + mp.log(2 * mp.pi))


def tree_prior_logpdf(spec, depth=1, cp_allowed=True, max_depth=4):
    """Prior log density of the tree choices, Model.jl:66-128.

    cp gating: Plus/Times rebuild the config with changepoints=false for
    their whole subtree (Model.jl:103); CP passes it through unchanged.
    """
    if depth == max_depth:
        dist = DIST_LEAF
    elif cp_allowed:
        dist = DIST_CP
    else:
        dist = DIST_NOCP
    kind = spec[0]
    lp = mp.log(dist[CODE[kind] - 1])
    if kind in FIELD_TRANSFORMS:
        for z in spec[1]:
            lp += normal_logpdf(z)
    elif kind in ("+", "*"):
        lp += tree_prior_logpdf(spec[1], depth + 1, False, max_depth)
        lp += tree_prior_logpdf(spec[2], depth + 1, False, max_depth)
    elif kind == "CP":
        lp += normal_logpdf(spec[1])
        lp += tree_prior_logpdf(spec[2], depth + 1, cp_allowed, max_depth)
        lp += tree_prior_logpdf(spec[3], depth + 1, cp_allowed, max_depth)
    return lp


def posterior_mvn(spec, noise, ts, xs, ts_pred, noise_pred):
    """GP.jl:731-758 (zero mean)."""
    n, p = len(ts), len(ts_pred)
    z = [mp.mpf(t) for t in ts] + [mp.mpf(t) for t in ts_pred]
    K = cov_matrix(spec, mp.mpf(0), z)
    K11 = K[:n, :n]
    for i in range(n):
        K11[i, i] += mp.mpf(noise)
    K12 = K[:n, n:]
    K21 = K[n:, :n]
    K22 = K[n:, n:]
    sol_x = mp.lu_solve(K11, mp.matrix([mp.mpf(x) for x in xs]))
    mu = K21 * sol_x
    sol_K12 = lu_solve_mat(K11, K12)
    cov = K22 - K21 * sol_K12
    cov = mp.mpf("0.5") * (cov + cov.T)
    for i in range(p):
        cov[i, i] += mp.mpf(noise_pred)
    return mu, cov


def infer_gp_sum(specs, noise, ts, xs, ts_pred, noise_pred):
    """GP.jl:904-993 (Schur complement + 1e-8 jitter on the result)."""
    m, n, p = len(specs), len(ts), len(ts_pred)
    z = [mp.mpf(t) for t in ts] + [mp.mpf(t) for t in ts_pred]
    Ktt, Ktp, Kpp = [], [], []
    for s in specs:
        Ki = cov_matrix(s, mp.mpf(0), z)
        Ktt.append(Ki[:n, :n])
        Ktp.append(Ki[:n, n:])
        Kpp.append(Ki[n:, n:])
    S_tt = mp.zeros(n, n)
    S_tp = mp.zeros(n, p)
    S_pp = mp.zeros(p, p)
    for i in range(m):
        S_tt += Ktt[i]
        S_tp += Ktp[i]
        S_pp += Kpp[i]
    d_a = m * p + p
    Saa = mp.zeros(d_a, d_a)
    Sab = mp.zeros(d_a, n)
    for i in range(m):
        r0 = i * p
        Saa[r0:r0 + p, r0:r0 + p] = Kpp[i]
        Saa[r0:r0 + p, m * p:m * p + p] = Kpp[i]
        Saa[m * p:m * p + p, r0:r0 + p] = Kpp[i].T
        Sab[r0:r0 + p, :n] = Ktp[i].T
    Saa[m * p:, m * p:] = S_pp
    for i in range(p):
        Saa[m * p + i, m * p + i] += mp.mpf(noise_pred)
    Sab[m * p:, :n] = S_tp.T
    Sbb = S_tt.copy()
    for i in range(n):
        Sbb[i, i] += mp.mpf(noise)
    mu = Sab * mp.lu_solve(Sbb, mp.matrix([mp.mpf(x) for x in xs]))
    cov = Saa - Sab * lu_solve_mat(Sbb, Sab.T)
    cov = mp.mpf("0.5") * (cov + cov.T)
    for i in range(d_a):
        cov[i, i] += SUM_GP_JITTER
    return mu, cov


def mixture_quantile(q, weights, mus, sigmas):
    """Gaussian-mixture CDF bisection (api.jl:559-596)."""
    q = mp.mpf(q)

    def cdf(x):
        return mp.fsum(
            mp.mpf(w) * mp.ncdf((x - mp.mpf(m)) / mp.mpf(s))
            for w, m, s in zip(weights, mus, sigmas))

    lo, hi = mp.mpf(-100), mp.mpf(100)
    for _ in range(400):
        mid = (lo + hi) / 2
        if cdf(mid) < q:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def fs(x, d=17):
    return float(mp.nstr(x, d))


def fmat(Mx):
    return [[fs(Mx[i, j]) for j in range(Mx.cols)] for i in range(Mx.rows)]


def fvec(v):
    return [fs(v[i]) for i in range(len(v))]


def main():
    # fixed literal data (no RNG anywhere)
    ts = [0.0, 0.1428, 0.27, 0.405, 0.55, 0.6666, 0.81, 1.0]
    xs = [0.31, -0.42, 1.05, 0.17, -0.88, 0.64, -0.05, 0.73]
    ts_pred = [1.05, 1.15, 1.3, 1.42, 1.5]

    T1 = ["PER", [0.3, -0.4, 0.2]]
    T2 = ["+", ["LIN", [0.1, -0.2, 0.5]],
          ["*", ["PER", [-0.3, 0.25, 0.1]], ["GE", [0.4, -0.6, -0.15]]]]
    T3 = ["CP", 0.05, ["LIN", [-0.5, 0.3, 0.2]], ["PER", [0.2, -0.1, 0.45]]]
    trees = {"T1": T1, "T2": T2, "T3": T3}
    noise_zs = {"T1": 0.1, "T2": -0.3, "T3": 0.55}

    out = {"data": {"ts": ts, "xs": xs, "ts_pred": ts_pred},
           "max_depth": 4,
           "trees": trees,
           "lml": {}, "tree_prior": {}}

    for name, spec in trees.items():
        out["lml"][name] = {
            "noise_z": noise_zs[name],
            "value": fs(model_lml(spec, noise_zs[name], ts, xs)),
        }
        out["tree_prior"][name] = fs(tree_prior_logpdf(spec))

    noise, noise_pred = "0.0225", "0.01"
    mu, cov = posterior_mvn(T2, noise, ts, xs, ts_pred, noise_pred)
    out["posterior"] = {"tree": "T2", "noise": float(noise),
                        "noise_pred": float(noise_pred),
                        "mu": fvec(mu), "cov": fmat(cov)}

    comps = [T2[1], T2[2]]  # the two summands of T2
    mu_s, cov_s = infer_gp_sum(comps, noise, ts, xs, ts_pred[:4], noise_pred)
    out["gp_sum"] = {"components": comps, "noise": float(noise),
                     "noise_pred": float(noise_pred), "p": 4,
                     "mu": fvec(mu_s), "cov": fmat(cov_s)}

    mix = {"weights": [0.3, 0.7], "mus": [-0.5, 1.2], "sigmas": [0.4, 0.9]}
    mix["quantiles"] = {
        str(q): fs(mixture_quantile(q, mix["weights"], mix["mus"],
                                    mix["sigmas"]))
        for q in [0.025, 0.1, 0.5, 0.9, 0.975]}
    out["mixture_quantile"] = mix

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "golden.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.normpath(path))


if __name__ == "__main__":
    main()
