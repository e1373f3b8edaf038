"""Hamiltonian Monte Carlo on whitened kernel parameters and noise.

Mirrors Gen.hmc as used by the reference (inference_smc_anneal_data.jl:33-76):
per rejuvenation sweep, an HMC kernel over ALL numeric tree parameters
(leaf params + changepoint locations) followed by a separate HMC kernel on
the noise parameter, with an early-exit counter on consecutive rejections
of the parameter kernel (`n_exit`).

The target is the joint trace score; gradients flow through the covariance
assembly and Cholesky via jax.grad. Leapfrog: standard Stoermer-Verlet with
L steps of size eps (Gen defaults L=10, eps=0.02 at the call sites).

All functions operate on ONE particle (vmap outside).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from autogp_tpu import config as C
from autogp_tpu import gp_math
from autogp_tpu import model as M
from autogp_tpu import tree as T


class HMCConfig(NamedTuple):
    """hmc_config dict of the reference (api.jl:201-206)."""
    L_param: int = 10
    eps_param: float = 0.02
    L_noise: int = 10
    eps_noise: float = 0.02
    n_exit: int = 1


def _joint_logp(node_type, params_z, noise_z, ts, xs, mask, cfg, tables,
                pmask):
    """log p(params, noise, xs | structure) — terms constant in
    (params, noise) are omitted; both HMC kernels difference this."""
    lp_params = jnp.sum(M.normal_logpdf(params_z) * pmask)
    lp_noise = M.normal_logpdf(noise_z)
    # Gradient path: the Pallas assembly is differentiable via its
    # custom-VJP kernel (ops/cov_pallas_vjp.py), so auto-select.
    lml = M.lml(node_type, params_z, noise_z, ts, xs, mask, cfg, tables)
    return lp_params + lp_noise + lml, lml


def hmc_params_step(key, node_type, params_z, noise_z, lml_cached, data,
                    cfg: C.GPConfig, tables, eps, L: int):
    """One HMC trajectory over the tree parameters (noise fixed)."""
    ts, xs, mask = data
    pmask = T.param_mask(node_type).astype(params_z.dtype)

    def U(p):
        lp, lml = _joint_logp(node_type, p, noise_z, ts, xs, mask, cfg,
                              tables, pmask)
        return -lp, lml

    k_mom, k_acc = jax.random.split(key)
    mom0 = jax.random.normal(k_mom, params_z.shape, params_z.dtype) * pmask

    # One traced instance of the grad-LML program (the largest subprogram
    # of the SMC round): iteration 0 runs with step size 0, which reduces
    # the body to the initial value_and_grad evaluation at q0; the body's
    # evaluation at the updated position doubles as the endpoint energy,
    # so neither a standalone init call nor a final U(q_new) is needed.
    def leapfrog(carry, eps_i):
        q, p, g, _u, _lml = carry
        p = p - 0.5 * eps_i * g
        q = q + eps_i * p * pmask
        (u, lml), g_new = jax.value_and_grad(U, has_aux=True)(q)
        g_new = g_new * pmask
        p = p - 0.5 * eps_i * g_new
        return (q, p, g_new, u, lml), u

    eps_arr = jnp.full((L + 1,), eps, params_z.dtype).at[0].set(0.0)
    # Carry seeds must match the body's output dtypes exactly (e.g. U can
    # return float64 under x64 even for float32 params); eval_shape is
    # trace-only and adds nothing to the program.
    u_s, lml_s = jax.eval_shape(U, params_z)
    (q_new, p_new, _, u1, lml1), us = jax.lax.scan(
        leapfrog, (params_z, mom0, jnp.zeros_like(params_z),
                   jnp.zeros(u_s.shape, u_s.dtype),
                   jnp.zeros(lml_s.shape, lml_s.dtype)),
        eps_arr)
    u0 = us[0]
    dh = (u1 - u0) + 0.5 * (jnp.sum(p_new * p_new) - jnp.sum(mom0 * mom0))
    accept = (jnp.log(jax.random.uniform(k_acc)) < -dh) & jnp.isfinite(dh)
    return (jnp.where(accept, q_new, params_z),
            jnp.where(accept, lml1, lml_cached),
            accept)


def hmc_noise_step(key, node_type, params_z, noise_z, lml_cached, data,
                   cfg: C.GPConfig, tables, eps, L: int):
    """One HMC trajectory on the noise parameter (params fixed)."""
    ts, xs, mask = data
    pmask = T.param_mask(node_type).astype(params_z.dtype)

    lp_params = jnp.sum(M.normal_logpdf(params_z) * pmask)

    N = ts.shape[0]
    use_k0 = gp_math._use_blocked_inv(N)
    # Noise only shifts the active diagonal: assemble the gram ONCE per
    # trajectory; each leapfrog step pays Cholesky + trace, not assembly.
    K0 = M.assemble_K0(node_type, params_z, ts, mask, cfg, tables) \
        if use_k0 else None

    def U_vg(nz):
        """((U, lml), dU/dnz) via the analytic noise gradient — the
        scalar-gradient leapfrog skips the assembly-backward kernel."""
        if use_k0:
            lml, glml = M.lml_value_and_noise_grad_from_K0(
                K0, nz, xs, mask, cfg)
        else:
            lml, glml = M.lml_value_and_noise_grad(
                node_type, params_z, nz, ts, xs, mask, cfg, tables)
        u = -(lp_params + M.normal_logpdf(nz) + lml)
        gu = -(-nz + glml)
        return (u, lml), gu

    k_mom, k_acc = jax.random.split(key)
    mom0 = jax.random.normal(k_mom, (), noise_z.dtype)

    # Single traced U_vg instance, as in hmc_params_step: iteration 0 runs
    # with step size 0 (the init evaluation); the body's U_vg at the
    # updated position doubles as the trajectory-end energy evaluation.
    def leapfrog(carry, eps_i):
        q, p, g, _u, _lml = carry
        p = p - 0.5 * eps_i * g
        q = q + eps_i * p
        (u, lml), g_new = U_vg(q)
        p = p - 0.5 * eps_i * g_new
        return (q, p, g_new, u, lml), u

    eps_arr = jnp.full((L + 1,), eps, noise_z.dtype).at[0].set(0.0)
    # Carry seeds must match the body's output dtypes (see hmc_params_step).
    (u_s, lml_s), g_s = jax.eval_shape(U_vg, noise_z)
    (q_new, p_new, _, u1, lml1), us = jax.lax.scan(
        leapfrog, (noise_z, mom0, jnp.zeros(g_s.shape, g_s.dtype),
                   jnp.zeros(u_s.shape, u_s.dtype),
                   jnp.zeros(lml_s.shape, lml_s.dtype)), eps_arr)
    u0 = us[0]
    dh = (u1 - u0) + 0.5 * (p_new * p_new - mom0 * mom0)
    accept = (jnp.log(jax.random.uniform(k_acc)) < -dh) & jnp.isfinite(dh)
    # lml1 comes from lml_value_and_noise_grad's fused factor+solve —
    # the SAME algorithm as model.lml's primal (gp_math r2 rework), so
    # cached-vs-recomputed drift is limited to the assembly difference
    # (tape kernel with in-kernel noise diag vs K0 + noise*I), at the
    # float32 rounding level; reweight always recomputes from scratch,
    # so it never accumulates.
    return (jnp.where(accept, q_new, noise_z),
            jnp.where(accept, lml1, lml_cached),
            accept)


def rejuvenate_parameters(key, node_type, params_z, noise_z, lml_cached,
                          data, cfg: C.GPConfig, tables,
                          n_hmc: int, hmc: HMCConfig, infer_noise: bool,
                          enabled=True):
    """n_hmc sweeps of (param-HMC [+ noise-HMC]) with early exit after
    `n_exit` consecutive param-HMC rejections
    (inference_smc_anneal_data.jl:33-76). Returns updated state + stats.

    `enabled` (traced bool) gates the whole sweep — used to restrict HMC to
    particles whose structure move was accepted (smc_anneal_data.jl:99-105)
    while staying vmappable.
    """
    def body(carry):
        (params_z, noise_z, lml, n_reject, n_accept, n_sweeps, it, alive,
         key) = carry
        key, k1, k2 = jax.random.split(key, 3)
        p_new, lml_p, acc_p = hmc_params_step(
            k1, node_type, params_z, noise_z, lml, data, cfg, tables,
            hmc.eps_param, hmc.L_param)
        params_z = jnp.where(alive, p_new, params_z)
        lml = jnp.where(alive, lml_p, lml)
        if infer_noise:
            nz_new, lml_n, _ = hmc_noise_step(
                k2, node_type, params_z, noise_z, lml, data, cfg, tables,
                hmc.eps_noise, hmc.L_noise)
            noise_z = jnp.where(alive, nz_new, noise_z)
            lml = jnp.where(alive, lml_n, lml)
        acc_eff = alive & acc_p
        n_accept = n_accept + jnp.where(acc_eff, 1, 0)
        n_sweeps = n_sweeps + jnp.where(alive, 1, 0)
        n_reject = jnp.where(acc_eff, 0, n_reject + jnp.where(alive, 1, 0))
        it = it + 1
        alive = alive & (n_reject < hmc.n_exit)
        return (params_z, noise_z, lml, n_reject, n_accept, n_sweeps, it,
                alive, key)

    def cond(carry):
        *_, it, alive, _key = carry
        return alive & (it < n_hmc)

    if n_hmc == 0:
        zero = jnp.asarray(0, jnp.int32)
        return params_z, noise_z, lml_cached, zero, zero
    init = (params_z, noise_z, lml_cached,
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(enabled), key)
    # while_loop instead of a masked scan: with n_exit small (fit_smc
    # defaults n_exit=1) most particles stop after a few sweeps, and the
    # batched loop only runs until the LAST live particle exits.
    (params_z, noise_z, lml, _, n_accept, n_sweeps, _, _, _) = \
        jax.lax.while_loop(cond, body, init)
    return params_z, noise_z, lml, n_accept, n_sweeps
