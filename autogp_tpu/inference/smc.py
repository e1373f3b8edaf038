"""Sequential Monte Carlo with data annealing over a padded particle batch.

The reference (src/inference_smc_anneal_data.jl) threads Julia tasks over
particles; here the whole SMC round — incremental-data reweight, adaptive
multinomial resampling, involutive-MCMC + HMC rejuvenation — is a single
jitted program vmapped across the particle axis. Growing data prefixes are
handled with a padded time grid + mask (bucketed to powers of two), so one
compilation serves many schedule steps.

Particle state is a flat pytree of stacked tensor traces:
  node_type[P,M], params[P,M,3], noise_z[P], log_weights[P], lml[P].
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import config as C
from autogp_tpu import model as M
from autogp_tpu import tree as T
from autogp_tpu.inference import hmc as hmc_mod
from autogp_tpu.inference import moves


class Particles(NamedTuple):
    """Gen.ParticleFilterState analog (api.jl:83-90)."""
    node_type: jnp.ndarray    # [P, M] int32
    params: jnp.ndarray       # [P, M, 3]
    noise_z: jnp.ndarray      # [P]
    log_weights: jnp.ndarray  # [P]
    lml: jnp.ndarray          # [P] cached LML for the current data mask
    log_ml_est: jnp.ndarray   # [] accumulated at resampling
    parents: jnp.ndarray      # [P] parent indices from the last resample

    @property
    def n_particles(self):
        return self.node_type.shape[0]


# Finite stand-in for the cached LML of a particle whose covariance is so
# ill-conditioned that the (f32) Cholesky produced a non-finite value. The
# particle's log_weight is forced to -inf (it contributes nothing to any
# estimate), while the cached LML stays finite so weight arithmetic in
# later rounds never produces NaN (inf - inf). An MH move away from the
# bad structure sees log_alpha = lml_new - BAD_LML = huge and escapes.
BAD_LML = -1e30


class Dataset(NamedTuple):
    ts: jnp.ndarray     # [N] padded time grid
    xs: jnp.ndarray     # [N] padded observations (0 at padding)
    mask: jnp.ndarray   # [N] {0,1}


def bucket_size(n: int, minimum: int = 32) -> int:
    """Pad target: next power of two >= n (bounds recompilation count)."""
    if n <= minimum:
        return minimum
    return 1 << math.ceil(math.log2(n))


def make_dataset(ts, xs, n: Optional[int] = None, pad_to: Optional[int] = None,
                 dtype=None) -> Dataset:
    ts = np.asarray(ts, dtype=np.float64)
    xs = np.asarray(xs, dtype=np.float64)
    n = len(ts) if n is None else n
    size = pad_to if pad_to is not None else bucket_size(max(n, 1))
    dt = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    tp = np.zeros(size)
    xp = np.zeros(size)
    mk = np.zeros(size)
    tp[:n] = ts[:n]
    xp[:n] = xs[:n]
    mk[:n] = 1.0
    return Dataset(jnp.asarray(tp, dt), jnp.asarray(xp, dt),
                   jnp.asarray(mk, dt))


# ---------------------------------------------------------------------------
# Initialization (Gen.initialize_particle_filter, api.jl:108)
# ---------------------------------------------------------------------------

_init_cache = {}


def _mesh_sig(mesh):
    """Hashable content key for an optional jax.sharding.Mesh."""
    if mesh is None:
        return None
    return (mesh.axis_names, mesh.devices.shape,
            tuple(d.id for d in mesh.devices.flat))


def _init_fns(sig, n_particles, cfg, tables, noise_c, dt, mesh):
    """(generate, regen) jits for `initialize`, content-keyed.

    `generate` draws the full prior batch; `regen` redraws it with keys
    fold_in(key, retry) and substitutes only the lanes flagged bad —
    called from the host-level retry loop only when a non-finite LML
    actually occurred, so the common path compiles one program.
    """
    if sig in _init_cache:
        return _init_cache[sig]

    def gen_batch(keys, ts, xs, mask):
        def gen_one(k):
            return M.generate(k, ts, xs, mask, cfg, tables,
                              noise_z_constraint=noise_c, dtype=dt)

        node_type, params, noise_z, w = jax.vmap(gen_one)(keys)
        lml = jax.vmap(
            lambda nt, pz, nz: M.lml(nt, pz, nz, ts, xs, mask, cfg,
                                     tables))(node_type, params, noise_z)
        return node_type, params, noise_z, w, lml

    def f(key, ts, xs, mask):
        return gen_batch(jax.random.split(key, n_particles), ts, xs, mask)

    def regen(key, retry, bad, nt, pz, nz, w, lml, ts, xs, mask):
        keys = jax.random.split(jax.random.fold_in(key, retry), n_particles)
        nt2, pz2, nz2, w2, lml2 = gen_batch(keys, ts, xs, mask)
        sub = lambda a, b: jnp.where(
            bad.reshape((-1,) + (1,) * (a.ndim - 1)), b, a)
        return (sub(nt, nt2), sub(pz, pz2), sub(nz, nz2), sub(w, w2),
                sub(lml, lml2))

    kw = {}
    if mesh is not None:
        from autogp_tpu.parallel import mesh as pmesh
        ps = pmesh.particle_sharding(mesh)
        kw["out_shardings"] = (ps, ps, ps, ps, ps)
    _init_cache[sig] = (jax.jit(f, **kw), jax.jit(regen, **kw))
    return _init_cache[sig]


def _bad_mask(w, lml):
    bad = ~(jnp.isfinite(w) & jnp.isfinite(lml))
    return bad, jnp.any(bad)


_bad_mask_jit = jax.jit(_bad_mask)
_clamp_bad_jit = jax.jit(
    lambda bad, w, lml: (jnp.where(bad, -jnp.inf, w),
                         jnp.where(bad, jnp.asarray(BAD_LML, lml.dtype),
                                   lml)))


def initialize(key, n_particles: int, data: Dataset, cfg: C.GPConfig,
               tables: M.PriorTables, dtype=None, mesh=None,
               max_retries: int = 3) -> Particles:
    """Draw the initial particle batch from the prior.

    With `mesh`, outputs are created directly under the particle-axis
    sharding (no device-0 staging). Lanes whose LML or generate weight is
    non-finite (ill-conditioned f32 grams at large N) are redrawn with
    fresh keys up to `max_retries` times; any still-bad lane gets
    log_weight=-inf and lml=BAD_LML so downstream arithmetic stays
    NaN-free (Gen.initialize_particle_filter analog, api.jl:108).
    """
    dt = dtype or data.ts.dtype
    noise_c = (None if cfg.noise is None
               else M.untransform_param("noise", cfg.noise, cfg))
    # Content-keyed jit: an eager vmap here dispatches every op through
    # the remote relay individually (~100s of round trips per init).
    sig = (cfg.cache_key, n_particles, jnp.dtype(dt).name, noise_c is None,
           _mesh_sig(mesh))
    gen_fn, regen_fn = _init_fns(sig, n_particles, cfg, tables, noise_c,
                                 dt, mesh)
    node_type, params, noise_z, w, lml = gen_fn(
        key, data.ts, data.xs, data.mask)

    # Bad-lane mask computed ON DEVICE: the mask array keeps the (possibly
    # multi-process) particle sharding and only the replicated any-reduce
    # scalar crosses to the host — np.asarray of a sharded array raises
    # when the mesh spans processes (tests/multihost_worker.py), and eager
    # ops would dispatch per-op through the remote relay.
    bad, any_bad = _bad_mask_jit(w, lml)
    retry = 0
    while bool(any_bad) and retry < max_retries:
        retry += 1
        node_type, params, noise_z, w, lml = regen_fn(
            key, retry, bad, node_type, params, noise_z, w,
            lml, data.ts, data.xs, data.mask)
        bad, any_bad = _bad_mask_jit(w, lml)
    if bool(any_bad):
        w, lml = _clamp_bad_jit(bad, w, lml)

    return Particles(
        node_type=node_type, params=params, noise_z=noise_z,
        log_weights=w.astype(dt), lml=lml,
        log_ml_est=jnp.asarray(0.0, dt),
        parents=jnp.arange(n_particles, dtype=jnp.int32))


_lml_all_cache = {}


def _lml_all(node_type, params, noise_z, data: Dataset, cfg, tables):
    sig = cfg.cache_key
    if sig not in _lml_all_cache:
        def f(node_type, params, noise_z, ts, xs, mask):
            return jax.vmap(
                lambda nt, pz, nz: M.lml(nt, pz, nz, ts, xs, mask, cfg,
                                         tables))(node_type, params,
                                                  noise_z)
        _lml_all_cache[sig] = jax.jit(f)
    return _lml_all_cache[sig](node_type, params, noise_z, data.ts,
                               data.xs, data.mask)


# ---------------------------------------------------------------------------
# Weights / ESS (Gen.normalize_weights / effective_sample_size)
# ---------------------------------------------------------------------------

def log_normalized_weights(log_weights):
    return log_weights - jax.scipy.special.logsumexp(log_weights)

def normalized_weights(log_weights):
    return jnp.exp(log_normalized_weights(log_weights))

def effective_sample_size(log_weights):
    return 1.0 / jnp.sum(jnp.exp(2.0 * log_normalized_weights(log_weights)))


# ---------------------------------------------------------------------------
# SMC step: reweight on extended data (smc_step!, :127-141)
# ---------------------------------------------------------------------------

def reweight(particles: Particles, data: Dataset, cfg, tables) -> Particles:
    """Gen.update with incremental data: weight += LML_new - LML_cached.

    A non-finite incremental LML (f32 Cholesky blow-up) must not poison
    the ensemble: that lane's weight is clamped to -inf and its cached
    LML to the finite BAD_LML sentinel instead of propagating NaN."""
    lml_new = _lml_all(particles.node_type, particles.params,
                       particles.noise_z, data, cfg, tables)
    ok = jnp.isfinite(lml_new)
    return particles._replace(
        log_weights=jnp.where(
            ok, particles.log_weights + lml_new - particles.lml,
            -jnp.inf),
        lml=jnp.where(ok, lml_new, jnp.asarray(BAD_LML, lml_new.dtype)))


# ---------------------------------------------------------------------------
# Resampling (Gen.maybe_resample!)
# ---------------------------------------------------------------------------

def maybe_resample(key, particles: Particles, ess_threshold) -> tuple:
    """Multinomial resampling when ESS < threshold; folds the current
    weight normalizer into log_ml_est and zeroes the weights.

    Gen's ParticleFilterState.parents persists from the LAST resample
    (consumed by scripts/online.jl:67); on a non-resampling round the
    field is left untouched, not reset to the identity."""
    P = particles.n_particles
    lw = particles.log_weights
    lnw = log_normalized_weights(lw)
    ess = 1.0 / jnp.sum(jnp.exp(2.0 * lnw))
    do = ess < ess_threshold

    parents = jax.random.categorical(key, lnw, shape=(P,)).astype(jnp.int32)
    keep = jnp.arange(P, dtype=jnp.int32)
    sel = jnp.where(do, parents, keep)

    resampled = Particles(
        node_type=particles.node_type[sel],
        params=particles.params[sel],
        noise_z=particles.noise_z[sel],
        log_weights=jnp.where(do, jnp.zeros_like(lw), lw),
        lml=particles.lml[sel],
        log_ml_est=particles.log_ml_est + jnp.where(
            do,
            jax.scipy.special.logsumexp(lw) - jnp.log(float(P)), 0.0),
        parents=jnp.where(do, parents, particles.parents))
    return resampled, do


# Single jitted entry for host-side callers (api.maybe_resample): one
# trace per particle-batch shape; ess_threshold is a traced operand so
# changing it does not recompile.
maybe_resample_jit = jax.jit(maybe_resample)


# ---------------------------------------------------------------------------
# Rejuvenation (rejuvenate_particle_structure, :78-119)
# ---------------------------------------------------------------------------

def _hmc_chunk_width(P: int, compact: bool) -> int:
    """Static chunk width for compacted HMC dispatch. HMC only runs on
    MH-accepted particles (~25% acceptance measured on the config-4
    workload), so the full-width batched while_loop wastes ~4x of the
    dominant leapfrog cost on masked-out lanes. Compaction gathers the
    enabled particles to the front and scans over P/W fixed-width chunks:
    chunks past the enabled count hold only disabled lanes, whose batched
    while_loop exits after one condition evaluation. One chunk width means
    ONE compiled HMC instantiation (a lax.switch over width buckets was
    tried first: 3 instantiations of the dominant subprogram tripled the
    already-minutes-long SMC-round compiles). W ~= P/4 matches the mean
    enabled count, so typically a single chunk does all the work."""
    if not compact or P < 16:
        return P
    return max(8, P // 4)


def rejuvenate_structure(key, particles: Particles, data: Dataset,
                         cfg: C.GPConfig, tables, n_mcmc: int, n_hmc: int,
                         biased: bool, hmc_cfg: hmc_mod.HMCConfig,
                         infer_noise: bool, hmc_compact: bool = True,
                         check: bool = False) -> tuple:
    """n_mcmc involutive-MH steps; each particle that accepts a structure
    move gets an HMC parameter sweep. Whole batch in one scan.

    With check=True, every MH step additionally runs the involution
    round-trip checks (inference/check.py) on the post-move state of
    every particle — the Gen.metropolis_hastings(check=true) analog
    (inference_smc_anneal_data.jl:90-96), catching mid-round transient
    trace corruption that a final-state sweep would miss. Returns
    (particles, n_accepted[P], n_hmc_sweeps[P], check_ok[P,3]); check_ok
    is all-True when check=False."""
    from autogp_tpu.inference import check as check_mod

    d = (data.ts, data.xs, data.mask)

    def mh_all(keys, nt, pz, nz, lml):
        return jax.vmap(
            lambda k, a, b, c, l: moves.tree_rejuvenation_step(
                k, a, b, c, l, d, cfg, tables, biased=biased)
        )(keys, nt, pz, nz, lml)

    def hmc_all(keys, nt, pz, nz, lml, enabled):
        return jax.vmap(
            lambda k, a, b, c, l, e: hmc_mod.rejuvenate_parameters(
                k, a, b, c, l, d, cfg, tables, n_hmc, hmc_cfg, infer_noise,
                enabled=e)
        )(keys, nt, pz, nz, lml, enabled)

    P = particles.n_particles

    def body(carry, k):
        nt, pz, nz, lml, n_acc, n_sweeps, ok = carry
        k_mh, k_hmc = jax.random.split(k)
        res = mh_all(jax.random.split(k_mh, P), nt, pz, nz, lml)
        nt, pz, lml = res.node_type, res.params, res.lml
        if check:
            # fold_in (not a third split) so the MH/HMC key streams are
            # identical with and without checking.
            keys_chk = jax.random.split(jax.random.fold_in(k, 0x5eed), P)

            def chk_one(kk, a, b):
                valid = check_mod.trace_structurally_valid(
                    a, changepoints=cfg.changepoints)
                rts = check_mod.roundtrip_all(
                    kk, a, b, tables, changepoints=cfg.changepoints,
                    biased=biased)
                return jnp.concatenate([valid[None], rts])

            ok = ok & jax.vmap(chk_one)(keys_chk, nt, pz)

        if n_hmc > 0:
            W = _hmc_chunk_width(P, hmc_compact)

            def run_hmc(args):
                nt, pz, nz, lml = args
                acc = res.accepted
                keys = jax.random.split(k_hmc, P)
                if W == P:
                    p2, n2, l2, _, sw = hmc_all(keys, nt, pz, nz, lml, acc)
                    return p2, n2, l2, sw
                # enabled-first stable order; per-particle keys ride along,
                # so a particle's trajectory is chunk-independent.
                order = jnp.argsort(jnp.logical_not(acc),
                                    stable=True).astype(jnp.int32)
                n_chunks = -(-P // W)
                pad = n_chunks * W - P
                if pad:
                    # Duplicated indices are safe: the duplicated lane runs
                    # the identical trajectory (same key/state) in every
                    # chunk it appears in, and the scatter writes equal
                    # values.
                    order = jnp.concatenate(
                        [order, jnp.broadcast_to(order[-1], (pad,))])
                chunks = order.reshape(n_chunks, W)

                def chunk_body(_, sel):
                    # Chunks past the enabled count hold only disabled
                    # lanes; lax.cond skips them entirely — otherwise every
                    # chunk pays the pre-leapfrog setup (initial LML +
                    # gradient over W lanes) even though its while_loop
                    # exits after one condition evaluation.
                    def do_chunk(_):
                        p2, n2, l2, _, sw = hmc_all(
                            keys[sel], nt[sel], pz[sel], nz[sel], lml[sel],
                            acc[sel])
                        return p2, n2, l2, sw

                    def skip_chunk(_):
                        return (pz[sel], nz[sel], lml[sel],
                                jnp.zeros((W,), jnp.int32))

                    out = jax.lax.cond(jnp.any(acc[sel]), do_chunk,
                                       skip_chunk, None)
                    return None, out

                _, (p2s, n2s, l2s, sws) = jax.lax.scan(chunk_body, None,
                                                       chunks)
                flat = chunks.reshape(-1)
                return (pz.at[flat].set(p2s.reshape(-1, *pz.shape[1:])),
                        nz.at[flat].set(n2s.reshape(-1, *nz.shape[1:])),
                        lml.at[flat].set(l2s.reshape(-1)),
                        jnp.zeros((P,), jnp.int32).at[flat].set(
                            sws.reshape(-1)))

            def skip_hmc(args):
                _, pz, nz, lml = args
                return pz, nz, lml, jnp.zeros((P,), jnp.int32)

            pz, nz, lml, sw = jax.lax.cond(jnp.any(res.accepted), run_hmc,
                                           skip_hmc, (nt, pz, nz, lml))
            n_sweeps = n_sweeps + sw
        n_acc = n_acc + res.accepted.astype(jnp.int32)
        return (nt, pz, nz, lml, n_acc, n_sweeps, ok), None

    # [P, 4] columns: (structural validity, subtree-replace, detach,
    # attach round trips); all-True unless check=True.
    ok0 = jnp.ones((P, 4), bool)
    init = (particles.node_type, particles.params, particles.noise_z,
            particles.lml, jnp.zeros((P,), jnp.int32),
            jnp.zeros((P,), jnp.int32), ok0)
    keys = jax.random.split(key, max(n_mcmc, 1))
    if n_mcmc == 0:
        return particles, jnp.zeros((P,), jnp.int32), \
            jnp.zeros((P,), jnp.int32), ok0
    (nt, pz, nz, lml, n_acc, n_sweeps, ok), _ = jax.lax.scan(body, init,
                                                             keys)
    return particles._replace(node_type=nt, params=pz, noise_z=nz,
                              lml=lml), n_acc, n_sweeps, ok


_rejuv_cache = {}


def rejuvenate_jit(cfg: C.GPConfig, tables, n_mcmc: int, n_hmc: int,
                   biased: bool, hmc_cfg: hmc_mod.HMCConfig,
                   infer_noise: bool, hmc_compact: bool = True,
                   check: bool = False):
    """Content-keyed jit of rejuvenate_structure (shared by the MCMC API
    and depth-annealed SMC; a fresh jax.jit(lambda) per call would
    re-trace and round-trip the remote compile cache every call)."""
    sig = (cfg.cache_key, n_mcmc, n_hmc, biased, hmc_cfg, infer_noise,
           hmc_compact, check)
    if sig not in _rejuv_cache:
        def f(key, particles, data):
            return rejuvenate_structure(key, particles, data, cfg, tables,
                                        n_mcmc, n_hmc, biased, hmc_cfg,
                                        infer_noise,
                                        hmc_compact=hmc_compact,
                                        check=check)
        _rejuv_cache[sig] = jax.jit(f)
    return _rejuv_cache[sig]


# ---------------------------------------------------------------------------
# One full SMC round (jitted once per (bucket, n_mcmc, n_hmc, flags))
# ---------------------------------------------------------------------------

def smc_round(key, particles: Particles, data: Dataset, cfg: C.GPConfig,
              tables, n_mcmc: int, n_hmc: int, biased: bool,
              hmc_cfg: hmc_mod.HMCConfig, infer_noise: bool,
              allow_resample: bool, ess_threshold: float,
              adaptive_rejuvenation: bool, hmc_compact: bool = True,
              check: bool = False):
    """reweight -> maybe_resample -> rejuvenate (run_smc_anneal_data body,
    inference_smc_anneal_data.jl:206-253)."""
    k_res, k_rej = jax.random.split(key)
    particles = reweight(particles, data, cfg, tables)
    resampled = jnp.asarray(False)
    if allow_resample:
        particles, resampled = maybe_resample(k_res, particles,
                                              ess_threshold)
    if adaptive_rejuvenation:
        # Rejuvenate only when resampled: zero out the mcmc count by
        # gating the updates.
        def rej(p):
            return rejuvenate_structure(k_rej, p, data, cfg, tables,
                                        n_mcmc, n_hmc, biased, hmc_cfg,
                                        infer_noise,
                                        hmc_compact=hmc_compact,
                                        check=check)

        def norej(p):
            zero = jnp.zeros((p.n_particles,), jnp.int32)
            return p, zero, zero, jnp.ones((p.n_particles, 4), bool)

        particles, n_acc, n_sweeps, check_ok = jax.lax.cond(
            resampled, rej, norej, particles)
        rejuvenated = resampled
    else:
        particles, n_acc, n_sweeps, check_ok = rejuvenate_structure(
            k_rej, particles, data, cfg, tables, n_mcmc, n_hmc, biased,
            hmc_cfg, infer_noise, hmc_compact=hmc_compact, check=check)
        rejuvenated = jnp.asarray(True)
    return particles, {"resampled": resampled, "rejuvenated": rejuvenated,
                       "mh_accepted": n_acc, "hmc_sweeps": n_sweeps,
                       "check_ok": check_ok}


_round_cache = {}


def smc_round_jit(cfg: C.GPConfig, tables, n_mcmc: int, n_hmc: int,
                  biased: bool, hmc_cfg: hmc_mod.HMCConfig,
                  infer_noise: bool, allow_resample: bool,
                  ess_threshold: float, adaptive_rejuvenation: bool,
                  hmc_compact: bool = True, check: bool = False,
                  mesh=None):
    """One content-keyed jitted SMC round. With `mesh`, the output
    particle pytree is pinned to the particle-axis sharding so the
    placement cannot drift across annealing rounds (resampling's gather
    otherwise leaves the output sharding to XLA's discretion)."""
    sig = (cfg.cache_key, n_mcmc, n_hmc, biased, hmc_cfg, infer_noise,
           allow_resample, ess_threshold, adaptive_rejuvenation,
           hmc_compact, check, _mesh_sig(mesh))
    if sig not in _round_cache:
        def f(key, particles, data):
            return smc_round(key, particles, data, cfg, tables, n_mcmc,
                             n_hmc, biased, hmc_cfg, infer_noise,
                             allow_resample, ess_threshold,
                             adaptive_rejuvenation, hmc_compact, check)
        kw = {}
        if mesh is not None:
            from autogp_tpu.parallel import mesh as pmesh
            ps = pmesh.particle_sharding(mesh)
            rep = pmesh.replicated_sharding(mesh)
            kw["out_shardings"] = (
                Particles(node_type=ps, params=ps, noise_z=ps,
                          log_weights=ps, lml=ps, log_ml_est=rep,
                          parents=ps),
                {"resampled": rep, "rejuvenated": rep, "mh_accepted": ps,
                 "hmc_sweeps": ps, "check_ok": ps})
        _round_cache[sig] = jax.jit(f, **kw)
    return _round_cache[sig]


# ---------------------------------------------------------------------------
# Driver (run_smc_anneal_data, :143-273)
# ---------------------------------------------------------------------------

def validate_particles(particles: Particles, cfg: C.GPConfig,
                       tables=None, key=None):
    """Dynamic self-checks (the reference's check=true analog:
    Gen.check_observations + structural validity; observations cannot
    change here by construction, so we assert trace integrity instead).

    When `tables` (and optionally `key`) are given, additionally runs the
    involution round-trip check (Gen.check_round_trip,
    inference_smc_anneal_depth.jl:59-87) on every particle: one random
    subtree-replace, detach, and attach move each, asserting the reverse
    move restores the trace exactly."""
    nts = np.asarray(particles.node_type)
    M_ = nts.shape[1]
    # -inf weights are legal (NaN-clamped dead lanes, see BAD_LML); NaN
    # is not.
    assert not np.isnan(np.asarray(particles.log_weights)).any(), \
        "NaN log weights"
    assert np.isfinite(np.asarray(particles.lml)).all(), "non-finite LML"
    assert (nts[:, 0] > 0).all(), "inactive root slot"
    for s in range(1, M_):
        par = (s - 1) // 2
        is_op = np.isin(nts[:, par], list(C.OP_CODES))
        assert ((nts[:, s] > 0) == is_op).all(), \
            f"slot {s} active without operator parent"
        bad_cp = (nts[:, s] == C.CHANGEPOINT) & \
            (nts[:, par] != C.CHANGEPOINT)
        assert not bad_cp.any(), "ChangePoint below a non-ChangePoint"
    if tables is not None:
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, particles.n_particles)
        ok = np.asarray(_roundtrip_batch_jit(cfg)(
            keys, particles.node_type, particles.params))
        assert ok[:, 0].all(), "subtree-replace round trip failed"
        assert ok[:, 1].all(), "detach round trip failed"
        assert ok[:, 2].all(), "attach round trip failed"


_roundtrip_cache = {}


def _roundtrip_batch_jit(cfg: C.GPConfig):
    sig = cfg.cache_key
    if sig not in _roundtrip_cache:
        from autogp_tpu.inference import check as check_mod
        tables = M.prior_tables(cfg)
        _roundtrip_cache[sig] = jax.jit(jax.vmap(
            lambda k, nt, pz: check_mod.roundtrip_all(
                k, nt, pz, tables, changepoints=cfg.changepoints)))
    return _roundtrip_cache[sig]


def run_smc_anneal_data(
        key,
        ts: np.ndarray,
        xs: np.ndarray,
        cfg: C.GPConfig,
        tables,
        n_particles: int,
        schedule: Sequence[int],
        n_mcmc,
        n_hmc,
        biased: bool = False,
        hmc_cfg: hmc_mod.HMCConfig = hmc_mod.HMCConfig(),
        permutation: Optional[np.ndarray] = None,
        adaptive_resampling: bool = True,
        adaptive_rejuvenation: bool = False,
        verbose: bool = False,
        check: bool = False,
        callback_fn: Optional[Callable] = None,
        dtype=None,
        hmc_compact: bool = True,
        mesh=None) -> Particles:
    """Anneal over data prefixes ts[perm][:step] for step in schedule.

    With `mesh` (a 1-D jax.sharding.Mesh over the particle axis), the
    particle batch lives sharded across the mesh for the whole run:
    initialization draws directly onto the shards, every round is
    compiled with the output pinned to the same sharding, and datasets
    are replicated. Results are identical to the unsharded program (the
    reference's parallelism contract: particles run in parallel and the
    user never sees it, api.jl:95)."""
    import time as _time
    n = len(ts)
    ts = np.asarray(ts, np.float64)
    xs = np.asarray(xs, np.float64)
    if permutation is None:
        permutation = np.arange(n)
    assert sorted(permutation.tolist()) == list(range(n))
    ts = ts[permutation]
    xs = xs[permutation]

    schedule = list(schedule)
    assert 1 <= schedule[0]
    assert schedule[-1] == n
    assert all(b > a for a, b in zip(schedule, schedule[1:]))

    n_mcmc = [n_mcmc] * len(schedule) if np.isscalar(n_mcmc) else list(n_mcmc)
    n_hmc = [n_hmc] * len(schedule) if np.isscalar(n_hmc) else list(n_hmc)
    assert len(n_mcmc) == len(schedule)
    assert len(n_hmc) == len(schedule)

    infer_noise = cfg.noise is None
    elapsed = 0.0

    # Initialize from the prior on empty data (:180-190).
    t0 = _time.time()
    key, k_init = jax.random.split(key)
    data0 = make_dataset(ts, xs, n=0, pad_to=bucket_size(1), dtype=dtype)
    particles = initialize(k_init, n_particles, data0, cfg, tables,
                           dtype=dtype, mesh=mesh)
    if mesh is not None:
        from autogp_tpu.parallel import mesh as pmesh
        particles = pmesh.shard_particles(particles, mesh)
    jax.block_until_ready(particles)
    elapsed += _time.time() - t0

    if callback_fn is not None:
        callback_fn(particles=particles, ts=ts, xs=xs,
                    permutation=permutation, schedule=schedule, step=0,
                    elapsed=elapsed, rejuvenated=False, resampled=False,
                    verbose=verbose)

    for i, step in enumerate(schedule):
        if verbose:
            print(f"Running SMC round {step}/{schedule[-1]}")
        t0 = _time.time()
        # Per-step power-of-two buckets: early annealing rounds run at
        # their prefix's padded size instead of the full-data bucket
        # (O(step^3) Cholesky work, not O(n^3)); at most log2(n) distinct
        # programs compile across the whole schedule.
        data = make_dataset(ts, xs, n=step, pad_to=bucket_size(step),
                            dtype=dtype)
        if mesh is not None:
            from autogp_tpu.parallel import mesh as pmesh
            data = pmesh.replicate_dataset(data, mesh)
        allow_resample = step < schedule[-1]
        ess_threshold = (n_particles / 2 if adaptive_resampling
                         else float(n_particles))
        fn = smc_round_jit(cfg, tables, int(n_mcmc[i]), int(n_hmc[i]),
                           biased, hmc_cfg, infer_noise, allow_resample,
                           ess_threshold, adaptive_rejuvenation,
                           hmc_compact=hmc_compact, check=check,
                           mesh=mesh)
        key, k_round = jax.random.split(key)
        particles, stats = fn(k_round, particles, data)
        jax.block_until_ready(particles)
        elapsed += _time.time() - t0

        if verbose:
            w = np.asarray(normalized_weights(particles.log_weights))
            ess = float(effective_sample_size(particles.log_weights))
            print("Particle Weights:", np.array2string(w, precision=3))
            print(f"Particle ESS: {ess / n_particles}")
            print(f"resampled {bool(stats['resampled'])}")
            acc = np.asarray(stats["mh_accepted"])
            print(f"accepted MCMC[{acc.sum()}/{n_particles * n_mcmc[i]}] "
                  f"per-particle {acc.tolist()}")
        if check:
            # Per-move round trips ran inside the jitted round
            # (Gen.metropolis_hastings(check=true)); surface failures
            # here, then run the per-round structural sweep.
            ok = np.asarray(stats["check_ok"])
            assert ok[:, 0].all(), "per-move structural trace validity"
            assert ok[:, 1].all(), "per-move subtree-replace round trip"
            assert ok[:, 2].all(), "per-move detach round trip"
            assert ok[:, 3].all(), "per-move attach round trip"
            key, k_check = jax.random.split(key)
            validate_particles(particles, cfg, tables=tables, key=k_check)
        if callback_fn is not None:
            callback_fn(particles=particles, ts=ts, xs=xs,
                        permutation=permutation, schedule=schedule,
                        step=step, elapsed=elapsed,
                        rejuvenated=bool(stats["rejuvenated"]),
                        resampled=bool(stats["resampled"]),
                        verbose=verbose)
    return particles
