"""Device-loop timing of the blocked-Cholesky internals (TPU, round 5).

Separates the 4.5 ms chol batch into: diag panel kernels, per-panel
tri_inv_blocked, L21 strip einsums, trailing updates, and glue — by
timing structurally identical variants with individual stages replaced
by same-shape no-ops. Feeds the VERDICT r4 #3 fusion decision.

Usage: python scripts/bench_chol_parts.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import functools
    import jax
    import jax.numpy as jnp
    from autogp_tpu import gp_math
    from autogp_tpu.ops import chol_pallas
    from scripts.tpu_timer import device_time

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    log(f"devices: {jax.devices()}")

    P, N, B = 64, 1024, 128
    rng = np.random.default_rng(0)
    A = rng.standard_normal((P, N, N)).astype(np.float32)
    K = jnp.asarray(A @ np.swapaxes(A, 1, 2) + N * np.eye(N, dtype=np.float32))
    L0 = jax.jit(jax.vmap(jnp.linalg.cholesky))(K)
    Lkk = jnp.asarray(np.ascontiguousarray(np.asarray(L0)[:, :B, :B]))
    blocks = jax.jit(lambda L: gp_math._diag_blocks(L, B))(L0)

    HI = jax.lax.Precision.HIGHEST

    def chol_variant(K, skip_tri=False, skip_trail=False, skip_panel=False):
        """cholesky_batched with stages stubbed by same-shape cheap ops."""
        nb = N // B
        Acur = K
        cols = []
        for k in range(nb):
            r0 = k * B
            diag_t = jnp.swapaxes(Acur[:, :B, :B], 1, 2)
            if skip_panel:
                Lkk_t = diag_t * 0.5 + 1.0  # same-shape stand-in
            else:
                Lkk_t = chol_pallas._panel_factor(diag_t)
            Lkk_ = jnp.swapaxes(Lkk_t, 1, 2)
            if k + 1 < nb:
                if skip_tri:
                    Linv = Lkk_  # same-shape stand-in
                else:
                    Linv = gp_math.tri_inv_blocked(Lkk_)
                A21 = Acur[:, B:, :B]
                L21 = jnp.einsum("pij,pkj->pik", A21, Linv,
                                 preferred_element_type=K.dtype,
                                 precision=HI)
                if skip_trail:
                    Acur = Acur[:, B:, B:]
                else:
                    Acur = chol_pallas._trailing_lower(Acur, L21, B, HI)
                Lp = jnp.concatenate([Lkk_, L21], axis=1)
            else:
                Lp = Lkk_
            cols.append(jnp.concatenate(
                [jnp.zeros((P, r0, B), K.dtype), Lp], axis=1))
        return jnp.concatenate(cols, axis=2)

    def chol_dus(K):
        """Right-looking with dynamic_update_slice factor assembly
        (no per-panel zero-concat, no final axis-2 concat)."""
        nb = N // B
        Acur = K
        L = jnp.zeros((P, N, N), K.dtype)
        HIp = jax.lax.Precision.HIGHEST
        for k in range(nb):
            r0, r1 = k * B, (k + 1) * B
            diag_t = jnp.swapaxes(Acur[:, :B, :B], 1, 2)
            Lkk = jnp.swapaxes(chol_pallas._panel_factor(diag_t), 1, 2)
            L = jax.lax.dynamic_update_slice(L, Lkk, (0, r0, r0))
            if k + 1 < nb:
                Linv = gp_math.tri_inv_blocked(Lkk)
                A21 = Acur[:, B:, :B]
                L21 = jnp.einsum("pij,pkj->pik", A21, Linv,
                                 preferred_element_type=K.dtype,
                                 precision=HIp)
                Acur = chol_pallas._trailing_lower(Acur, L21, B, HIp)
                L = jax.lax.dynamic_update_slice(L, L21, (0, r1, r0))
        return L

    import functools as _ft
    dt = device_time(lambda eps, K: chol_dus(K + eps * jnp.eye(N)), K)
    log(f"{'chol DUS assembly':26s}: {dt*1e3:7.2f} ms")

    rows = [
        ("full cholesky_batched", dict()),
        ("  - tri_inv stubbed", dict(skip_tri=True)),
        ("  - trailing stubbed", dict(skip_trail=True)),
        ("  - panel stubbed", dict(skip_panel=True)),
        ("  - tri+panel stubbed", dict(skip_tri=True, skip_panel=True)),
    ]
    for name, kw in rows:
        f = functools.partial(chol_variant, **kw)
        dt = device_time(lambda eps, K: f(K + eps * jnp.eye(N)), K)
        log(f"{name:26s}: {dt*1e3:7.2f} ms")

    def t_tri_one(eps, Lkk):
        return gp_math.tri_inv_blocked(Lkk + eps * jnp.eye(B))

    def t_tri_all(eps, blocks):
        return gp_math.tri_inv_blocked(blocks + eps * jnp.eye(B))

    def t_tri_all_grad(eps, blocks):
        return gp_math.tri_inv_blocked(blocks + eps * jnp.eye(B),
                                       precision=gp_math.GRAD_PRECISION)

    for name, f, a in [("tri_inv [64,128,128] x1", t_tri_one, Lkk),
                       ("tri_inv [64,8,128,128]", t_tri_all, blocks),
                       ("tri_inv [64,8,...] GRADP", t_tri_all_grad, blocks)]:
        dt = device_time(f, a)
        log(f"{name:26s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
