"""Worker for the real two-process jax.distributed test (SURVEY §5.8).

Launched twice by tests/test_parallel.py::test_multihost_two_process —
once per process — with 4 virtual CPU devices each, forming a global
8-device mesh that spans the process boundary. Each worker:

1. jax.distributed.initialize() against a localhost coordinator,
2. fits a reference model UNSHARDED on its local device 0,
3. fits the same seeded model through the PUBLIC API with the global
   8-device mesh (collectives cross the process boundary at every
   resampling decision),
4. asserts its own addressable shards of the sharded result are
   bit-identical to the corresponding slices of the local reference.

Exit code 0 = every assertion passed in this process.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(pid: int, nprocs: int, port: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from autogp_tpu.utils.jax_cache import cpu_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      cpu_cache_dir(os.path.join(REPO, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == nprocs * n_local, (n_global, n_local)
    print(f"[worker {pid}] {n_local} local / {n_global} global devices",
          flush=True)

    import numpy as np
    import autogp_tpu
    from autogp_tpu import GPConfig
    from autogp_tpu.parallel import mesh as pmesh

    cfg = GPConfig(max_depth=3)
    rng = np.random.default_rng(4)
    n = 16
    ts = np.linspace(0, 1, n)
    xs = np.sin(8 * ts) + 0.1 * rng.standard_normal(n)

    def fit(mesh):
        autogp_tpu.seed(21)
        m = autogp_tpu.GPModel(ts, xs, n_particles=8, config=cfg, mesh=mesh)
        autogp_tpu.fit_smc(
            m, schedule=[8, 16], n_mcmc=1, n_hmc=1,
            adaptive_resampling=False,  # force resampling collectives
            hmc_config={"L_param": 3, "L_noise": 3, "n_exit": 1})
        return m

    ref = fit(None)  # local single-device reference, same in every process

    # The reference fit above compiles for minutes on a contended 1-core
    # host, and the two workers' compiles interleave with arbitrary skew.
    # Gloo's communicator rendezvous (triggered by the FIRST collective
    # execution of the sharded fit) times out after 30s, so a worker that
    # reaches it while its peer is still compiling dies. Two defenses,
    # both via the coordination service (which takes explicit timeouts,
    # unlike gloo): (1) a barrier here re-aligns the workers so they
    # start the sharded fit together (identical deterministic work =>
    # small skew at the first collective); (2) each attempt's outcome is
    # exchanged through the KV store and ALL workers retry until every
    # one of them succeeded in the same attempt — collectives are
    # collective, so a retry must be joined by every process.
    # The coordination-service client is the only JAX surface that takes
    # explicit timeouts (multihost_utils barriers ride gloo collectives,
    # which have the very 30 s rendezvous limit we are working around).
    # It is private API, so fail with a clear message if a JAX upgrade
    # moves it rather than an AttributeError five frames deep.
    try:
        from jax._src import distributed
        client = distributed.global_state.client
        assert client is not None
    except (ImportError, AttributeError, AssertionError) as e:
        print("[worker] jax._src.distributed.global_state.client is "
              f"unavailable in this JAX version ({e}); the rendezvous "
              "retry protocol needs it — update multihost_worker.py",
              flush=True)
        sys.exit(3)
    # Bounded: covers one cold compile of the reference fit on a
    # contended 1-core host; fails fast (with the barrier name in the
    # error) instead of hanging for 20 min if the peer died.
    client.wait_at_barrier("autogp-ref-done", timeout_in_ms=600_000)

    mesh = pmesh.particle_mesh()  # global: spans both processes
    assert mesh.devices.size == n_global
    shd = None
    for attempt in range(4):
        try:
            shd_try = fit(mesh)
            ok = True
        except jax.errors.JaxRuntimeError as e:
            if "DEADLINE_EXCEEDED" not in str(e) and "Gloo" not in str(e):
                raise
            print(f"[worker {pid}] gloo rendezvous timed out "
                  f"(attempt {attempt}); re-syncing", flush=True)
            shd_try, ok = None, False
        client.key_value_set(f"autogp-st-{attempt}-{pid}",
                             "1" if ok else "0")
        # By this point every worker has left the fit attempt (collectives
        # synchronize the successes; a gloo timeout returns within its own
        # 30 s limit), so peers post their status within seconds.
        peers_ok = all(
            client.blocking_key_value_get(f"autogp-st-{attempt}-{q}",
                                          120_000) == "1"
            for q in range(nprocs) if q != pid)
        if ok and peers_ok:
            shd = shd_try
            break
    assert shd is not None, "sharded fit failed after retries"

    sharding = shd.particles.node_type.sharding
    assert len(sharding.device_set) == n_global, sharding
    # Fully-replicated scalars are addressable everywhere.
    np.testing.assert_allclose(float(shd.particles.log_ml_est),
                               float(ref.particles.log_ml_est), rtol=1e-12)

    # Compare this process's addressable shards slice-by-slice.
    n_shards = 0
    for name in ("node_type", "params", "noise_z", "log_weights", "lml",
                 "parents"):
        arr = getattr(shd.particles, name)
        ref_np = np.asarray(getattr(ref.particles, name))
        for shard in arr.addressable_shards:
            got = np.asarray(shard.data)
            want = ref_np[shard.index]
            np.testing.assert_array_equal(got, want, err_msg=name)
            n_shards += 1
    assert n_shards >= 6 * n_local // 2, n_shards
    print(f"[worker {pid}] OK: {n_shards} shards bit-identical to the "
          "unsharded reference", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
